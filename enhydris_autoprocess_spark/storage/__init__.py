from .tier_table import TierTable  # noqa: F401
from .checkpoint import CheckpointStore  # noqa: F401
from .retention import RetentionPolicy, enforce, expire  # noqa: F401
