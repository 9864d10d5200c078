from .tier_table import TierTable  # noqa: F401
from .checkpoint import CheckpointStore  # noqa: F401
