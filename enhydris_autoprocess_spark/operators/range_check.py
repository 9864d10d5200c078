"""Hard/soft range check — pure column expressions (zero UDFs).

Semantics pinned by the reference's RangeCheck
(/root/reference/enhydris_autoprocess/models.py:152-184) and its golden
vector (tests/test_models.py:328-375):

- hard: rows with non-missing value outside [lower, upper] -> value NaN,
  flag token "RANGE" appended;
- soft: runs AFTER hard on the already-NaN'd frame (models.py:152-155),
  so hard-rejected values can never also get "SUSPECT"; rows outside
  [soft_lower, soft_upper] keep their value and get "SUSPECT";
- missing (NaN) values are never out-of-bounds (models.py:172-174).

Scale: a single narrow projection; Catalyst folds the bounds as
literals, whole-stage codegen keeps it JVM-side, and the value filter
can push down to the scan when composed with one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import RangeCheckConfig
from ..flags import append_flag
from ..schema import NAN


def _out_of_bounds(value: Column, low: float | None, high: float | None) -> Column:
    """non-missing AND NOT between(low, high).

    Spark NaN comparison semantics (NaN sorts greater than everything)
    would make NaN "out of bounds high"; the explicit isnan guard
    reproduces the reference's ``~pd.isnull(v) & ~v.between(low, high)``
    (models.py:172-174). One-sided soft bounds are rejected at config
    time (RangeCheckConfig.__post_init__, mirroring the admin form's
    pairing rule, admin.py:104-119); the -inf/+inf substitution below
    is therefore only defensive for direct low-level callers.
    """
    present = value.isNotNull() & ~F.isnan(value)
    low_c = F.lit(low if low is not None else float("-inf"))
    high_c = F.lit(high if high is not None else float("inf"))
    return present & ~((value >= low_c) & (value <= high_c))


def range_check(
    df: DataFrame,
    cfg: RangeCheckConfig,
    value_col: str = "value",
    flags_col: str = "flags",
) -> DataFrame:
    value = F.col(value_col)
    flags = F.col(flags_col)

    hard = _out_of_bounds(value, cfg.lower_bound, cfg.upper_bound)
    value_h = F.when(hard, F.lit(NAN)).otherwise(value)
    flags_h = append_flag(flags, hard, "RANGE")

    if cfg.has_soft:
        soft = _out_of_bounds(value_h, cfg.soft_lower_bound, cfg.soft_upper_bound)
        flags_out = append_flag(flags_h, soft, "SUSPECT")
    else:
        flags_out = flags_h

    return df.withColumns({value_col: value_h, flags_col: flags_out})
