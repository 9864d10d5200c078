"""Check chaining — Checks.process_timeseries
(/root/reference/enhydris_autoprocess/models.py:114-122): each
configured check runs sequentially over the same frame, registration
order RangeCheck then RateOfChangeCheck (models.py:187, 251).

Both checks are column-expression transforms, so the composition stays
one Spark job / one scan: Catalyst collapses the projections and the
only shuffle is the rocc window's sort on (key, ts) — and only if a
rate-of-change check is configured.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..config import PipelineConfig
from .range_check import range_check
from .rocc import rate_of_change_check


def run_checks(
    df: DataFrame,
    cfg: PipelineConfig,
    key_col: str = "key",
    ts_col: str = "ts",
    value_col: str = "value",
    flags_col: str = "flags",
) -> DataFrame:
    out = df
    if cfg.range_check is not None:
        out = range_check(out, cfg.range_check, value_col, flags_col)
    if cfg.rate_of_change is not None:
        out = rate_of_change_check(
            out, cfg.rate_of_change, key_col, ts_col, value_col, flags_col
        )
    return out
