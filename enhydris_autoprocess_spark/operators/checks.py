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
from ..timeutil import parse_delta_t_seconds
from .range_check import range_check
from .rocc import rate_of_change_check


def run_checks(
    df: DataFrame,
    cfg: PipelineConfig,
    key_col: str = "key",
    ts_col: str = "ts",
    value_col: str = "value",
    flags_col: str = "flags",
    chunk_span_seconds: int | None = None,
) -> DataFrame:
    """``chunk_span_seconds``: when set (and longer than the largest
    configured delta_t, else silently ignored — a shorter span cannot
    carry the lookback halo), the rate-of-change window partitions by
    (key, time-chunk) instead of key alone, so a hot conversation's
    sort spreads over span-sized tasks (operators/rocc.py docstring).
    Output is identical either way (pinned by test)."""
    out = df
    if cfg.range_check is not None:
        out = range_check(out, cfg.range_check, value_col, flags_col)
    if cfg.rate_of_change is not None:
        span = chunk_span_seconds
        if span is not None:
            max_dt = max(
                (
                    parse_delta_t_seconds(th.delta_t)
                    for th in cfg.rate_of_change.sorted_thresholds()
                ),
                default=0,
            )
            if span <= max_dt:
                span = None
        out = rate_of_change_check(
            out, cfg.rate_of_change, key_col, ts_col, value_col, flags_col,
            chunk_span_seconds=span,
        )
    return out
