"""Gap-fill: complete the per-key time grid and linearly interpolate
missing values (north-star requirement; no reference analog —
SURVEY.md §2.5 I2).

Two equivalent implementations, tested against each other:

- ``gap_fill`` — the spec-mandated pandas/Arrow UDF path
  (BASELINE.json north_star: "gap-fills missing turns via flag-aware
  linear interpolation inside pandas/Arrow UDFs"): ``applyInPandas``
  per key over the grid-completed frame; vectorized numpy inside, no
  per-row Python.
- ``gap_fill_sql`` — pure window-function path (JVM-side): previous /
  next known anchor via ``last(..., ignorenulls)`` over unbounded
  frames, then the lerp formula. Used by the bench as the fast-path
  comparison.

Flag-aware semantics (both): a value is "missing" if NULL or NaN;
grid rows that did not exist are inserted with flag "DATEINSERT"
(token reused from regularization, models.py:481); every interpolated
value additionally gets flag "FILLED"; leading/trailing gaps (no anchor
on one side) stay NaN. ``max_gap_slots`` bounds how long a run may be
and still be filled (None = unbounded); bounding it is also what makes
the chunked/salted hot-key variant possible (storage/skew).
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..flags import append_flag
from ..schema import NAN, ts_micros
from ..timeutil import MICROS, Step


def complete_grid(
    df: DataFrame,
    step: Step,
    key_col: str = "key",
    ts_col: str = "ts",
    value_col: str = "value",
    flags_col: str = "flags",
    new_date_flag: str = "DATEINSERT",
) -> DataFrame:
    """Materialize every step-multiple between each key's min and max ts.

    ``sequence()`` + explode + left join; inserted rows get NaN value and
    the new_date_flag. One small per-key agg + one join, both on the key
    — co-partitioned with downstream per-key work.
    """
    step_us = step.micros
    src = df.withColumn("__us", ts_micros(F.col(ts_col)))
    spans = src.groupBy(key_col).agg(
        F.min("__us").alias("__g0"), F.max("__us").alias("__g1")
    )
    full = spans.select(
        key_col,
        F.explode(F.sequence("__g0", "__g1", F.lit(step_us))).alias("__us"),
    )
    out = (
        full.join(src.drop(ts_col), [key_col, "__us"], "left")
        .withColumn(ts_col, F.timestamp_micros(F.col("__us")))
        .withColumn(
            flags_col,
            F.when(F.col(flags_col).isNull(), F.lit(new_date_flag)).otherwise(
                F.col(flags_col)
            ),
        )
        .withColumn(value_col, F.coalesce(F.col(value_col), F.lit(NAN)))
        .drop("__us")
    )
    return out


def _fill_pdf(
    pdf: pd.DataFrame,
    ts_col: str,
    value_col: str,
    flags_col: str,
    max_gap_slots: int | None,
    fill_flag: str,
) -> pd.DataFrame:
    pdf = pdf.sort_values(ts_col).reset_index(drop=True)
    v = pdf[value_col].to_numpy(dtype=np.float64, copy=True)
    t = pdf[ts_col].to_numpy(dtype="datetime64[us]").astype(np.int64)
    missing = np.isnan(v)
    if missing.any() and (~missing).any():
        idx = np.arange(len(v))
        known = idx[~missing]
        # previous/next known index per position (vectorized)
        prev_i = known[np.searchsorted(known, idx, side="right") - 1]
        next_pos = np.searchsorted(known, idx, side="left")
        has_prev = np.searchsorted(known, idx, side="right") > 0
        has_next = next_pos < len(known)
        next_i = known[np.clip(next_pos, 0, len(known) - 1)]
        can = missing & has_prev & has_next
        if max_gap_slots is not None:
            can &= (next_i - prev_i) <= (max_gap_slots + 1)
        pi, ni = prev_i[can], next_i[can]
        frac = (t[can] - t[pi]) / (t[ni] - t[pi])
        v[can] = v[pi] + frac * (v[ni] - v[pi])
        pdf[value_col] = v
        fl = pdf[flags_col].to_numpy(dtype=object)
        sel = np.where(can)[0]
        fl[sel] = [f"{s} {fill_flag}" if s else fill_flag for s in fl[sel]]
        pdf[flags_col] = fl
    return pdf


def gap_fill(
    df: DataFrame,
    step: Step,
    max_gap_slots: int | None = None,
    fill_flag: str = "FILLED",
    key_col: str = "key",
    ts_col: str = "ts",
    value_col: str = "value",
    flags_col: str = "flags",
    chunk_span_slots: int | None = None,
) -> DataFrame:
    """Grid-complete then interpolate inside ``applyInPandas`` per key.

    ``chunk_span_slots``: hot-key mode — split each key's timeline into
    chunks of that many grid slots processed in parallel with
    ``max_gap_slots + 1`` slots of halo context (requires a bounded
    ``max_gap_slots``; see skew.chunked_apply_in_pandas). Output is
    identical to the unchunked path (tests pin this).
    """
    if chunk_span_slots is not None:
        if max_gap_slots is None:
            raise ValueError("chunked gap-fill requires bounded max_gap_slots")
        from ..skew import chunked_apply_in_pandas

        completed = complete_grid(df, step, key_col, ts_col, value_col, flags_col)

        def fill_chunk(pdf: pd.DataFrame) -> pd.DataFrame:
            return _fill_pdf(
                pdf, ts_col, value_col, flags_col, max_gap_slots, fill_flag
            )

        from pyspark.sql import types as T

        schema = T.StructType(
            [T.StructField(f.name, f.dataType, True) for f in completed.schema.fields]
        )
        out = chunked_apply_in_pandas(
            completed,
            fill_chunk,
            schema,
            chunk_span_us=chunk_span_slots * step.micros,
            halo_us=(max_gap_slots + 1) * step.micros,
            key_col=key_col,
            ts_col=ts_col,
        )
        return out.withColumn(value_col, F.coalesce(F.col(value_col), F.lit(NAN)))

    completed = complete_grid(df, step, key_col, ts_col, value_col, flags_col)
    # Arrow from_pandas turns float NaN into null on the way back from
    # the UDF, so the output schema must be nullable and NaN restored
    # after (NaN-vs-NULL discipline, SURVEY.md §7 watch-list (c)).
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in completed.schema.fields]
    )

    def fill(pdf: pd.DataFrame) -> pd.DataFrame:
        return _fill_pdf(pdf, ts_col, value_col, flags_col, max_gap_slots, fill_flag)

    out = completed.groupBy(key_col).applyInPandas(fill, schema=schema)
    return out.withColumn(value_col, F.coalesce(F.col(value_col), F.lit(NAN)))


def gap_fill_sql(
    df: DataFrame,
    step: Step,
    max_gap_slots: int | None = None,
    fill_flag: str = "FILLED",
    key_col: str = "key",
    ts_col: str = "ts",
    value_col: str = "value",
    flags_col: str = "flags",
) -> DataFrame:
    """JVM-only equivalent: anchors via last(ignorenulls) windows."""
    completed = complete_grid(df, step, key_col, ts_col, value_col, flags_col)
    us = ts_micros(F.col(ts_col))
    v = F.col(value_col)
    known_v = F.when(~F.isnan(v), v)
    known_t = F.when(~F.isnan(v), us)

    wb = (
        Window.partitionBy(key_col)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wf = (
        Window.partitionBy(key_col)
        .orderBy(ts_col)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    prev_v = F.last(known_v, ignorenulls=True).over(wb)
    prev_t = F.last(known_t, ignorenulls=True).over(wb)
    next_v = F.first(known_v, ignorenulls=True).over(wf)
    next_t = F.first(known_t, ignorenulls=True).over(wf)

    can = (
        F.isnan(v)
        & prev_v.isNotNull()
        & next_v.isNotNull()
    )
    if max_gap_slots is not None:
        can = can & (
            (next_t - prev_t) <= F.lit((max_gap_slots + 1) * step.micros)
        )
    frac = (us - prev_t).cast("double") / (next_t - prev_t).cast("double")
    filled = prev_v + frac * (next_v - prev_v)

    return completed.withColumns(
        {
            value_col: F.when(can, filled).otherwise(v),
            flags_col: append_flag(F.col(flags_col), can, fill_flag),
        }
    )
