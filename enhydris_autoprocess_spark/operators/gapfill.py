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


def _fused_fill_pdf(
    pdf: pd.DataFrame,
    step_us: int,
    ts_col: str,
    value_col: str,
    flags_col: str,
    max_gap_slots: int | None,
    fill_flag: str,
    new_date_flag: str,
    key_col: str,
) -> pd.DataFrame:
    """Grid-complete AND interpolate one key's frame in a single numpy
    pass (no Spark-side sequence/join — the grid never exists as rows
    until the Arrow batch leaving this UDF).

    Matches ``complete_grid`` + ``_fill_pdf`` exactly for grid-aligned
    input (what regularize emits): the grid is anchored at the key's
    min ts; rows off the grid would not join in ``complete_grid`` and
    are likewise dropped here.
    """
    pdf = pdf.sort_values(ts_col).reset_index(drop=True)
    t = pdf[ts_col].to_numpy(dtype="datetime64[us]").astype(np.int64)
    if len(t) == 0:
        return pdf
    g0, g1 = t[0], t[-1]
    n = int((g1 - g0) // step_us) + 1
    on = (t - g0) % step_us == 0
    pos = (t[on] - g0) // step_us

    v = np.full(n, np.nan, dtype=np.float64)
    v[pos] = pdf[value_col].to_numpy(dtype=np.float64)[on]
    fl = np.full(n, new_date_flag, dtype=object)
    fl[pos] = pdf[flags_col].to_numpy(dtype=object)[on]

    missing = np.isnan(v)
    if missing.any() and (~missing).any():
        idx = np.arange(n)
        known = idx[~missing]
        right = np.searchsorted(known, idx, side="right")
        prev_i = known[right - 1]
        next_pos = np.searchsorted(known, idx, side="left")
        can = missing & (right > 0) & (next_pos < len(known))
        next_i = known[np.clip(next_pos, 0, len(known) - 1)]
        if max_gap_slots is not None:
            can &= (next_i - prev_i) <= (max_gap_slots + 1)
        pi, ni = prev_i[can], next_i[can]
        frac = (idx[can] - pi) / (ni - pi)
        v[can] = v[pi] + frac * (v[ni] - v[pi])
        sel = np.where(can)[0]
        fl[sel] = [f"{s} {fill_flag}" if s else fill_flag for s in fl[sel]]

    out = pd.DataFrame(index=pd.RangeIndex(n))
    full_pos = np.full(n, -1, dtype=np.int64)
    full_pos[pos] = np.where(on)[0]
    for col in pdf.columns:
        if col == ts_col:
            out[col] = (g0 + np.arange(n, dtype=np.int64) * step_us).astype(
                "datetime64[us]"
            )
        elif col == value_col:
            out[col] = v
        elif col == flags_col:
            out[col] = fl
        else:
            src = pdf[col].to_numpy(dtype=object)
            if col == key_col:
                # the grouping key: inserted grid rows carry it too, as
                # complete_grid's `full` (spans) side does
                out[col] = np.full(n, src[0], dtype=object)
            else:
                carried = np.full(n, None, dtype=object)
                hit = full_pos >= 0
                carried[hit] = src[full_pos[hit]]
                out[col] = carried
    return out


def _fill_block(
    pdf: pd.DataFrame,
    step_us: int,
    ts_col: str,
    value_col: str,
    flags_col: str,
    max_gap_slots: int | None,
    fill_flag: str,
    new_date_flag: str,
    key_col: str,
) -> pd.DataFrame:
    """Grid-complete + interpolate MANY keys in one numpy pass.

    ``pdf`` holds whole keys, sorted by (key, ts). All work is
    vectorized across group boundaries (offsets via cumsum; prev/next
    known anchors via searchsorted, masked to stay inside each group),
    so cost is O(output rows) with no per-group pandas objects — the
    per-group ``applyInPandas`` variant spent ~5ms/group on frame
    bookkeeping alone, which dominated at thousands of keys.
    """
    k = pdf[key_col].to_numpy(dtype=object)
    t = pdf[ts_col].to_numpy(dtype="datetime64[us]").astype(np.int64)
    v = pdf[value_col].to_numpy(dtype=np.float64)
    fl = pdf[flags_col].to_numpy(dtype=object)
    m = len(k)

    newgrp = np.empty(m, dtype=bool)
    newgrp[0] = True
    newgrp[1:] = k[1:] != k[:-1]
    gidx = np.cumsum(newgrp) - 1
    starts = np.flatnonzero(newgrp)
    ends = np.r_[starts[1:], m] - 1
    g0 = t[starts]
    n_g = (t[ends] - g0) // step_us + 1
    off = np.r_[0, np.cumsum(n_g)]
    n = int(off[-1])

    rel = t - g0[gidx]
    on = rel % step_us == 0
    pos = off[gidx[on]] + rel[on] // step_us

    vf = np.full(n, np.nan, dtype=np.float64)
    vf[pos] = v[on]
    flf = np.full(n, new_date_flag, dtype=object)
    flf[pos] = fl[on]

    og = np.repeat(np.arange(len(starts)), n_g)  # group index per output row
    idx = np.arange(n)
    ot = g0[og] + (idx - off[og]) * step_us

    missing = np.isnan(vf)
    known = np.flatnonzero(~missing)
    if len(known) and missing.any():
        right = np.searchsorted(known, idx, side="right")
        prev_i = known[np.clip(right - 1, 0, None)]
        lpos = np.searchsorted(known, idx, side="left")
        next_i = known[np.clip(lpos, 0, len(known) - 1)]
        can = missing & (right > 0) & (lpos < len(known))
        # anchors must come from the same key (no cross-group lerp)
        can &= (og[prev_i] == og) & (og[next_i] == og)
        if max_gap_slots is not None:
            can &= (next_i - prev_i) <= (max_gap_slots + 1)
        pi, ni = prev_i[can], next_i[can]
        frac = (idx[can] - pi) / (ni - pi)
        vf[can] = vf[pi] + frac * (vf[ni] - vf[pi])
        sel = np.flatnonzero(can)
        codes, uniq = pd.factorize(flf[sel])
        mapped = np.array(
            [f"{s} {fill_flag}" if s else fill_flag for s in uniq], dtype=object
        )
        flf[sel] = mapped[codes]

    out = pd.DataFrame(index=pd.RangeIndex(n))
    opos = np.full(n, -1, dtype=np.int64)
    opos[pos] = np.flatnonzero(on)
    for col in pdf.columns:
        if col == ts_col:
            out[col] = ot.astype("datetime64[us]")
        elif col == value_col:
            out[col] = vf
        elif col == flags_col:
            out[col] = flf
        elif col == key_col:
            out[col] = k[starts][og]
        else:
            src = pdf[col].to_numpy(dtype=object)
            carried = np.full(n, None, dtype=object)
            hit = opos >= 0
            carried[hit] = src[opos[hit]]
            out[col] = carried
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


_CHUNK_ROWS = 8192  # input rows per kernel call (key-aligned; see run_block)


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
    num_partitions: int | None = None,
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

    # Fused fast path: grid completion happens INSIDE the UDF, so only
    # the source rows cross the Arrow boundary inward and the Spark-side
    # span-agg + grid join (which materializes the exploded grid twice)
    # disappear — one shuffle total, on the key. mapInPandas over
    # key-repartitioned, (key, ts)-sorted partitions lets one Arrow
    # batch carry MANY keys, so the kernel vectorizes across group
    # boundaries instead of paying per-group pandas overhead
    # (applyInPandas: ~5ms/group of frame bookkeeping). Batches are
    # re-split on key boundaries, holding back only the possibly-
    # incomplete last key of each batch — bounded memory at any scale.
    # Output is identical to complete_grid + _fill_pdf (tests pin all
    # variants against each other). Arrow from_pandas turns float NaN
    # into null on the way back, so the output schema must be nullable
    # and NaN restored after (SURVEY.md §7 watch-list (c)).
    from pyspark.sql import types as T

    others = [
        c for c in df.columns if c not in (key_col, ts_col, value_col, flags_col)
    ]
    by_name = {f.name: f for f in df.schema.fields}
    ordered = [key_col, value_col, flags_col, *others, ts_col]
    schema = T.StructType(
        [T.StructField(n, by_name[n].dataType, True) for n in ordered]
    )
    step_us = step.micros

    def run_block(block: pd.DataFrame) -> Iterable[pd.DataFrame]:
        # Sub-chunk on key boundaries: keeps each kernel call's fresh
        # allocations small (grid expansion makes output ~span/step ×
        # input; one huge alloc-bound call is far slower than many small
        # ones) and bounds peak memory per task regardless of batch size.
        keys = block[key_col].to_numpy(dtype=object)
        kstart = np.flatnonzero(
            np.r_[True, keys[1:] != keys[:-1]]
        )
        lo = 0
        while lo < len(block):
            nxt = np.searchsorted(kstart, lo + _CHUNK_ROWS, side="left")
            hi = kstart[nxt] if nxt < len(kstart) else len(block)
            yield _fill_block(
                block.iloc[lo:hi], step_us, ts_col, value_col, flags_col,
                max_gap_slots, fill_flag, "DATEINSERT", key_col,
            )[ordered]
            lo = hi

    def fill_stream(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        tail: pd.DataFrame | None = None
        for pdf in batches:
            if tail is not None and len(tail):
                pdf = pd.concat([tail, pdf], ignore_index=True)
            if not len(pdf):
                continue
            keys = pdf[key_col].to_numpy(dtype=object)
            cut = len(pdf) - int((keys == keys[-1]).sum())
            head, tail = pdf.iloc[:cut], pdf.iloc[cut:]
            if len(head):
                yield from run_block(head)
        if tail is not None and len(tail):
            yield from run_block(tail)

    # Explicit partition count: AQE sizes post-shuffle partitions by
    # INPUT bytes and would coalesce a small-but-about-to-explode input
    # to one or two tasks (observed at sf0.1: 100k rows -> 2 partitions
    # -> 6.3M output rows on 2 cores). The UDF expands by ~span/step, so
    # the pre-UDF shuffle must be sized by the caller's parallelism, not
    # by AQE's input-byte heuristic.
    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    out = (
        df.repartition(n_parts, key_col)
        .sortWithinPartitions(key_col, ts_col)
        .mapInPandas(fill_stream, schema=schema)
    )
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
