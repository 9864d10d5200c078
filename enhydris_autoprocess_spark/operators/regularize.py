"""Regularization — snap an irregular series to its time-step grid.

The reference delegates to ``haggregate.regularize`` (not vendored);
observable contract from the goldens
(/root/reference/enhydris_autoprocess/models.py:479-481;
tests/test_models.py:941-1044): source at nominal 10-min cadence with
off-grid rows 10:21 and 10:31 aggregates as if those rows sat at 10:20
and 10:30 — i.e. each grid point takes the value of the nearest source
record within step/2. tests/test_models.py:1087-1130 pins the mode
choice (mean -> INSTANTANEOUS, else INTERVAL); the modes' VALUE
semantics differ when several records snap to one slot: INSTANTANEOUS
keeps the nearest sample, INTERVAL sums the contributions (interval
quantities like per-interval totals must not drop records). See
``regularize``'s docstring; pinned by a pandas oracle test.

Implementation (no UDFs):
1. grid = half-up rounding of epoch micros to the step;
2. per (key, grid) keep the record nearest the grid point
   (ties -> earliest) via one row_number window;
3. rows whose original ts moved get flag "DATEINSERT" appended
   (new_date_flag, models.py:481);
4. optionally complete the grid per key (sequence + join) with
   NaN/"" rows, mirroring haggregate's full-grid output. The
   aggregation path doesn't need completion (MISS counting is
   ratio-based), so the pipeline calls with complete=False and skips
   that shuffle.

Scale: one shuffle on (key, grid) for the dedup window; grid
completion adds a per-key agg + one join. Both partition by key and
are skew-safe under AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..flags import append_flag
from ..schema import ts_micros
from ..schema import NAN
from ..timeutil import MICROS, Step

INSTANTANEOUS = "INSTANTANEOUS"
INTERVAL = "INTERVAL"


def infer_time_step(
    df: DataFrame, key_col: str = "key", ts_col: str = "ts"
) -> DataFrame:
    """Per-key modal timestamp delta in seconds (W3 in SURVEY.md §2.3).

    The reference calls ``pd.infer_freq`` on the whole index
    (models.py:499-500) and fails the job when there is none
    (tests/test_models.py:1047-1084). Distributed analog: the mode of
    consecutive deltas per key — one window lag + one count. Returns a
    DataFrame (key_col, step_seconds); keys with < 2 rows are absent
    (caller decides whether that is the reference's graceful-failure
    path). Stays a DataFrame so callers broadcast-join it against the
    series instead of collecting one row per key to the driver — a
    driver OOM at 10^8 keys. For the tiny-config case, collect at the
    call site.
    """
    us = ts_micros(F.col(ts_col))
    w = Window.partitionBy(key_col).orderBy(us)
    deltas = (
        df.select(F.col(key_col), (us - F.lag(us).over(w)).alias("__d"))
        .where(F.col("__d").isNotNull())
        .groupBy(key_col, "__d")
        .count()
    )
    pick = Window.partitionBy(key_col).orderBy(
        F.col("count").desc(), F.col("__d").asc()
    )
    return (
        deltas.withColumn("__rn", F.row_number().over(pick))
        .where(F.col("__rn") == 1)
        .select(
            key_col,
            (F.col("__d") / F.lit(1_000_000)).cast("long").alias("step_seconds"),
        )
    )


def mode_for_method(method: str) -> str:
    """mean -> INSTANTANEOUS else INTERVAL (models.py:479-480)."""
    return INSTANTANEOUS if method == "mean" else INTERVAL


def regularize(
    df: DataFrame,
    step: Step,
    mode: str = INTERVAL,
    complete: bool = False,
    new_date_flag: str = "DATEINSERT",
    key_col: str = "key",
    ts_col: str = "ts",
    value_col: str = "value",
    flags_col: str = "flags",
) -> DataFrame:
    """Snap to the step grid; value semantics depend on ``mode``:

    - INSTANTANEOUS (reference: method == "mean", models.py:479-481):
      each grid point takes the VALUE OF THE NEAREST source record
      within step/2 — sampled quantities (temperature) must not be
      summed when two samples land in one slot.
    - INTERVAL (every other method): each grid point takes the SUM of
      all source records snapping to it — interval quantities
      (rainfall totals per interval) must not drop a record when two
      land in one slot. NaN contributions are skipped; an all-NaN slot
      stays NaN. The kept row's non-value columns (flags, carried ids)
      come from the nearest record, and ``new_date_flag`` is appended
      when the value was not a single untouched on-grid record (moved,
      or >1 contributor).

    Both modes emit the same row set (one row per occupied grid slot),
    so downstream MISS counting is mode-independent. Pinned by a
    pandas-resample oracle test (tests/test_config_misc.py) since the
    reference goldens only pin mode *selection*.
    """
    if mode not in (INSTANTANEOUS, INTERVAL):
        raise ValueError(f"unknown regularization mode: {mode!r}")
    step_us = step.micros
    micros = ts_micros(F.col(ts_col))
    # Half-up rounding: floor((t + step/2) / step) * step — pure long
    # arithmetic (pmod) so the result is bit-identical to the integer
    # oracles (numpy //, DuckDB //) at any epoch.
    shifted = micros + F.lit(step_us // 2)
    grid = shifted - F.pmod(shifted, F.lit(step_us))
    dist = F.abs(micros - grid)

    w = Window.partitionBy(key_col, "__grid").orderBy("__dist", ts_col)
    out = df.withColumn("__grid", grid).withColumn("__dist", dist)
    if mode == INTERVAL:
        wg = Window.partitionBy(key_col, "__grid")
        known = F.when(~F.isnan(F.col(value_col)), F.col(value_col))
        out = (
            out.withColumn("__sum", F.sum(known).over(wg))
            .withColumn("__cnt", F.count(F.lit(1)).over(wg))
        )
    out = out.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1)
    if mode == INTERVAL:
        out = (
            out.withColumn(value_col, F.coalesce(F.col("__sum"), F.lit(NAN)))
            .withColumn(
                flags_col,
                append_flag(
                    F.col(flags_col),
                    (F.col("__dist") > 0) | (F.col("__cnt") > 1),
                    new_date_flag,
                ),
            )
            .drop("__sum", "__cnt")
        )
    else:
        out = out.withColumn(
            flags_col,
            append_flag(F.col(flags_col), F.col("__dist") > 0, new_date_flag),
        )
    out = (
        out.withColumn(ts_col, F.timestamp_micros(F.col("__grid")))
        .drop("__dist", "__rn")
    )

    if complete:
        spans = out.groupBy(key_col).agg(
            F.min("__grid").alias("__g0"), F.max("__grid").alias("__g1")
        )
        full = spans.select(
            key_col,
            F.explode(
                F.sequence(F.col("__g0"), F.col("__g1"), F.lit(step_us))
            ).alias("__grid"),
        )
        out = (
            full.join(out.drop(ts_col), [key_col, "__grid"], "left")
            .withColumn(ts_col, F.timestamp_micros(F.col("__grid")))
            .withColumn(value_col, F.coalesce(F.col(value_col), F.lit(NAN)))
            .withColumn(flags_col, F.coalesce(F.col(flags_col), F.lit("")))
        )

    return out.drop("__grid")
