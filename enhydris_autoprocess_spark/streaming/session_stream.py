"""Structured Streaming sessionization — the streaming tier for the
batch ``operators.sessionize`` family (VERDICT r03 #7; no reference
analog — the reference is batch-only Celery).

``sessionize_native`` is already expressed as a ``session_window``
hash aggregation, which is exactly the shape Spark's streaming state
store knows how to merge incrementally: each micro-batch's partial
sessions merge with the stored ones (two fragments of one session
arriving in different batches coalesce in state), and a session is
emitted in append mode once the event-time watermark passes its close
(last event + gap). So the streaming tier is the SAME logical query as
the batch operator — groupBy(key, session_window) + min/max/count/sum
— run over ``readStream`` with ``withWatermark``.

Semantics vs batch, stated like rollup_stream.py does: late events
beyond the watermark delay are dropped (batch re-opens via HWM
trim-recompute); sessions still open at the watermark frontier stay
unemitted until a later batch closes them (availableNow runs therefore
emit only sessions that closed before `max_event_time - watermark`).
Boundary rule matches ``sessionize_native``: a gap exactly equal to
the threshold STARTS a new session (half-open windows) — one instant
off the batch ``sessionize``'s strict->.

Scale shape: state is one (start, end, aggregates) row per OPEN
session, sharded by the (key, window) shuffle; merging is in the state
store, no per-row Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def streaming_sessionize(
    stream: DataFrame,
    gap_seconds: int,
    key_col: str = "key",
    ts_col: str = "ts",
    value_col: str = "value",
    watermark: str = "30 minutes",
) -> DataFrame:
    """(key, ts, value) stream -> closed sessions, one row each.

    Output matches ``operators.sessionize_native``: key,
    session_start, session_end (min/max event time — NOT the padded
    window end, which includes the gap), n_events, value_sum.
    """
    win = F.session_window(F.col(ts_col), f"{gap_seconds} seconds")
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col), win.alias("__w"))
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(value_col).alias("value_sum"),
        )
        .drop("__w")
    )


def run_sessionize_available_now(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema,
    gap_seconds: int,
    key_col: str = "key",
    ts_col: str = "ts",
    value_col: str = "value",
    watermark: str = "30 minutes",
    max_files_per_trigger: int | None = None,
    timeout_sec: int = 300,
) -> None:
    """Catch-up run over a parquet directory; resumable via the stream
    checkpoint (state store holds open sessions across restarts)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.option("recursiveFileLookup", "true").parquet(input_dir)
    sessions = streaming_sessionize(
        stream, gap_seconds, key_col, ts_col, value_col, watermark
    )
    q = (
        sessions.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    from .rollup_stream import await_or_stop

    await_or_stop(q, timeout_sec)
