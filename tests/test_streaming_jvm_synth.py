"""Streaming rollup (availableNow) vs batch tier; JVM generator shape."""

import pytest
from pyspark.sql import functions as F

from enhydris_autoprocess_spark.rollup import ROLE_ALL, rollup_transcripts
from enhydris_autoprocess_spark.streaming import run_available_now
from enhydris_autoprocess_spark.synth import (
    generate_transcripts,
    generate_transcripts_jvm,
)


def test_jvm_generator_shape_and_determinism(spark):
    a = generate_transcripts_jvm(spark, n_convs=200, seed=42)
    b = generate_transcripts_jvm(spark, n_convs=200, seed=42)
    sa = a.agg(F.sum(F.length("text")), F.count("*")).first()
    sb = b.agg(F.sum(F.length("text")), F.count("*")).first()
    assert sa == sb
    # same column names/types as the pandas generator (nullability may
    # differ: JVM expressions prove non-nullness, mapInPandas can't)
    assert [(f.name, f.dataType) for f in a.schema.fields] == [
        (f.name, f.dataType) for f in generate_transcripts(spark, 2).schema.fields
    ]
    counts = sorted(
        r["count"] for r in a.groupBy("conv_id").count().collect()
    )
    assert counts[-1] > 4 * counts[0]  # skewed lengths
    tools = a.where(F.col("tool").isNotNull()).count()
    assert 0 < tools < sa[1]


def test_streaming_rollup_matches_batch(spark, tmp_path):
    """availableNow streaming 1min tier == batch tier (per-role rows)
    once the stream has drained (all windows finalized at stream end)."""
    t = generate_transcripts(spark, n_convs=15, seed=5)
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")
    t.write.parquet(in_dir)

    run_available_now(
        spark, in_dir, out_dir, ck_dir, watermark="2 minutes", timeout_sec=240
    )

    # append mode only finalizes windows once the watermark passes them:
    # windows ending within `watermark` of the stream's max event time
    # stay open (the streaming analog of the batch boundary filter /
    # trim-last). Compare the finalized region on both sides.
    import datetime as dt

    max_ts = t.agg(F.max("ts")).first()[0]
    cutoff = max_ts - dt.timedelta(minutes=2)
    got = spark.read.parquet(out_dir).where(F.col("ts") < F.lit(cutoff))
    want = (
        rollup_transcripts(spark.read.parquet(in_dir), "1min")
        .where(F.col("role") != ROLE_ALL)
        .where(F.col("ts") < F.lit(cutoff))
    )

    def canon(df):
        return {
            (r.conv_id, r.role, r.ts): (
                r.turn_count,
                r.tool_calls,
                r.text_len_sum,
                r.text_len_min,
                r.text_len_max,
            )
            for r in df.collect()
        }

    assert canon(got) == canon(want)
