"""Rollup tier composition + generator determinism."""

import pytest
from pyspark.sql import functions as F

from enhydris_autoprocess_spark.rollup import (
    ROLE_ALL,
    build_tiers,
    rollup_tier,
    rollup_transcripts,
    with_rates,
)
from enhydris_autoprocess_spark.synth import generate_transcripts


@pytest.fixture(scope="module")
def transcripts(spark):
    return generate_transcripts(spark, n_convs=30, seed=7).cache()


def _canon(df):
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


def test_tier_composition_equals_direct(spark, transcripts):
    """1h-from-1min and 1d-from-1h must equal direct computation —
    the north-star tier-by-tier equality invariant."""
    tiers = build_tiers(transcripts)
    direct_1h = rollup_transcripts(transcripts, "1H")
    direct_1d = rollup_transcripts(transcripts, "1D")
    assert _canon(tiers["1H"]) == _canon(direct_1h)
    assert _canon(tiers["1D"]) == _canon(direct_1d)


def test_role_all_is_sum_of_roles(spark, transcripts):
    t = rollup_transcripts(transcripts, "1D")
    per_role = (
        t.where(F.col("role") != ROLE_ALL)
        .groupBy("conv_id", "ts")
        .agg(F.sum("turn_count").alias("n"))
    )
    allr = t.where(F.col("role") == ROLE_ALL).select(
        "conv_id", "ts", F.col("turn_count").alias("n_all")
    )
    joined = per_role.join(allr, ["conv_id", "ts"])
    assert joined.where(F.col("n") != F.col("n_all")).count() == 0


def test_rates(spark, transcripts):
    t = with_rates(rollup_transcripts(transcripts, "1D"))
    bad = t.where(
        (F.col("tool_call_rate") < 0) | (F.col("tool_call_rate") > 1)
    ).count()
    assert bad == 0


def test_generator_deterministic(spark):
    a = generate_transcripts(spark, n_convs=10, seed=42)
    b = generate_transcripts(spark, n_convs=10, seed=42)
    assert a.orderBy("conv_id", "turn_idx").collect() == b.orderBy(
        "conv_id", "turn_idx"
    ).collect()
    c = generate_transcripts(spark, n_convs=10, seed=43)
    assert a.select(F.sum(F.length("text"))).first()[0] != c.select(
        F.sum(F.length("text"))
    ).first()[0]


def test_generator_skew_and_gaps(spark):
    t = generate_transcripts(spark, n_convs=200, seed=42).cache()
    per_conv = t.groupBy("conv_id").count().collect()
    counts = sorted((r["count"] for r in per_conv), reverse=True)
    # heavy tail: top 5% of convs hold a disproportionate share
    top = sum(counts[: max(1, len(counts) // 20)])
    assert top / sum(counts) > 0.10
    # gaps exist: turn_idx not dense for most convs
    gaps = t.groupBy("conv_id").agg(
        (F.max("turn_idx") + 1 - F.count("*")).alias("missing")
    )
    assert gaps.where(F.col("missing") > 0).count() > 0
    t.unpersist()
