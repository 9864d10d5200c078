"""Deterministic synthetic transcript generator (FIXTURES.md §7).

Distributed and seeded: conversations are generated inside
``mapInPandas`` over ``spark.range(n_convs)``, each conversation's
stream derived from ``(seed, conv_index)`` — no wall clock, no
driver-side materialization, scales to any n_convs.

Shape knobs (defaults per FIXTURES.md §7):
- conversation lengths Zipf-ish so ~1% of conv_ids hold a large share
  of turns (hot-key skew for the salting logic),
- 1-min base cadence with ``gap_rate`` random missing turns,
- ``outlier_rate`` turns with out-of-range text lengths,
- ``tool`` non-null on ~10% of assistant turns,
- roles alternate user/assistant.
"""

from __future__ import annotations

import datetime as dt
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

BASE_TS = dt.datetime(2024, 1, 1, 0, 0, 0)

_WORDS = np.array(
    "the a of turn tool call data spark row batch agg check flag range value "
    "series tier rollup shuffle join key skew plan scan filter window".split()
)


def _conv_pdf(
    idx: int,
    seed: int,
    base_us: int,
    mean_turns: int,
    zipf_a: float,
    gap_rate: float,
    outlier_rate: float,
) -> pd.DataFrame:
    rng = np.random.RandomState((seed * 1_000_003 + idx) % (2**31 - 1))
    # Zipf-ish length: heavy tail, capped so one conv can't eat the run
    n = int(min(mean_turns * rng.zipf(zipf_a), mean_turns * 400))
    n = max(n, 2)
    keep = rng.random_sample(n) >= gap_rate
    turn_idx = np.arange(n)[keep]
    n_kept = len(turn_idx)
    ts_us = base_us + (idx % 1440) * 60_000_000 * 30 + turn_idx * 60_000_000
    roles = np.where(turn_idx % 2 == 0, "user", "assistant")
    n_words = rng.randint(3, 40, size=n_kept)
    outlier = rng.random_sample(n_kept) < outlier_rate
    n_words = np.where(outlier, rng.randint(400, 800, size=n_kept), n_words)
    words = _WORDS[rng.randint(0, len(_WORDS), size=int(n_words.sum()))]
    bounds = np.concatenate([[0], np.cumsum(n_words)])
    texts = [" ".join(words[bounds[i] : bounds[i + 1]]) for i in range(n_kept)]
    tool = np.where(
        (roles == "assistant") & (rng.random_sample(n_kept) < 0.1),
        "search",
        None,
    )
    return pd.DataFrame(
        {
            "conv_id": f"conv-{idx:08d}",
            "turn_idx": turn_idx.astype("int32"),
            "role": roles,
            "text": texts,
            "tool": tool,
            "ts": pd.to_datetime(ts_us, unit="us"),
        }
    )


def generate_transcripts(
    spark: SparkSession,
    n_convs: int = 100,
    seed: int = 42,
    mean_turns: int = 40,
    zipf_a: float = 2.0,
    gap_rate: float = 0.05,
    outlier_rate: float = 0.02,
    base_ts: dt.datetime = BASE_TS,
    partitions: int | None = None,
) -> DataFrame:
    base_us = int(base_ts.timestamp() * 1_000_000) if base_ts.tzinfo else int(
        base_ts.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for idx in b["id"].tolist():
                yield _conv_pdf(
                    int(idx), seed, base_us, mean_turns, zipf_a, gap_rate, outlier_rate
                )

    rng_df = spark.range(n_convs, numPartitions=partitions)
    return rng_df.mapInPandas(
        gen,
        schema=(
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp"
        ),
    )


_LOREM = (
    "the quick brown fox jumps over the lazy dog while spark shuffles "
    "rows across partitions and the optimizer prunes columns from the "
    "scan before the window sorts keys into frames for the checks "
) * 40  # ~6 KB literal, sliced per turn


def generate_transcripts_jvm(
    spark: SparkSession,
    n_convs: int = 100_000,
    seed: int = 42,
    base_turns: int = 24,
    skew_shifts: int = 6,
    gap_rate_pct: int = 5,
    base_ts: dt.datetime = BASE_TS,
    partitions: int | None = None,
) -> DataFrame:
    """100%-JVM deterministic generator for BENCHMARKS.

    The pandas generator above is realistic but Python-bound
    (~50k turns/s/core), so at bench scale the generator, not the
    engine, would dominate. This variant builds the same shape —
    Zipf-ish conv lengths (base_turns << (hash % skew_shifts)), 1-min
    cadence, hash-derived gaps/text-lengths/tool-calls — entirely from
    column expressions (range -> sequence -> explode), so input
    materializes at JVM speed and stays out of the measured section.
    """
    from pyspark.sql import functions as F

    base_us = int(
        base_ts.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000
    )
    conv = spark.range(n_convs, numPartitions=partitions).select(
        F.col("id").alias("cid"),
        F.xxhash64(F.col("id"), F.lit(seed)).alias("h"),
    )
    n_turns = (
        F.lit(base_turns)
        * F.pow(F.lit(2.0), F.pmod("h", F.lit(skew_shifts)).cast("double"))
    ).cast("int")
    turns = conv.select(
        "cid",
        "h",
        F.explode(F.sequence(F.lit(0), n_turns - 1)).alias("turn_idx"),
    )
    th = F.xxhash64("cid", "turn_idx", F.lit(seed))
    text_len = (F.pmod(th, F.lit(240)) + 12).cast("int")
    start = (F.pmod(F.shiftrightunsigned(th, 8), F.lit(2000)) + 1).cast("int")
    out = (
        turns
        # hash-derived gaps: drop ~gap_rate_pct% of turns
        .where(F.pmod(F.shiftrightunsigned(th, 16), F.lit(100)) >= gap_rate_pct)
        .select(
            F.concat(F.lit("conv-"), F.lpad(F.col("cid").cast("string"), 8, "0")).alias("conv_id"),
            F.col("turn_idx").cast("int"),
            F.when(F.col("turn_idx") % 2 == 0, "user").otherwise("assistant").alias("role"),
            F.lit(_LOREM).substr(start, text_len).alias("text"),
            F.when(
                (F.col("turn_idx") % 2 == 1)
                & (F.pmod(F.shiftrightunsigned(th, 24), F.lit(10)) == 0),
                F.lit("search"),
            ).alias("tool"),
            F.timestamp_micros(
                F.lit(base_us)
                + F.pmod("h", F.lit(1440)) * 1_800_000_000
                + F.col("turn_idx").cast("long") * 60_000_000
            ).alias("ts"),
        )
    )
    return out
