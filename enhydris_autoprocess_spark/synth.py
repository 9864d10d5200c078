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
