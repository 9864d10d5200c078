"""Custom STATEFUL streaming operator: conversation gap monitoring via
``applyInPandasWithState`` (the task brief's "custom stateful
operators" streaming primitive; no reference analog — the batch
engine's gap handling is gap_fill/trim-recompute, SURVEY.md §2.5/2.7).

Per ``conv_id`` the operator keeps one tiny state row (last seen event
time) and emits:

- ``kind='gap'`` — consecutive turns more than ``gap_seconds`` apart
  (prev_ts, next_ts, gap_seconds), including gaps that SPAN micro-batch
  boundaries (that's what the state is for — a stateless window could
  only see within-batch pairs);
- ``kind='silence'`` — an event-time TIMEOUT fired: the conversation
  produced nothing for ``gap_seconds`` past its last turn by the time
  the watermark moved on (next_ts is NULL; state is dropped, so a
  conversation that resumes later starts a fresh timeline).

Scale shape: state is one long per live conversation, partitioned by
conv_id (Spark's state store shards with the shuffle); each micro-batch
group does one numpy diff — no per-row Python.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "conv_id string, prev_ts timestamp, next_ts timestamp, "
    "gap_seconds double, kind string"
)
STATE_SCHEMA = "last_us long"


def streaming_gap_events(
    stream: DataFrame,
    gap_seconds: float = 600.0,
    watermark: str = "5 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """transcript stream -> gap/silence event stream (append mode)."""
    thresh_us = int(gap_seconds * 1_000_000)

    def monitor(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (conv_id,) = key
        if state.hasTimedOut:
            (last_us,) = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "conv_id": [conv_id],
                    "prev_ts": pd.to_datetime([last_us], unit="us"),
                    "next_ts": pd.to_datetime([pd.NaT]),
                    "gap_seconds": [float(gap_seconds)],
                    "kind": ["silence"],
                }
            )
            return
        parts = [
            pdf[ts_col].to_numpy(dtype="datetime64[us]").astype(np.int64)
            for pdf in pdfs
        ]
        ts = np.sort(np.concatenate(parts)) if parts else np.empty(0, np.int64)
        if len(ts) == 0:
            return
        prev = (
            np.array([state.get[0]], dtype=np.int64)
            if state.exists
            else np.empty(0, np.int64)
        )
        seq = np.r_[prev, ts]
        d = np.diff(seq)
        hit = np.flatnonzero(d > thresh_us)
        last = int(seq[-1])
        state.update((last,))
        # event-time timeout: fire once the watermark passes
        # last + gap (timestamps are millis in the state API)
        state.setTimeoutTimestamp((last + thresh_us) // 1000)
        if len(hit):
            yield pd.DataFrame(
                {
                    "conv_id": conv_id,
                    "prev_ts": pd.to_datetime(seq[hit], unit="us"),
                    "next_ts": pd.to_datetime(seq[hit + 1], unit="us"),
                    "gap_seconds": d[hit] / 1e6,
                    "kind": "gap",
                }
            )

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            monitor,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
