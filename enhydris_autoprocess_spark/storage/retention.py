"""Retention enforcement — the third leg of the north rule's
"rollup + downsample + RETENTION engine".

The reference runs on TimescaleDB, whose retention story is
``drop_chunks(older_than)``: whole time-chunks are dropped, never
individual rows (tests/test_models.py:64-67 pin the hypertable record
store; retention itself is an operational Timescale policy, not
reference code). The TierTable analog drops at the same granularities
it stores:

- whole SNAPSHOT directories whose manifest ``max_ts_us`` lies below
  the cutoff (Iceberg ``expire_snapshots`` + data-file delete);
- within straddling snapshots, whole ``__day=`` partition directories
  strictly before the cutoff's day (hidden-partition chunk drop).

Row-level deletes never happen — a day that contains any retained
instant is kept whole, so retention can only err on the keeping side
(day-granular, exactly like drop_chunks' chunk-granular contract).

The manifest is rewritten atomically (same temp+rename as append):
expired snapshots disappear from it (their time travel is gone, as
after Iceberg expiration), trimmed snapshots get ``min_ts_us`` raised
to the cutoff and ``retention_trimmed`` set (their ``row_count``
becomes an upper bound, flagged by ``rows_approximate``).

A ``RetentionPolicy`` maps tier names to keep-durations; ``None``
keeps forever — the typical ladder keeps raw/checked briefly, 1min for
weeks, 1H for years, 1D forever, which is what makes the tier design a
RETENTION engine rather than just a cascade of aggregates.
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import uuid
from dataclasses import dataclass, field

from .tier_table import Snapshot, TierTable

_DAY_US = 86_400_000_000


def _cutoff_day(cutoff_us: int) -> dt.date:
    return dt.datetime.fromtimestamp(
        cutoff_us / 1e6, tz=dt.timezone.utc
    ).date()


def expire(table: TierTable, cutoff_us: int) -> dict:
    """Drop all data strictly before ``cutoff_us`` (day-granular).

    Returns {"snapshots_dropped": n, "days_dropped": n,
    "snapshots_trimmed": n}. Idempotent: a second call with the same
    cutoff is a no-op. Readers opened after the rewrite see only
    retained data; concurrent readers of already-listed files keep
    working until the files vanish (same caveat as Iceberg expiration).
    """
    snaps = table.snapshots()
    if not snaps:
        return {"snapshots_dropped": 0, "days_dropped": 0, "snapshots_trimmed": 0}
    cut_day = _cutoff_day(cutoff_us)
    kept: list[Snapshot] = []
    dropped = trimmed = days_dropped = 0
    for s in snaps:
        max_ts = s.properties.get("max_ts_us")
        min_ts = s.properties.get("min_ts_us")
        if max_ts is not None and int(max_ts) < cutoff_us:
            # whole snapshot below the cutoff: expire it
            shutil.rmtree(s.data_dir, ignore_errors=True)
            dropped += 1
            continue
        # straddling day-partitioned snapshot: drop whole old days
        if (
            min_ts is not None
            and int(min_ts) < cutoff_us
            and os.path.isdir(s.data_dir)
        ):
            changed = False
            for name in sorted(os.listdir(s.data_dir)):
                if not name.startswith("__day="):
                    continue
                day = dt.date.fromisoformat(name.split("=", 1)[1])
                if day < cut_day:
                    shutil.rmtree(
                        os.path.join(s.data_dir, name), ignore_errors=True
                    )
                    days_dropped += 1
                    changed = True
            if changed:
                s = Snapshot(
                    s.snapshot_id,
                    s.parent_id,
                    s.data_dir,
                    s.row_count,
                    {
                        **s.properties,
                        # day-granular: retained rows start at the cut
                        # day, which may precede cutoff_us itself
                        "min_ts_us": int(
                            dt.datetime(
                                cut_day.year,
                                cut_day.month,
                                cut_day.day,
                                tzinfo=dt.timezone.utc,
                            ).timestamp()
                            * 1e6
                        ),
                        "retention_trimmed": True,
                        "rows_approximate": True,
                    },
                )
                trimmed += 1
        kept.append(s)
    if dropped or trimmed:
        tmp = table._manifest_path + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            for s in kept:
                f.write(s.to_json() + "\n")
        os.replace(tmp, table._manifest_path)
    return {
        "snapshots_dropped": dropped,
        "days_dropped": days_dropped,
        "snapshots_trimmed": trimmed,
    }


@dataclass(frozen=True)
class RetentionPolicy:
    """keep_seconds per tier name; None (or absent) = keep forever."""

    keep_seconds: dict = field(default_factory=dict)

    def cutoff_us(self, tier: str, now_us: int) -> int | None:
        keep = self.keep_seconds.get(tier)
        if keep is None:
            return None
        return now_us - int(keep * 1_000_000)


def enforce(
    root: str, policy: RetentionPolicy, now_us: int, partition_days_col="ts"
) -> dict[str, dict]:
    """Apply the policy to every configured tier under ``root``."""
    results = {}
    for tier, keep in policy.keep_seconds.items():
        cutoff = policy.cutoff_us(tier, now_us)
        if cutoff is None:
            continue
        table = TierTable(
            os.path.join(root, tier),
            partition_days_col=(
                "chunk_end_us" if tier.endswith("_gorilla") else partition_days_col
            ),
        )
        results[tier] = expire(table, cutoff)
    return results
