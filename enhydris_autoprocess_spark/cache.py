"""Cache bookkeeping for operators that persist intermediate frames.

Several operators persist an intermediate DataFrame because their
output DAG references it from both sides of a self-join (signatures,
LSH candidates): without the cache the expensive kernel would evaluate
twice. Spark has no "unpersist when this downstream result
materializes" hook, so the persisted blocks would otherwise accumulate
in executor storage memory across repeated calls in a long-lived
session (they use the default MEMORY_AND_DISK level, so they are
LRU-evictable — a bounded leak, not a correctness issue, but still a
leak).

The convention here: an operator that persists intermediates attaches
them to the returned DataFrame via ``carry_caches``; callers release
them with ``release_caches(df)`` once the result is materialized (or
re-materialized for the last time). The bench harness and the tests do
this after every query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_ATTR = "_engine_cached_deps"


def carry_caches(out: DataFrame, *frames: DataFrame) -> DataFrame:
    """Attach ``frames`` (and any caches THEY carry) to ``out`` so the
    caller can release every persisted intermediate in one call."""
    deps: list[DataFrame] = []
    for f in frames:
        deps.extend(getattr(f, _ATTR, []))
        deps.append(f)
    setattr(out, _ATTR, deps)
    return out


def release_caches(df: DataFrame) -> None:
    """Unpersist every cached intermediate attached to ``df`` (no-op
    for frames without any). Skips only deps whose session is already
    stopped (nothing left to release there); real unpersist failures
    propagate — swallowing them would silently reintroduce the leak
    this module exists to prevent."""
    for dep in getattr(df, _ATTR, []):
        stopped = False
        try:
            sc = dep.sparkSession.sparkContext
        except Exception:
            # Spark Connect has no local SparkContext; the server holds
            # the cache, so attempt the unpersist rather than skipping.
            sc = None
        if sc is not None:
            try:
                stopped = sc._jsc is None
            except Exception:
                stopped = False
        if not stopped:
            dep.unpersist()
    if hasattr(df, _ATTR):
        setattr(df, _ATTR, [])
