"""Streaming exact dedup: first-arrival admission within the
watermark horizon, cross-batch state, horizon eviction re-admission."""

import datetime as dt
import os
import time as _time

from pyspark.sql import functions as F

from enhydris_autoprocess_spark.streaming import streaming_exact_dedup
from enhydris_autoprocess_spark.textops import exact_dedup

T0 = dt.datetime(2024, 1, 1, 0, 0)
SCHEMA = "doc_id string, text string, ts timestamp"


def _mins(m):
    return T0 + dt.timedelta(minutes=m)


def _run(spark, tmp_path, batches, watermark="10 minutes"):
    """Write each batch as one file (mtime-ordered), stream with
    maxFilesPerTrigger=1 so each file is its own micro-batch."""
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")
    os.makedirs(in_dir)
    now = _time.time()
    for i, rows in enumerate(batches):
        d = f"{in_dir}/b{i}"
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(d)
        f = [x for x in os.listdir(d) if x.endswith(".parquet")][0]
        os.utime(os.path.join(d, f), (now - 60 * (len(batches) - i),) * 2)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(in_dir)
    )
    out = streaming_exact_dedup(stream, watermark=watermark)
    q = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    return spark.read.parquet(out_dir)


def test_within_and_cross_batch_duplicates_dropped(spark, tmp_path):
    batch1 = [
        ("a", "the quick brown fox", _mins(0)),
        ("b", "THE  quick   brown fox ", _mins(1)),  # dup of a (normalized)
        ("c", "something else entirely", _mins(2)),
    ]
    batch2 = [
        ("d", "the quick brown fox", _mins(3)),  # cross-batch dup of a
        ("e", "a genuinely new document", _mins(4)),
    ]
    got = _run(spark, tmp_path, [batch1, batch2])
    admitted = {r.doc_id for r in got.collect()}
    assert admitted == {"a", "c", "e"}

    # the streaming hash equals the batch operator's content hash
    all_rows = batch1 + batch2
    batch_hashes = {
        r["doc_id"]: r["content_hash"]
        for r in exact_dedup(
            spark.createDataFrame(all_rows, SCHEMA)
        ).collect()
    }
    for r in got.collect():
        assert r.content_hash == batch_hashes[r.doc_id]


def test_horizon_eviction_readmits_late_duplicate(spark, tmp_path):
    """The documented horizon contract: a duplicate arriving after the
    watermark evicted its keeper's state is re-admitted; one within
    the horizon stays dropped.

    State eviction is lazy — it happens while processing a batch under
    the advanced watermark — so the re-admission needs an INTERVENING
    micro-batch between the watermark advance and the late duplicate
    (observed: a duplicate in the very next batch still sees the
    stale state and is dropped)."""
    batch1 = [
        ("x1", "ancient scroll of text", _mins(0)),
        ("y1", "fresh document y", _mins(30)),  # advances watermark to 20
    ]
    # processed under watermark=20: x1's state (keyed at min 0,
    # horizon 10) is evicted during this batch
    batch2 = [("f", "unrelated filler content", _mins(22))]
    batch3 = [
        # x's state is gone: the late duplicate is re-admitted
        ("x2", "ancient scroll of text", _mins(25)),
        # y's state (seen min 30) is still live: dropped
        ("y2", "fresh document y", _mins(31)),
    ]
    got = _run(
        spark, tmp_path, [batch1, batch2, batch3], watermark="10 minutes"
    )
    admitted = {r.doc_id for r in got.collect()}
    assert admitted == {"x1", "y1", "f", "x2"}
