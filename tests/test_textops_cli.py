"""Documents-pipeline spark-submit entry: stage composition, loser
election, cross-run index persistence."""

import json
import os
import sys

from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from a warm windowsill and the birds sing of morning light in the "
    "garden before the long day begins for everyone involved here"
)
GERMAN = (
    "der hund und die katze und das haus und ein baum der gross ist und "
    "die sonne scheint auf das alte dach waehrend der wind weht"
)


def _write_docs(spark, path, rows):
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        path
    )


def test_textops_cli_two_batches(spark, tmp_path):
    from run_textops import main

    cfg = {
        "exact_dedup": True,
        "lang_allow": ["en"],
        "min_quality": 0.2,
        "near_dup": {"threshold": 0.5, "batch_key": "b1"},
        "id_type": "long",
    }
    cfg_path = str(tmp_path / "job.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)

    batch1 = [
        (0, BASE),
        (1, BASE),  # exact dup of 0 -> dropped at exact stage
        (2, GERMAN),  # language filter drops it
        (3, "a a a a a"),  # all-stopword junk: quality floor drops it
        (4, BASE.replace("warm", "cold")),  # near dup of 0 -> loser (4 > 0)
        (5, "a genuinely different english document about spark adaptive "
            "query execution and the shuffling of partitions at scale for "
            "everyone who reads the plan output with care and attention"),
    ]
    in1 = str(tmp_path / "in1")
    _write_docs(spark, in1, batch1)
    idx_root = str(tmp_path / "idx")
    rc = main(
        [
            "--config", cfg_path,
            "--input", in1,
            "--output", str(tmp_path / "out1"),
            "--index-root", idx_root,
            "--pairs-output", str(tmp_path / "pairs1"),
        ]
    )
    assert rc == 0
    admitted1 = {
        r.doc_id for r in spark.read.parquet(str(tmp_path / "out1")).collect()
    }
    assert admitted1 == {0, 5}
    out1 = spark.read.parquet(str(tmp_path / "out1"))
    assert {"n_tokens", "n_chars", "n_subwords_est"} <= set(out1.columns)
    pairs1 = {
        (r.id_a, r.id_b)
        for r in spark.read.parquet(str(tmp_path / "pairs1")).collect()
    }
    assert (0, 4) in pairs1

    # batch 2: a near-dup of an ALREADY-INDEXED doc loses to the archive
    cfg["near_dup"]["batch_key"] = "b2"
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    batch2 = [
        (10, BASE.replace("quick", "slow")),  # near dup of indexed 0
        (11, "fresh english content about manifests snapshots and the "
             "pruning of day partitioned directories under retention "
             "policies for tiered storage systems in production today"),
    ]
    in2 = str(tmp_path / "in2")
    _write_docs(spark, in2, batch2)
    rc = main(
        [
            "--config", cfg_path,
            "--input", in2,
            "--output", str(tmp_path / "out2"),
            "--index-root", idx_root,
        ]
    )
    assert rc == 0
    admitted2 = {
        r.doc_id for r in spark.read.parquet(str(tmp_path / "out2")).collect()
    }
    assert admitted2 == {11}  # 10 lost to the archive copy of doc 0
