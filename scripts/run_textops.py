"""spark-submit entry point for the training-data (documents) pipeline
— the text-side analog of ``run_pipeline.py``'s timeseries DAG.

    spark-submit --py-files enhydris_autoprocess_spark.zip \
        scripts/run_textops.py --config job.json \
        --input <documents parquet> --output <admitted dir> \
        [--index-root <near-dup index dir>]

One batch run composes, in one Spark job per stage family:

  exact dedup (keep the min-id doc per content hash)
    -> language allow-list filter (stopword-vote heuristic)
    -> quality floor filter (composite score)
    -> near-dup check against the PERSISTENT MinHash index
       (batch-vs-corpus + batch-vs-batch; losers dropped from the
       ADMITTED output; the whole filtered batch — losers included —
       is indexed, deliberately: a later doc that near-dups a dropped
       loser but drifts past the keeper's bands is still caught, so
       chains of drift D1~D2~D3 dedup even when D1!~D3)
    -> token stats attached
    -> admitted docs written + per-stage counts printed

JSON config (every key optional — a stage absent from the config is
skipped):

{
  "exact_dedup": true,
  "lang_allow": ["en", "de"],
  "min_quality": 0.35,
  "near_dup": {"threshold": 0.7, "num_hashes": 64, "bands": 16,
                "shingle_k": 3, "batch_key": "crawl-2024-06-01"},
  "id_col": "doc_id", "text_col": "text", "id_type": "long"
}

Near-dup LOSER rule (deterministic): within each discovered pair the
larger id is dropped; a doc paired with any already-indexed doc is
dropped. The NEXT batch dedups against everything this batch indexed
— exactly the incremental-crawl contract of
``textops.dedup_incremental.MinHashIndex``.

Scale shape: every filter is a column expression or a broadcast
semi/anti join keyed by doc id; the only state that grows with the
corpus is the index, whose batch-vs-corpus join broadcasts the batch
(corpus scanned, never shuffled).
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def run(spark: SparkSession, docs, cfg: dict, index_root: str | None):
    from enhydris_autoprocess_spark.textops import (
        MinHashIndex,
        exact_dedup,
        language_id,
        quality_score,
        token_stats,
    )

    id_col = cfg.get("id_col", "doc_id")
    text_col = cfg.get("text_col", "text")
    counts: dict[str, int] = {"input": docs.count()}
    pairs_out = None

    if cfg.get("exact_dedup", True):
        keepers = (
            exact_dedup(docs, id_col, text_col)
            .where(F.col("dup_of").isNull())
            .select(id_col)
        )
        docs = docs.join(keepers, id_col, "left_semi")
        counts["after_exact_dedup"] = docs.count()

    if cfg.get("lang_allow"):
        lang = language_id(docs, id_col, text_col)
        ok = lang.where(
            F.col("lang_pred").isin(list(cfg["lang_allow"]))
        ).select(id_col)
        docs = docs.join(ok, id_col, "left_semi")
        counts["after_lang_filter"] = docs.count()

    if cfg.get("min_quality") is not None:
        q = quality_score(docs, id_col, text_col)
        ok = q.where(
            F.col("quality") >= float(cfg["min_quality"])
        ).select(id_col)
        docs = docs.join(ok, id_col, "left_semi")
        counts["after_quality_filter"] = docs.count()

    nd = cfg.get("near_dup")
    if nd and index_root:
        idx = MinHashIndex(
            spark,
            index_root,
            num_hashes=int(nd.get("num_hashes", 64)),
            bands=int(nd.get("bands", 16)),
            shingle_k=int(nd.get("shingle_k", 3)),
            threshold=float(nd.get("threshold", 0.7)),
            id_type=cfg.get("id_type", "long"),
        )
        pairs = idx.append(
            docs, id_col, text_col, batch_key=nd.get("batch_key")
        ).persist()
        batch_ids = docs.select(F.col(id_col).alias("__bid"))
        # losers: within-batch pairs drop the larger id; pairs against
        # an already-indexed doc drop the batch-side id (the archive
        # copy wins)
        in_batch = (
            pairs.join(
                batch_ids, pairs.id_a == F.col("__bid"), "left_semi"
            )
            .select(F.greatest("id_a", "id_b").alias(id_col))
        )
        vs_corpus_a = pairs.join(
            batch_ids, pairs.id_a == F.col("__bid"), "left_anti"
        ).select(F.col("id_b").alias(id_col))
        vs_corpus_b = pairs.join(
            batch_ids, pairs.id_b == F.col("__bid"), "left_anti"
        ).select(F.col("id_a").alias(id_col))
        losers = in_batch.union(vs_corpus_a).union(vs_corpus_b).distinct()
        docs = docs.join(losers, id_col, "left_anti")
        counts["after_near_dup"] = docs.count()
        counts["near_dup_pairs"] = pairs.count()
        pairs_out = pairs

    stats = token_stats(docs, id_col, text_col)
    admitted = docs.join(stats, id_col)
    # caller releases pairs_out's caches after materializing BOTH
    # outputs — admitted depends on the pair frame via the loser
    # anti-join
    return admitted, pairs_out, counts


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--input", required=True, help="documents parquet path")
    p.add_argument("--output", required=True, help="admitted-docs dir")
    p.add_argument("--index-root", default=None,
                   help="persistent near-dup index directory")
    p.add_argument("--pairs-output", default=None,
                   help="optional dir for the discovered near-dup pairs")
    args = p.parse_args(argv)
    with open(args.config) as f:
        cfg = json.load(f)

    spark = SparkSession.builder.appName(
        "enhydris-autoprocess-spark-textops"
    ).getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    docs = spark.read.parquet(args.input)

    admitted, pairs, counts = run(spark, docs, cfg, args.index_root)
    admitted.write.mode("errorifexists").parquet(args.output)
    if pairs is not None and args.pairs_output:
        pairs.write.mode("errorifexists").parquet(args.pairs_output)
    if pairs is not None:
        from enhydris_autoprocess_spark.cache import release_caches

        release_caches(pairs)
    counts["admitted"] = spark.read.parquet(args.output).count()
    for k, v in counts.items():
        print(f"{k}: {v}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
