"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the engine's operators (SURVEY.md §2 + the
training-data ops) over the driver's parquet tables; ``oracle_sql()``
gives the DuckDB-equivalent SQL for every SQL-expressible one. The LSH
/IVF internals are not SQL-expressible, but their OUTPUTS are oracle-
checked through invariants (candidates exact-verified, or recall~1 /
exhaustive-probe / pigeonhole-complete gate parameters where the
approximate result provably equals the exact one — see the section
comments). Every entry has an oracle; production-parameterized
variants of the gated queries stay pinned by pytest
(tests/test_textops.py).

Conventions shared by both sides so the value-hash comparison is
byte-stable:
- pipeline-internal NaN becomes NULL at this boundary (nan_to_null);
- every arithmetically-computed double is round(x, 6);
- count-like columns are cast to long/BIGINT;
- ties in top-k are broken by neighbor id.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from enhydris_autoprocess_spark.config import (
    AggregationConfig,
    CurveInterpolationConfig,
    CurvePeriod,
    RangeCheckConfig,
    RateOfChangeConfig,
    RoccThreshold,
)
from enhydris_autoprocess_spark.operators import (
    curve_interpolation,
    gap_fill,
    range_check,
    rate_of_change_check,
    regularize,
    sessionize,
)
from enhydris_autoprocess_spark.rollup import quantile_rollup
from enhydris_autoprocess_spark.operators.aggregate import (
    aggregate_step,
    source_end_frame,
    trim_last_if_incomplete,
)
from enhydris_autoprocess_spark.cache import carry_caches
from enhydris_autoprocess_spark.schema import nan_to_null
from enhydris_autoprocess_spark.textops import (
    brute_force_cosine_topk,
    ivf_cosine_topk,
    document_fingerprint,
    embedding_near_dup_pairs,
    exact_dedup,
    language_id,
    lsh_cosine_topk,
    MinHashIndex,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    quality_score,
    simhash_dedup_pairs,
    token_stats,
)
from enhydris_autoprocess_spark.timeutil import parse_step

import datetime as dt


def round6(c):
    """Cross-engine-stable 6-dp rounding: floor(x*1e6 + 0.5)/1e6.

    Spark's round() (BigDecimal HALF_UP on the exact binary value) and
    DuckDB's round() disagree on values that land exactly on a .5e-6
    boundary — which interpolated values do systematically, since gap
    fractions have small power-of-two denominators. floor-based
    rounding is pure IEEE arithmetic, hence bit-identical everywhere.
    """
    return F.floor(c * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )


def _events_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events as a (user_id-keyed) flagged series."""
    return _events(spark, sf_dir).select(
        "event_id",
        "user_id",
        "ts",
        F.col("value"),
        F.lit("").alias("flags"),
    )


def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# --- reference-family operators over events ---------------------------------

RANGE_CFG = RangeCheckConfig(5.0, 450.0, 20.0, 400.0)
ROCC_CFG = RateOfChangeConfig(
    (RoccThreshold("30min", 40.0), RoccThreshold("1H", 60.0)), symmetric=False
)
CURVE_CFG = CurveInterpolationConfig(
    (
        CurvePeriod(
            dt.date(2024, 1, 1),
            dt.date(2024, 12, 31),
            ((0.0, 10.0), (100.0, 60.0), (400.0, 360.0)),
        ),
    )
)
AGG_CFG = AggregationConfig("H", "sum", max_missing=8, resulting_timestamp_offset="1min")


def q_range_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = range_check(_events_series(spark, sf_dir), RANGE_CFG)
    return out.select(
        "event_id", nan_to_null(F.col("value")).alias("value_out"), "flags"
    )


def q_rocc_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = rate_of_change_check(
        _events_series(spark, sf_dir), ROCC_CFG, key_col="user_id"
    )
    return out.select(
        "event_id", nan_to_null(F.col("value")).alias("value_out"), "flags"
    )


def q_curve_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = curve_interpolation(_events_series(spark, sf_dir), CURVE_CFG)
    return out.select(
        "event_id",
        round6(nan_to_null(F.col("value"))).alias("value_out"),
        "flags",
    )


def q_regularize_10min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INSTANTANEOUS mode: nearest record per slot (sampled channel)."""
    out = regularize(
        _events_series(spark, sf_dir).select("user_id", "ts", "value", "flags"),
        parse_step("10min"),
        mode="INSTANTANEOUS",
        key_col="user_id",
    )
    return out.select("user_id", "ts", "value", "flags")


def q_regularize_interval_10min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL mode: contributions summed per slot (interval channel,
    e.g. per-interval totals) — the reference's mode for every
    non-mean aggregation method (models.py:479-481)."""
    out = regularize(
        _events_series(spark, sf_dir).select("user_id", "ts", "value", "flags"),
        parse_step("10min"),
        mode="INTERVAL",
        key_col="user_id",
    )
    return out.select(
        "user_id", "ts", round6(nan_to_null(F.col("value"))).alias("value_sum"), "flags"
    )


def q_agg_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly sum per event_type (assumed 10min source step => 6
    expected slots; max_missing 4 => min_count 2), offset 1min,
    trim-last — the full A1-A3+W5 semantics on real data density."""
    src = _events(spark, sf_dir).select(
        F.col("event_type"), "ts", "value", F.lit("").alias("flags")
    )
    agg = aggregate_step(
        src,
        parse_step("10min"),
        parse_step("H"),
        "sum",
        max_missing=4,
        offset_minutes=1,
        key_col="event_type",
    )
    agg = trim_last_if_incomplete(
        agg, source_end_frame(src, "event_type"), key_col="event_type"
    )
    return agg.select(
        "event_type",
        "ts",
        round6(F.col("value")).alias("value_sum"),
        F.col("n_present").cast("long").alias("n_present"),
        "flags",
    )


def q_gapfill_10min(spark: SparkSession, sf_dir: str) -> DataFrame:
    reg = q_regularize_10min(spark, sf_dir)
    out = gap_fill(reg, parse_step("10min"), key_col="user_id")
    return out.select(
        "user_id",
        "ts",
        round6(nan_to_null(F.col("value"))).alias("value_filled"),
        "flags",
    )


# --- rollup tiers over events ------------------------------------------------


def _bucket(ts, step_us: int):
    us = F.unix_micros(ts)
    return F.timestamp_micros(us + (F.lit(step_us) - us % F.lit(step_us)) % F.lit(step_us))


def q_rollup_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select(
        "user_id", "event_type", _bucket(F.col("ts"), 3600_000_000).alias("ts"), "value"
    )
    # Nearly every (user, hour) cell is unique at the driver's
    # densities, so map-side partial aggregation cannot collapse and
    # the groupingSets shape shuffles the Expand-doubled rows as
    # 8-column aggregation states. Instead: one repartition exchange
    # of the raw 4-column rows keyed by user_id, then each grouping
    # set as its own aggregation over that exchange — ReuseExchange
    # shares the shuffle between the two branches, and
    # hashpartitioning(user_id) satisfies both aggregates' clustered
    # distributions (user_id is in every grouping set), so no further
    # exchange appears. Semantically identical to GROUPING SETS
    # ((user_id, ts), (user_id, event_type, ts)) with
    # coalesce(event_type, '<all>') applied to both sets.
    ev = ev.repartition("user_id")
    aggs = (
        F.count(F.lit(1)).cast("long").alias("n_events"),
        round6(F.sum("value")).alias("value_sum"),
        F.min("value").alias("value_min"),
        F.max("value").alias("value_max"),
    )
    fine = (
        ev.groupBy("user_id", "event_type", "ts")
        .agg(*aggs)
        .withColumn("event_type", F.coalesce("event_type", F.lit("<all>")))
    )
    alls = (
        ev.groupBy("user_id", "ts")
        .agg(*aggs)
        .select(
            "user_id",
            F.lit("<all>").alias("event_type"),
            "ts",
            "n_events",
            "value_sum",
            "value_min",
            "value_max",
        )
    )
    return fine.unionByName(alls)


def q_tier_1d_from_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1d tier COMPOSED from the 1h tier (lossless stats) — must equal
    the oracle's direct daily aggregation (tier-by-tier equality)."""
    ev = _events(spark, sf_dir).select(
        "user_id", _bucket(F.col("ts"), 3600_000_000).alias("ts"), "value"
    )
    # Same groups~=rows property as rollup_hourly: one exchange of raw
    # 3-column rows keyed by user_id replaces two exchanges of
    # aggregation states ((user,hour) then (user,day)); both tier
    # aggregations are clustered-distribution-satisfied by user_id.
    ev = ev.repartition("user_id")
    t1h = ev.groupBy("user_id", "ts").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("value").alias("value_sum"),
        F.min("value").alias("value_min"),
        F.max("value").alias("value_max"),
    )
    t1d = (
        t1h.withColumn("ts", _bucket(F.col("ts") - F.expr("INTERVAL 1 MICROSECOND"), 86400_000_000))
        .groupBy("user_id", "ts")
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            round6(F.sum("value_sum")).alias("value_sum"),
            F.min("value_min").alias("value_min"),
            F.max("value_max").alias("value_max"),
        )
    )
    return t1d


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-min-gap sessionization of each user's event stream —
    conversation-session detection over the transcript-shaped table
    (operators/session.py)."""
    out = sessionize(
        _events(spark, sf_dir).select("user_id", "ts", "value"),
        gap_seconds=1800,
        key_col="user_id",
    )
    return out.select(
        "user_id",
        "session_id",
        "session_start",
        "session_end",
        "n_events",
        round6(F.col("value_sum")).alias("value_sum"),
    )


def q_sessionize_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same sessions via the hot-key chunked variant (lookback-halo
    time chunks + per-chunk ordinal prefix sums, operators/session.py
    _sessionize_chunked) — identical output to the plain window path,
    so it shares the sessionize oracle; a 6h chunk span over the
    fixture's multi-day user streams makes real sessions cross chunk
    boundaries at sf0.01."""
    out = sessionize(
        _events(spark, sf_dir).select("user_id", "ts", "value"),
        gap_seconds=1800,
        key_col="user_id",
        chunk_span_seconds=6 * 3600,
    )
    return out.select(
        "user_id",
        "session_id",
        "session_start",
        "session_end",
        "n_events",
        round6(F.col("value_sum")).alias("value_sum"),
    )


def q_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exact p50/p95 of the value channel (rollup.py
    quantile_rollup; Spark exact percentile == ANSI percentile_cont ==
    DuckDB quantile_cont, round6 both sides)."""
    out = quantile_rollup(
        _events(spark, sf_dir).select("user_id", "value"),
        key_cols=("user_id",),
    )
    return out.select(
        "user_id",
        "n",
        round6(F.col("p50")).alias("p50"),
        round6(F.col("p95")).alias("p95"),
    )


# --- training-data ops --------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = exact_dedup(_documents(spark, sf_dir))
    return out.select(
        "doc_id", "content_hash", "dup_of", F.col("group_size").cast("long").alias("group_size")
    )


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = token_stats(_documents(spark, sf_dir))
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_chars").cast("long").alias("n_chars"),
        F.col("n_subwords_est").cast("long").alias("n_subwords_est"),
    )


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_score(_documents(spark, sf_dir))


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return language_id(_documents(spark, sf_dir))


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return document_fingerprint(_documents(spark, sf_dir)).select(
        "doc_id", "fingerprint"
    )


def q_docs_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data admission pipeline —
    ``scripts/run_textops.py``'s stage order minus the near-dup stage
    (whose LSH banding is not SQL-expressible; it has its own
    ``minhash_dedup``/``minhash_dedup_incremental`` oracle entries):
    exact-dedup keepers -> language allow-list ('en') -> quality floor
    (0.65) -> token stats. Every stage is a column expression or a
    semi-join keyed by doc_id — no stage widens the shuffled row."""
    docs = _documents(spark, sf_dir)
    keep = (
        exact_dedup(docs)
        .where(F.col("dup_of").isNull())
        .select("doc_id")
    )
    docs = docs.join(keep, "doc_id", "left_semi")
    ok_lang = (
        language_id(docs)
        .where(F.col("lang_pred") == "en")
        .select("doc_id")
    )
    docs = docs.join(ok_lang, "doc_id", "left_semi")
    ok_q = (
        quality_score(docs)
        .where(F.col("quality") >= 0.65)
        .select("doc_id", "quality")
    )
    stats = token_stats(docs)  # replaces the source's own n_chars
    return stats.join(ok_q, "doc_id").select(
        "doc_id",
        "quality",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_chars").cast("long").alias("n_chars"),
        F.col("n_subwords_est").cast("long").alias("n_subwords_est"),
    )


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(
        _documents(spark, sf_dir), k=3, threshold=0.2
    ).select("id_a", "id_b", round6(F.col("jaccard")).alias("jaccard"))


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _embeddings(spark, sf_dir)
    q = emb.where(F.col("vec_id") < 5)
    out = brute_force_cosine_topk(emb, q, k=5)
    return out.select(
        "query_id",
        "neighbor_id",
        F.col("rank").cast("long").alias("rank"),
        "score",
    )


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, exact method (oracle-checked).
    The test embeddings have no planted dups (max pairwise cosine
    ~0.51), so the threshold sits in the distribution tail to produce
    verifiable rows; the LSH scale path is pinned by pytest recall
    tests on planted near-dups instead."""
    out = embedding_near_dup_pairs(
        _embeddings(spark, sf_dir), threshold=0.35, method="exact",
        round_digits=None,
    )
    return out.select("id_a", "id_b", round6(F.col("cosine")).alias("cosine"))


# --- LSH ops, oracle-checked through output invariants -------------------------
#
# The LSH internals (signatures, banding) are not SQL-expressible, but
# their OUTPUTS are verifiable: candidates re-verified by an exact
# measure must equal the exact all-pairs answer whenever LSH recall is
# 1 — and the gate parameters below make a miss astronomically
# unlikely on the test corpus (planted dups have shingle-Jaccard
# >= 0.889 vs background < 0.15, so a 16-band/4-row signature misses a
# qualifying pair w.p. (1-0.9^4)^16 ~ 4e-8; gate cosines ~0.25-0.40
# under 64 bands x 2 bits miss w.p. ~1e-12). The driver gate therefore
# catches any real regression in the LSH machinery end-to-end.


def q_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash LSH candidates -> exact shingle-Jaccard verification.

    Oracle: exact all-pairs Jaccard >= 0.5 (equal iff banding recall
    is 1 at the gate scale — see section comment).

    est_filter=False: the exact verification below applies the same
    0.5 threshold the signature-estimate prefilter would, so the
    prefilter can only drop pairs the exact filter drops too — its
    broadcast-attach stage (two extra jobs re-scanning the cached
    signatures) bought nothing. Output is identical: candidates grow
    to the raw banding set, and the exact filter is unchanged."""
    docs = _documents(spark, sf_dir)
    # persist: the verification stage references the candidate frame
    # twice (semi-join id set + the pair join), and without the cache
    # the whole LSH DAG would evaluate twice
    cand = minhash_dedup_pairs(docs, threshold=0.5, est_filter=False).persist()
    verified = ngram_jaccard_pairs(docs, k=3, threshold=0.5, candidates=cand)
    out = verified.select(
        "id_a", "id_b", round6(F.col("jaccard")).alias("jaccard")
    )
    return carry_caches(out, cand)


def q_minhash_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash pairs via the PERSISTENT incremental index
    (textops/dedup_incremental.py), driven over three id-modulo
    batches, then exact shingle-Jaccard verification of the unioned
    per-batch pairs.

    Oracle: the same all-pairs jaccard>=0.5 SQL as ``minhash_dedup`` —
    equality holds iff the batched index reproduces the one-shot LSH
    candidates across batch boundaries (cross-batch candidates come
    from the batch-vs-corpus bucket join, not the self-join; the
    split-equivalence is also pinned by
    tests/test_dedup_incremental.py) and banding recall is 1 at the
    gate scale (see section comment above)."""
    import shutil
    import tempfile

    docs = _documents(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="mhidx-gate-")
    try:
        idx = MinHashIndex(spark, root, threshold=0.5, id_type="long")
        frames = [
            idx.append(docs.where(F.pmod(F.col("doc_id"), F.lit(3)) == i))
            for i in range(3)
        ]
        cand = (
            frames[0].unionByName(frames[1]).unionByName(frames[2]).persist()
        )
        verified = ngram_jaccard_pairs(
            docs, k=3, threshold=0.5, candidates=cand
        )
        out = verified.select(
            "id_a", "id_b", round6(F.col("jaccard")).alias("jaccard")
        )
        # materialize before dropping the index directory: the lazy
        # plan reads the committed parquet under ``root``
        out = out.persist()
        out.count()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return carry_caches(out, cand, *frames)


def q_ivf_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-k at the exhaustive-probe gate configuration
    (n_probe == n_cells => candidate set is the whole corpus, so the
    result equals brute force exactly; partial-probe recall is pinned
    by pytest). Oracle: brute-force top-k SQL."""
    emb = _embeddings(spark, sf_dir)
    q = emb.where(F.col("vec_id") < 5)
    out = ivf_cosine_topk(emb, q, k=5, n_cells=8, n_probe=8)
    return out.select(
        "query_id",
        "neighbor_id",
        F.col("rank").cast("long").alias("rank"),
        "score",
    )


def q_lsh_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH ANN top-k at recall~1 gate parameters (64 bands x
    2 bits). Oracle: brute-force top-k — identical scorer + rounding +
    tie-break on both sides, so equality holds iff every true top-5
    neighbor was an LSH candidate."""
    emb = _embeddings(spark, sf_dir)
    q = emb.where(F.col("vec_id") < 5)
    out = lsh_cosine_topk(emb, q, k=5, dim=64, bands=64, bits_per_band=2)
    return out.select(
        "query_id",
        "neighbor_id",
        F.col("rank").cast("long").alias("rank"),
        "score",
    )


def q_simhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash blocking at a gate-parameterized radius -> exact
    shingle-Jaccard verification (the same trick that made
    ``minhash_dedup`` oracle-checkable).

    At ``max_hamming=15`` the pigeonhole blocking (16 blocks) is
    provably complete for every pair within Hamming distance 15, and
    every jaccard>=0.5 pair on the gate corpora sits well inside that
    radius (measured max qualifying Hamming: 12 at sf0.001, 8 at
    sf0.01, 12 at sf0.1 — deterministic corpora), so exact-verifying
    the candidates provably reproduces the all-pairs jaccard>=0.5
    oracle. The production-radius query (max_hamming=8, hamming
    output) stays pinned by the pytest planted-dup tests and is what
    the bench times."""
    docs = _documents(spark, sf_dir)
    cand = simhash_dedup_pairs(docs, max_hamming=15).persist()
    verified = ngram_jaccard_pairs(docs, k=3, threshold=0.5, candidates=cand)
    out = verified.select(
        "id_a", "id_b", round6(F.col("jaccard")).alias("jaccard")
    )
    return carry_caches(out, cand)


# -------------------------------------------------------------------------------


# Pinned digest of the 36-row media_features result (seeded table +
# deterministic decoders => bit-stable). Recompute on intentional
# decoder/fixture changes with:
#   python -c "import __spark_entry__ as e; print(e._media_digest_live())"
# and re-pin BOTH here and in tests/test_textops.py's recompute test.
_MEDIA_FEATURES_DIGEST = "16c3981b3374b1a3"


def media_features_digest(rows) -> str:
    """Canonical digest of collected media_features rows (sorted by
    media_id; floats at the same 6-decimal rounding the query emits)."""
    import hashlib

    canon = ";".join(
        f"{r.media_id}|{r.kind}|{r.n_bytes}|{r.sha256}|{r.f0:.6f}|{r.f1:.6f}"
        for r in sorted(rows, key=lambda r: r.media_id)
    )
    return hashlib.sha256(canon.encode()).hexdigest()[:16]


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing through the REAL decoders (mapInPandas over
    binary payloads -> fixed-dim features): a deterministic seeded
    media table (real PPM/PNG/JPEG images + PCM WAV audio + MJPEG-AVI
    video, frame-sampled through the JPEG decoder) decoded with
    fake=False. NOT SQL-expressible (bit-level image/audio/video
    codecs have no DuckDB analog), so this entry intentionally has NO
    oracle_sql() — but it is SELF-ASSERTING (VERDICT r05 next-round
    #3): the seeded table and deterministic decoders make the full
    36-row result bit-stable, so the query collects it (bounded by
    construction), checks its digest against the pinned golden, and
    raises on ANY decoder/feature drift — the driver's ``err`` field
    becomes a real correctness signal instead of a row count.
    ``sf_dir`` is unused (the table is synthesized, not read) but kept
    for the uniform signature."""
    from enhydris_autoprocess_spark.textops.multimodal import (
        extract_features,
        fake_media_frame,
    )

    out = _media_features_frame(spark)
    digest = media_features_digest(out.collect())
    if digest != _MEDIA_FEATURES_DIGEST:
        raise ValueError(
            f"media_features drift: digest {digest} != pinned "
            f"{_MEDIA_FEATURES_DIGEST} — a decoder or fixture changed; "
            "if intentional, re-pin _MEDIA_FEATURES_DIGEST"
        )
    return out


def _media_features_frame(spark: SparkSession) -> DataFrame:
    from enhydris_autoprocess_spark.textops.multimodal import (
        extract_features,
        fake_media_frame,
    )

    feats = extract_features(fake_media_frame(spark, n=36), fake=False)
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        "sha256",
        F.round(F.element_at("feature", 1), 6).alias("f0"),
        F.round(F.element_at("feature", 2), 6).alias("f1"),
    )


def _media_digest_live() -> str:
    """Convenience for re-pinning after an intentional decoder change:
    python -c "import __spark_entry__ as e; print(e._media_digest_live())"
    """
    from enhydris_autoprocess_spark.session import build_session

    spark = build_session(master="local[4]")
    try:
        return media_features_digest(_media_features_frame(spark).collect())
    finally:
        spark.stop()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: checks -> regularize -> hourly aggregation over the
    sf0.001 events series (the reference's E1 pipeline shape)."""
    sf_dir = "/root/testdata/sf0.001"
    src = _events_series(spark, sf_dir).select("user_id", "ts", "value", "flags")
    checked = rate_of_change_check(
        range_check(src, RANGE_CFG), ROCC_CFG, key_col="user_id"
    )
    reg = regularize(checked, parse_step("10min"), key_col="user_id")
    agg = aggregate_step(
        reg,
        parse_step("10min"),
        parse_step("H"),
        "sum",
        max_missing=4,
        offset_minutes=1,
        key_col="user_id",
    )
    agg = trim_last_if_incomplete(
        agg, source_end_frame(checked, "user_id"), key_col="user_id"
    )
    return agg.select(
        "user_id", "ts", nan_to_null(F.col("value")).alias("value"), "flags"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "range_check": q_range_check,
        "rocc_check": q_rocc_check,
        "curve_interp": q_curve_interp,
        "regularize_10min": q_regularize_10min,
        "regularize_interval_10min": q_regularize_interval_10min,
        "agg_hourly": q_agg_hourly,
        "gapfill_10min": q_gapfill_10min,
        "rollup_hourly": q_rollup_hourly,
        "tier_1d_from_1h": q_tier_1d_from_1h,
        "sessionize": q_sessionize,
        "sessionize_chunked": q_sessionize_chunked,
        "quantile_rollup": q_quantile_rollup,
        "dedup_exact": q_dedup_exact,
        "token_stats": q_token_stats,
        "quality_score": q_quality_score,
        "lang_id": q_lang_id,
        "doc_fingerprint": q_fingerprint,
        "docs_admission": q_docs_admission,
        "ngram_jaccard": q_ngram_jaccard,
        "cosine_topk": q_cosine_topk,
        "embedding_near_dup": q_embedding_near_dup,
        "minhash_dedup": q_minhash_dedup,
        "minhash_dedup_incremental": q_minhash_dedup_incremental,
        "simhash_dedup": q_simhash_dedup,
        "lsh_cosine_topk": q_lsh_cosine_topk,
        "ivf_cosine_topk": q_ivf_cosine_topk,
        # rows-only (no oracle_sql): bit-level codecs aren't
        # SQL-expressible; decoders are golden-pinned in pytest
        "media_features": q_media_features,
    }


_STOP_EN = "('the','a','of','and','to')"
_STOP_DE = "('der','die','und','das','ein')"
_STOP_FR = "('le','la','et','les','des')"


_SESSION_SQL = """
    WITH w AS (
      SELECT user_id, value, epoch_us(ts) AS us,
        CASE WHEN lag(epoch_us(ts)) OVER
               (PARTITION BY user_id ORDER BY epoch_us(ts)) IS NULL
             OR epoch_us(ts) - lag(epoch_us(ts)) OVER
               (PARTITION BY user_id ORDER BY epoch_us(ts)) > 1800000000
             THEN 1 ELSE 0 END AS new_s
      FROM events),
    s AS (
      SELECT *, sum(new_s) OVER (
        PARTITION BY user_id ORDER BY us
        ROWS UNBOUNDED PRECEDING) AS sid
      FROM w)
    SELECT user_id, CAST(sid AS BIGINT) AS session_id,
      make_timestamp(min(us)) AS session_start,
      make_timestamp(max(us)) AS session_end,
      count(*) AS n_events,
      floor(sum(value) * 1000000 + 0.5) / 1000000 AS value_sum
    FROM s GROUP BY 1, 2
"""


def _oracle_sql_base() -> dict[str, str]:
    return {
        "range_check": """
            SELECT event_id,
              CASE WHEN value < 5.0 OR value > 450.0 THEN NULL ELSE value END AS value_out,
              CASE WHEN value < 5.0 OR value > 450.0 THEN 'RANGE'
                   WHEN value < 20.0 OR value > 400.0 THEN 'SUSPECT'
                   ELSE '' END AS flags
            FROM events
        """,
        "rocc_check": """
            WITH w AS (
              SELECT event_id, value,
                min(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)//1000000
                  RANGE BETWEEN 1800 PRECEDING AND 1 PRECEDING) AS mn30,
                min(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)//1000000
                  RANGE BETWEEN 3600 PRECEDING AND 1 PRECEDING) AS mn60
              FROM events)
            SELECT event_id,
              CASE WHEN (value - mn30 > 40.0) OR (value - mn60 > 60.0)
                   THEN NULL ELSE value END AS value_out,
              CASE WHEN (value - mn30 > 40.0) OR (value - mn60 > 60.0)
                   THEN 'TEMPORAL' ELSE '' END AS flags
            FROM w
        """,
        "curve_interp": """
            SELECT event_id,
              CASE WHEN value < 0.0 OR value > 400.0 THEN NULL
                   WHEN value <= 100.0
                     THEN floor((10.0 + (value - 0.0) * 0.5) * 1000000 + 0.5) / 1000000
                   ELSE floor((60.0 + (value - 100.0) * 1.0) * 1000000 + 0.5) / 1000000
                   END AS value_out,
              '' AS flags
            FROM events
        """,
        "regularize_10min": """
            WITH g AS (
              SELECT user_id, value, epoch_us(ts) AS us,
                (epoch_us(ts) + 300000000) - (epoch_us(ts) + 300000000) % 600000000 AS grid
              FROM events),
            r AS (
              SELECT *, row_number() OVER (
                PARTITION BY user_id, grid ORDER BY abs(us - grid), us) AS rn
              FROM g)
            SELECT user_id, make_timestamp(grid) AS ts, value,
              CASE WHEN us <> grid THEN 'DATEINSERT' ELSE '' END AS flags
            FROM r WHERE rn = 1
        """,
        "regularize_interval_10min": """
            WITH g AS (
              SELECT user_id, value, epoch_us(ts) AS us,
                (epoch_us(ts) + 300000000) - (epoch_us(ts) + 300000000) % 600000000 AS grid
              FROM events),
            r AS (
              SELECT *, row_number() OVER (
                PARTITION BY user_id, grid ORDER BY abs(us - grid), us) AS rn,
                count(*) OVER (PARTITION BY user_id, grid) AS cnt,
                sum(value) OVER (PARTITION BY user_id, grid) AS vsum
              FROM g)
            SELECT user_id, make_timestamp(grid) AS ts,
              floor(vsum * 1000000 + 0.5) / 1000000 AS value_sum,
              CASE WHEN us <> grid OR cnt > 1 THEN 'DATEINSERT' ELSE '' END AS flags
            FROM r WHERE rn = 1
        """,
        "agg_hourly": """
            WITH src AS (SELECT event_type, value, epoch_us(ts) AS us FROM events),
            b AS (SELECT event_type, value, us,
                    us + (3600000000 - us % 3600000000) % 3600000000 AS bend
                  FROM src),
            g AS (SELECT event_type, bend, sum(value) AS s, count(value) AS n
                  FROM b GROUP BY 1, 2),
            m AS (SELECT event_type, max(us) AS src_end FROM src GROUP BY 1),
            f AS (SELECT g.event_type, g.bend, g.s, g.n, m.src_end,
                    max(g.bend) OVER (PARTITION BY g.event_type) AS maxb
                  FROM g JOIN m USING (event_type)
                  WHERE g.n >= 2)
            SELECT event_type, make_timestamp(bend - 60000000) AS ts,
              floor(s * 1000000 + 0.5) / 1000000 AS value_sum, n AS n_present,
              CASE WHEN n < 6 THEN 'MISS' ELSE '' END AS flags
            FROM f
            WHERE NOT (bend = maxb AND n < 6 AND src_end < bend)
        """,
        "gapfill_10min": """
            WITH g AS (
              SELECT user_id, value, epoch_us(ts) AS us,
                (epoch_us(ts) + 300000000) - (epoch_us(ts) + 300000000) % 600000000 AS grid
              FROM events),
            r AS (
              SELECT *, row_number() OVER (
                PARTITION BY user_id, grid ORDER BY abs(us - grid), us) AS rn
              FROM g),
            reg AS (SELECT user_id, grid, value,
                      CASE WHEN us <> grid THEN 'DATEINSERT' ELSE '' END AS flags
                    FROM r WHERE rn = 1),
            spans AS (SELECT user_id, min(grid) AS g0, max(grid) AS g1
                      FROM reg GROUP BY 1),
            grid_full AS (SELECT user_id, unnest(generate_series(g0, g1, 600000000)) AS grid
                          FROM spans),
            j AS (SELECT gf.user_id, gf.grid, reg.value, reg.flags
                  FROM grid_full gf LEFT JOIN reg USING (user_id, grid)),
            anch AS (SELECT user_id, grid, value, flags,
                last_value(value IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY grid
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
                last_value(CASE WHEN value IS NOT NULL THEN grid END IGNORE NULLS)
                  OVER (PARTITION BY user_id ORDER BY grid
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pt,
                first_value(value IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY grid
                  ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
                first_value(CASE WHEN value IS NOT NULL THEN grid END IGNORE NULLS)
                  OVER (PARTITION BY user_id ORDER BY grid
                  ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nt
              FROM j)
            SELECT user_id, make_timestamp(grid) AS ts,
              floor((CASE WHEN value IS NOT NULL THEN value
                   WHEN pv IS NOT NULL AND nv IS NOT NULL
                   THEN pv + ((grid - pt) / (nt - pt)) * (nv - pv)
                   ELSE NULL END) * 1000000 + 0.5) / 1000000 AS value_filled,
              CASE WHEN value IS NOT NULL THEN flags
                   WHEN pv IS NOT NULL AND nv IS NOT NULL THEN 'DATEINSERT FILLED'
                   ELSE 'DATEINSERT' END AS flags
            FROM anch
        """,
        "rollup_hourly": """
            WITH b AS (
              SELECT user_id, event_type, value,
                make_timestamp(epoch_us(ts) + (3600000000 - epoch_us(ts) % 3600000000) % 3600000000) AS ts
              FROM events)
            SELECT user_id, coalesce(event_type, '<all>') AS event_type, ts,
              count(*) AS n_events,
              floor(sum(value) * 1000000 + 0.5) / 1000000 AS value_sum,
              min(value) AS value_min, max(value) AS value_max
            FROM b
            GROUP BY GROUPING SETS ((user_id, ts), (user_id, event_type, ts))
        """,
        "tier_1d_from_1h": """
            WITH b AS (
              SELECT user_id, value,
                make_timestamp(epoch_us(ts) + (86400000000 - epoch_us(ts) % 86400000000) % 86400000000) AS ts
              FROM events)
            SELECT user_id, ts, count(*) AS n_events,
              floor(sum(value) * 1000000 + 0.5) / 1000000 AS value_sum,
              min(value) AS value_min, max(value) AS value_max
            FROM b GROUP BY 1, 2
        """,
        "sessionize": _SESSION_SQL,
        "quantile_rollup": """
            SELECT user_id, count(*) AS n,
              floor(quantile_cont(value, 0.5) * 1000000 + 0.5) / 1000000 AS p50,
              floor(quantile_cont(value, 0.95) * 1000000 + 0.5) / 1000000 AS p95
            FROM events GROUP BY 1
        """,
        "dedup_exact": r"""
            WITH h AS (
              SELECT doc_id,
                md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS content_hash
              FROM documents)
            SELECT doc_id, content_hash,
              CASE WHEN doc_id <> min(doc_id) OVER (PARTITION BY content_hash)
                   THEN min(doc_id) OVER (PARTITION BY content_hash) END AS dup_of,
              count(*) OVER (PARTITION BY content_hash) AS group_size
            FROM h
        """,
        "token_stats": """
            SELECT doc_id,
              len(string_split(trim(text), ' ')) AS n_tokens,
              length(text) AS n_chars,
              CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_subwords_est
            FROM documents
        """,
        "quality_score": f"""
            WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS w,
                         length(text) AS nc FROM documents),
            s AS (SELECT doc_id, nc, len(w) AS nt,
                    len(list_filter(w, x -> x IN {_STOP_EN})) AS sw
                  FROM t)
            SELECT doc_id,
              floor((0.4 * least(nc / 500.0, 1.0)
                  + 0.3 * (1.0 - sw / nt)
                  + 0.3 * least(((nc - (nt - 1)) / nt) / 8.0, 1.0)) * 1000000 + 0.5)
                / 1000000 AS quality,
              floor(sw / nt * 1000000 + 0.5) / 1000000 AS stopword_ratio
            FROM s
        """,
        "lang_id": f"""
            WITH t AS (SELECT doc_id,
                         string_split(trim(lower(text)), ' ') AS w FROM documents),
            s AS (SELECT doc_id,
                    len(list_filter(w, x -> x IN {_STOP_EN})) AS s_en,
                    len(list_filter(w, x -> x IN {_STOP_DE})) AS s_de,
                    len(list_filter(w, x -> x IN {_STOP_FR})) AS s_fr
                  FROM t)
            SELECT doc_id, CASE
              WHEN s_en > greatest(1, s_fr, s_de) THEN 'en'
              WHEN s_de > greatest(1, s_fr) THEN 'de'
              WHEN s_fr > 1 THEN 'fr'
              ELSE 'und' END AS lang_pred
            FROM s
        """,
        "doc_fingerprint": r"""
            SELECT doc_id,
              substr(md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')), 1, 16)
                AS fingerprint
            FROM documents
        """,
        "ngram_jaccard": r"""
            WITH t AS (
              SELECT doc_id,
                string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
              FROM documents),
            sh AS (
              SELECT doc_id,
                list_distinct([array_to_string(w[i:i+2], ' ')
                               for i in range(1, greatest(len(w) - 2, 1) + 1)]) AS s
              FROM t)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              floor(len(list_intersect(a.s, b.s)) * 1.0
                    / len(list_distinct(list_concat(a.s, b.s))) * 1000000 + 0.5)
                / 1000000 AS jaccard
            FROM sh a, sh b
            WHERE a.doc_id < b.doc_id
              AND len(list_intersect(a.s, b.s)) * 1.0
                  / len(list_distinct(list_concat(a.s, b.s))) >= 0.2
        """,
        "embedding_near_dup": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
              floor(list_dot_product(a.v, b.v)
                    / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
                    * 1000000 + 0.5) / 1000000 AS cosine
            FROM e a, e b
            WHERE a.vec_id < b.vec_id
              AND list_dot_product(a.v, b.v)
                  / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
                  >= 0.35
        """,
        "minhash_dedup": r"""
            WITH t AS (
              SELECT doc_id,
                string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
              FROM documents),
            sh AS (
              SELECT doc_id,
                list_distinct([array_to_string(w[i:i+2], ' ')
                               for i in range(1, greatest(len(w) - 2, 1) + 1)]) AS s
              FROM t)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              floor(len(list_intersect(a.s, b.s)) * 1.0
                    / len(list_distinct(list_concat(a.s, b.s))) * 1000000 + 0.5)
                / 1000000 AS jaccard
            FROM sh a, sh b
            WHERE a.doc_id < b.doc_id
              AND len(list_intersect(a.s, b.s)) * 1.0
                  / len(list_distinct(list_concat(a.s, b.s))) >= 0.5
        """,
        "simhash_dedup": r"""
            WITH t AS (
              SELECT doc_id,
                string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
              FROM documents),
            sh AS (
              SELECT doc_id,
                list_distinct([array_to_string(w[i:i+2], ' ')
                               for i in range(1, greatest(len(w) - 2, 1) + 1)]) AS s
              FROM t)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              floor(len(list_intersect(a.s, b.s)) * 1.0
                    / len(list_distinct(list_concat(a.s, b.s))) * 1000000 + 0.5)
                / 1000000 AS jaccard
            FROM sh a, sh b
            WHERE a.doc_id < b.doc_id
              AND len(list_intersect(a.s, b.s)) * 1.0
                  / len(list_distinct(list_concat(a.s, b.s))) >= 0.5
        """,
        "ivf_cosine_topk": """
            WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                       FROM embeddings WHERE vec_id < 5),
            c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv
                  FROM embeddings),
            s AS (SELECT query_id, neighbor_id,
                    floor(list_dot_product(qv, cv)
                          / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
                          * 1000000 + 0.5) / 1000000 AS score
                  FROM q, c WHERE query_id <> neighbor_id),
            r AS (SELECT *, row_number() OVER (
                    PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
                  FROM s)
            SELECT query_id, neighbor_id, rank, score FROM r WHERE rank <= 5
        """,
        "lsh_cosine_topk": """
            WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                       FROM embeddings WHERE vec_id < 5),
            c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv
                  FROM embeddings),
            s AS (SELECT query_id, neighbor_id,
                    floor(list_dot_product(qv, cv)
                          / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
                          * 1000000 + 0.5) / 1000000 AS score
                  FROM q, c WHERE query_id <> neighbor_id),
            r AS (SELECT *, row_number() OVER (
                    PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
                  FROM s)
            SELECT query_id, neighbor_id, rank, score FROM r WHERE rank <= 5
        """,
        "cosine_topk": """
            WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                       FROM embeddings WHERE vec_id < 5),
            c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv
                  FROM embeddings),
            s AS (SELECT query_id, neighbor_id,
                    floor(list_dot_product(qv, cv)
                          / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
                          * 1000000 + 0.5) / 1000000 AS score
                  FROM q, c WHERE query_id <> neighbor_id),
            r AS (SELECT *, row_number() OVER (
                    PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
                  FROM s)
            SELECT query_id, neighbor_id, rank, score FROM r WHERE rank <= 5
        """,
        # chunked sessionize is output-identical to the plain variant
        # by construction (pinned in pytest), so it checks against the
        # same ANSI session SQL
        "sessionize_chunked": _SESSION_SQL,
    }


def oracle_sql() -> dict[str, str]:
    sql = _oracle_sql_base()
    # the incremental index must reproduce the one-shot minhash answer
    # over any batch split, so it checks against the same all-pairs
    # Jaccard oracle
    sql["minhash_dedup_incremental"] = sql["minhash_dedup"]
    # composed admission pipeline: reuses the per-stage oracles as
    # subqueries so the composition is checked, not re-derived
    sql["docs_admission"] = f"""
        WITH keep AS (
          SELECT doc_id FROM ({sql['dedup_exact']}) WHERE dup_of IS NULL),
        lang_ok AS (
          SELECT doc_id FROM ({sql['lang_id']}) WHERE lang_pred = 'en'),
        q_ok AS (
          SELECT doc_id, quality FROM ({sql['quality_score']})
          WHERE quality >= 0.65)
        SELECT t.doc_id, q_ok.quality, t.n_tokens, t.n_chars,
               t.n_subwords_est
        FROM ({sql['token_stats']}) t
        JOIN keep USING (doc_id)
        JOIN lang_ok USING (doc_id)
        JOIN q_ok USING (doc_id)
    """
    return sql
