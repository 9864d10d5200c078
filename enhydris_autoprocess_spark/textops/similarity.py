"""Similarity search over an embedding column (array<float>).

- brute_force_cosine_topk: the exact baseline — broadcast the (small)
  query set against the corpus, dot/norms via zip_with + aggregate
  (JVM-side, no Python), window top-k. At 100 TB the corpus side
  stays partitioned and only queries broadcast.
- lsh_cosine_topk: the scale path — random-hyperplane (sign) LSH:
  b-bit signatures per band, candidates = bucket collisions, exact
  re-scoring on candidates only. Hyperplanes are a tiny broadcast
  literal array generated from a seed.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 6,
) -> DataFrame:
    """Exact top-k neighbors for each query vector.

    Output: query_id, neighbor_id, score, rank (1-based). Self-matches
    excluded. Ties broken by neighbor_id for determinism.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("score"),
        )
    )
    if round_digits is not None:
        scored = scored.withColumn("score", F.round("score", round_digits))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _sign_signature(
    vec: Column, planes: np.ndarray, bands: int, bits_per_band: int
) -> Column:
    """Random-hyperplane (sign) LSH signature: per band, one
    ``bits_per_band``-bit bucket id from the projection signs."""
    sigs = []
    for b in range(bands):
        bits = F.lit(0).cast("long")
        for j in range(bits_per_band):
            p = planes[b * bits_per_band + j]
            proj = F.aggregate(
                F.zip_with(
                    vec,
                    F.array(*[F.lit(float(x)) for x in p]),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bits = bits + F.when(proj > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sigs.append(F.struct(F.lit(b).alias("band"), bits.alias("bucket")))
    return F.array(*sigs)


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    bands: int = 8,
    bits_per_band: int = 8,
    seed: int = 7,
    round_digits: int | None = 6,
) -> DataFrame:
    """Approximate top-k: sign-LSH banding then exact re-score.

    Recall grows with bands; exactness of returned scores is identical
    to brute force (same scorer) — only the candidate set is
    approximate.
    """
    rng = np.random.RandomState(seed)
    planes = rng.randn(bands * bits_per_band, dim)

    def signature(vec: Column) -> Column:
        return _sign_signature(vec, planes, bands, bits_per_band)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("cv"),
    ).withColumn("bb", F.explode(signature(F.col("cv"))))
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("bb", F.explode(signature(F.col("qv"))))

    cand = (
        c.join(F.broadcast(q), c["bb"] == q["bb"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("score")
    )
    if round_digits is not None:
        scored = scored.withColumn("score", F.round("score", round_digits))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "lsh",
    dim: int = 64,
    bands: int = 8,
    bits_per_band: int = 8,
    seed: int = 7,
    round_digits: int | None = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine).

    ``method="exact"``: all-pairs self-join — the oracle path,
    quadratic, for small inputs / verification. ``method="lsh"`` (the
    scale path): sign-LSH self-banding — candidates are bucket
    collisions in any band, then exact cosine verification, so returned
    scores are exact and only recall is approximate (recall of a
    cos-θ pair under b bands of r bits is 1-(1-(1-θ/π)^r)^b). The
    bucket self-join shuffles by (band, bucket) — no broadcast needed,
    collision groups are the only quadratic term.
    """
    base = df.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
    )
    if method == "exact":
        a, b = base.alias("a"), base.alias("b")
        pairs = a.join(b, F.col("a.id") < F.col("b.id")).select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.v").alias("va"),
            F.col("b.v").alias("vb"),
        )
    elif method == "lsh":
        rng = np.random.RandomState(seed)
        planes = rng.randn(bands * bits_per_band, dim)
        sig = base.withColumn(
            "bb", F.explode(_sign_signature(F.col("v"), planes, bands, bits_per_band))
        )
        a, b = sig.alias("a"), sig.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("a.bb") == F.col("b.bb")) & (F.col("a.id") < F.col("b.id")),
            )
            .select(
                F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
                F.col("a.v").alias("va"),
                F.col("b.v").alias("vb"),
            )
            .dropDuplicates(["id_a", "id_b"])
        )
    else:
        raise ValueError(f"unknown method: {method!r}")
    score = cosine(F.col("va"), F.col("vb"))
    if round_digits is not None:
        score = F.round(score, round_digits)
    return (
        pairs.select("id_a", "id_b", score.alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )
