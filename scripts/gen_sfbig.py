"""Generate an sf1.0-scale synthetic dataset for LOCAL optimization
measurement (round 7). The driver's own sf1.0 is not present in the
sandbox; this reproduces its statistical shape (inferred from
sf0.01/sf0.1: row-count scaling, 31-word vocabulary, doc length
10-100 words, unit-norm 64-dim embeddings with weak label structure,
1500-users-per-100k-events streams over a 30-day span, single-row-group
parquet files) so that optimizations measured here transfer to the
driver's round-end measurement. Deterministic (seed=42-derived).

Usage: python scripts/gen_sfbig.py [out_dir] [scale]
  scale=1.0 -> documents 50k, embeddings 20k, events 1M
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "query", "index", "shuffle", "batch", "cache", "join",
    "filter", "group", "order", "limit", "select", "insert", "update",
    "delete", "schema", "parquet", "arrow", "kernel", "hash", "sort",
    "scan", "write", "read",
]


def gen_documents(n: int, rng: np.random.RandomState) -> pa.Table:
    lens = rng.randint(10, 101, size=n)
    texts = []
    for ln in lens:
        texts.append(" ".join(rng.choice(VOCAB, size=ln)))
    # plant near-dups: ~0.5% of docs are light perturbations of an
    # earlier doc (swap ~5% of words), ~0.15% exact copies — matches
    # the gate corpora's planted-pair density (25 pairs / 500 docs at
    # sf0.01 incl. jaccard>=0.5 survivors).
    n_near = n // 200
    n_exact = max(1, n // 650)
    src = rng.randint(0, n, size=n_near + n_exact)
    dst = rng.randint(0, n, size=n_near + n_exact)
    for i in range(n_near):
        words = texts[src[i]].split()
        nmut = max(1, len(words) // 20)
        pos = rng.randint(0, len(words), size=nmut)
        for p in pos:
            words[p] = VOCAB[rng.randint(0, len(VOCAB))]
        texts[dst[i]] = " ".join(words)
    for i in range(n_near, n_near + n_exact):
        if src[i] != dst[i]:
            texts[dst[i]] = texts[src[i]]
    langs = rng.choice(
        ["en", "de", "fr", "es", "zh"], size=n, p=[0.41, 0.14, 0.15, 0.15, 0.15]
    )
    sources = np.array([f"src{i % 20}" for i in range(n)])
    n_chars = np.array([len(t) for t in texts], dtype=np.int64)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(langs),
            "source": pa.array(sources),
            "n_chars": pa.array(n_chars),
        }
    )


def gen_embeddings(n: int, rng: np.random.RandomState) -> pa.Table:
    dim = 64
    labels = rng.randint(0, 10, size=n).astype(np.int32)
    cents = rng.randn(10, dim) * 0.07
    V = cents[labels] + rng.randn(n, dim) * 0.125
    V = V / np.linalg.norm(V, axis=1, keepdims=True)
    V32 = V.astype(np.float32)
    emb = pa.FixedSizeListArray.from_arrays(pa.array(V32.ravel()), dim).cast(
        pa.list_(pa.float32())
    )
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": emb,
            "label": pa.array(labels),
        }
    )


def gen_events(n: int, rng: np.random.RandomState) -> pa.Table:
    n_users = max(1, (n * 15) // 1000)
    user_id = rng.randint(0, n_users, size=n).astype(np.int64)
    t0 = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    span = 30 * 86400 * 1_000_000
    ts = t0 + (rng.rand(n) * span).astype(np.int64)
    order = np.argsort(ts, kind="stable")
    ts, user_id = ts[order], user_id[order]
    etype = rng.choice(["signup", "purchase", "view", "click", "error"], size=n)
    value = np.round(np.abs(rng.randn(n)) * 49.6 + rng.rand(n) * 30, 2)
    props = np.array([f'{{"k": {v}}}' for v in rng.randint(0, 100, size=n)])
    return pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(ts.astype("datetime64[us]")),
            "user_id": pa.array(user_id),
            "event_type": pa.array(etype),
            "value": pa.array(value),
            "props": pa.array(props),
        }
    )


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/sfbig"
    scale = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    os.makedirs(out, exist_ok=True)
    rng = np.random.RandomState(42)
    tables = {
        "documents": gen_documents(int(50000 * scale), rng),
        "embeddings": gen_embeddings(int(20000 * scale), rng),
        "events": gen_events(int(1_000_000 * scale), rng),
    }
    for name, tbl in tables.items():
        # single row group, like the driver's files (the scan-shape
        # the operators' _min_scan_partitions guard exists for)
        pq.write_table(
            tbl, f"{out}/{name}.parquet", row_group_size=max(1, tbl.num_rows)
        )
        print(name, tbl.num_rows)


if __name__ == "__main__":
    main()
