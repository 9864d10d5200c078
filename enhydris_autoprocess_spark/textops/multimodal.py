"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode kernels themselves are STUBBED (image/audio libraries are
not available in this container — task brief): ``decode_image`` raises
NotImplementedError unless ``fake=True``, in which case a
deterministic fake decoder (seeded from the bytes) produces stable
features so the Spark-side plumbing — schema, partitioning, UDF
signature, Arrow batch shape — is real and tested end-to-end.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha256 string, "
    "feature array<float>, frames_sampled int"
)


def _fake_decode(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in for a real decoder: features derived
    from a cryptographic digest of the payload."""
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer((digest * ((dim * 4) // len(digest) + 1))[: dim * 4], "<u4")
    return (raw.astype(np.float64) / 2**32).astype(np.float32)


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    if fake:
        return _fake_decode(payload)
    raise NotImplementedError(
        "real image decode requires PIL/cv2 (not installed in this "
        "container); pass fake=True for the deterministic stub"
    )


def extract_features(
    media: DataFrame,
    fake: bool = True,
    frame_stride: int = 10,
    batch_hint: int = 256,
) -> DataFrame:
    """binary payloads -> fixed-dim features via mapInPandas.

    Arrow batch shape: payloads stay bytes end-to-end (no base64 churn);
    output is a narrow feature frame. Partitioning: inherits the scan;
    repartition upstream by size if payloads are skewed.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for _, row in b.iterrows():
                payload = bytes(row["payload"]) if row["payload"] is not None else b""
                feat = decode_image(payload, fake=fake)
                frames = (
                    max(1, int(row["duration_ms"] or 0) // (frame_stride * 1000))
                    if row["kind"] == "video"
                    else 1
                )
                out.append(
                    (
                        row["media_id"],
                        row["kind"],
                        len(payload),
                        hashlib.sha256(payload).hexdigest(),
                        feat.tolist(),
                        frames,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id",
                    "kind",
                    "n_bytes",
                    "sha256",
                    "feature",
                    "frames_sampled",
                ],
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def fake_media_frame(spark, n: int = 32, seed: int = 5) -> DataFrame:
    """Deterministic synthetic media table for tests."""
    rng = np.random.RandomState(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.bytes(64 + int(rng.randint(0, 192)))
        rows.append(
            (
                i,
                kind,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[
                    kind
                ],
                64 if kind == "image" else None,
                64 if kind == "image" else None,
                int(rng.randint(1000, 60000)) if kind != "image" else None,
                bytearray(payload),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
