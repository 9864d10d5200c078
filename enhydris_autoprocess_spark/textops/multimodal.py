"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

Four dependency-free REAL decoders are built in (stdlib + numpy only):

- PPM (P6 binary, maxval<=255) -> (h, w, 3) uint8 pixels;
- PNG (8-bit gray/RGB/palette/alpha, non-interlaced) -> (h, w, 3)
  uint8 pixels — stdlib ``zlib`` inflate + numpy per-scanline
  unfiltering (Sub/Up vectorized per byte lane, Average/Paeth by their
  sequential definition);
- baseline JPEG (SOF0, 8-bit, gray / 4:4:4 / 4:2:2 / 4:2:0, restart
  markers) -> (h, w, 3) uint8 — spec Huffman + numpy einsum IDCT
  (``jpeg.py``; progressive/arithmetic raise);
- WAV (RIFF PCM 8/16/32-bit) -> mono float32 samples + sample rate.

Formats that genuinely need codec libraries (MP3/AAC, any video) stay
STUBBED behind NotImplementedError unless ``fake=True``, in which
case a deterministic fake decoder (seeded from the bytes) produces
stable features so the Spark-side plumbing — schema, partitioning, UDF
signature, Arrow batch shape — is real and tested end-to-end
regardless of available codecs.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
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

FEATURE_DIM = 8


def _fake_decode(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a real decoder: features derived
    from a cryptographic digest of the payload."""
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer((digest * ((dim * 4) // len(digest) + 1))[: dim * 4], "<u4")
    return (raw.astype(np.float64) / 2**32).astype(np.float32)


# --- real decoders (numpy-only) ----------------------------------------------


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) -> (height, width, 3) uint8. Handles arbitrary
    whitespace and '#' comments in the header; maxval must be <= 255
    (the 16-bit variant is rare and out of scope)."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header = magic + 3 ints, tokens separated by whitespace/comments
    tokens: list[int] = []
    pos = 2
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval, then raw pixel data
    width, height, maxval = tokens
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    n = width * height * 3
    pixels = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    return pixels.reshape(height, width, 3)


PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filtering -> (h, stride) uint8.

    Each scanline = 1 filter byte + stride filtered bytes. Filters 0-2
    (None/Sub/Up) vectorize: Sub is a per-byte-lane cumulative sum mod
    256, Up a running row add. Average (3) and Paeth (4) reference the
    RECONSTRUCTED left neighbor, so they walk the row pixel by pixel —
    each step is one bpp-wide numpy op (per PNG spec §9; rows remain
    sequential regardless, since every filter may reference the row
    above)."""
    rl = np.frombuffer(raw, dtype=np.uint8, count=h * (stride + 1)).reshape(
        h, stride + 1
    )
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        f = int(rl[y, 0])
        cur = rl[y, 1:].astype(np.int64)
        if f == 0:
            rec = cur
        elif f == 1:  # Sub: cumsum per byte lane
            rec = np.cumsum(cur.reshape(-1, bpp), axis=0).reshape(-1) % 256
        elif f == 2:  # Up
            rec = (cur + prev) % 256
        elif f == 3:  # Average
            rec = cur.copy()
            rec[:bpp] = (cur[:bpp] + prev[:bpp] // 2) % 256
            for x in range(bpp, stride, bpp):
                rec[x : x + bpp] = (
                    cur[x : x + bpp]
                    + (rec[x - bpp : x] + prev[x : x + bpp]) // 2
                ) % 256
        elif f == 4:  # Paeth
            rec = cur.copy()
            zero = np.zeros(bpp, dtype=np.int64)
            for x in range(0, stride, bpp):
                a = rec[x - bpp : x] if x else zero
                b = prev[x : x + bpp]
                c = prev[x - bpp : x] if x else zero
                p = a + b - c
                pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
                )
                rec[x : x + bpp] = (cur[x : x + bpp] + pred) % 256
        else:
            raise ValueError(f"invalid PNG filter type {f}")
        out[y] = rec
        prev = rec
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """PNG -> (height, width, 3) uint8. Supports bit depth 8, color
    types 0/2/3/4/6 (gray, RGB, palette, gray+alpha, RGBA; alpha is
    dropped, gray replicated to 3 channels), interlace 0. 16-bit and
    Adam7-interlaced images raise NotImplementedError."""
    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr = None
    plte = None
    idat: list[bytes] = []
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8:
        raise NotImplementedError(f"{depth}-bit PNG not supported")
    if interlace != 0:
        raise NotImplementedError("Adam7-interlaced PNG not supported")
    if color not in _PNG_CHANNELS:
        raise ValueError(f"invalid PNG color type {color}")
    channels = _PNG_CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))
    img = _png_unfilter(raw, h, w * channels, channels).reshape(h, w, channels)
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE chunk")
        return plte[img[..., 0]]
    if color in (0, 4):  # gray(+alpha): replicate, drop alpha
        return np.repeat(img[..., :1], 3, axis=2)
    return img[..., :3]  # RGB / RGBA (alpha dropped)


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF WAV (PCM 8/16/32-bit int) -> (sample_rate, mono float32 in
    [-1, 1]). Multi-channel input is averaged to mono."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        chunk_id = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if chunk_id == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif chunk_id == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, rate, _, _, bits = fmt
    if audio_format != 1:
        raise NotImplementedError(f"only PCM wav supported (format {audio_format})")
    if bits == 8:  # 8-bit PCM is unsigned
        samples = (
            np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0
        ) / 128.0
    elif bits == 16:
        samples = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    elif bits == 32:
        samples = np.frombuffer(data, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        raise NotImplementedError(f"{bits}-bit PCM not supported")
    if channels > 1:
        samples = samples[: len(samples) - len(samples) % channels]
        samples = samples.reshape(-1, channels).mean(axis=1)
    return rate, samples


def image_features(pixels: np.ndarray) -> np.ndarray:
    """8-dim summary features of an (h, w, 3) uint8 image: dimensions,
    per-channel means, grayscale std and extrema range."""
    h, w = pixels.shape[:2]
    p = pixels.astype(np.float32)
    gray = p.mean(axis=2)
    return np.array(
        [
            h,
            w,
            p[..., 0].mean(),
            p[..., 1].mean(),
            p[..., 2].mean(),
            gray.std(),
            gray.min(),
            gray.max(),
        ],
        dtype=np.float32,
    )


def audio_features(rate: int, samples: np.ndarray) -> np.ndarray:
    """8-dim summary features of mono audio: duration, rate, moments,
    RMS energy, zero-crossing rate, peak."""
    if len(samples) == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    zc = np.mean(np.abs(np.diff(np.signbit(samples).astype(np.int8))))
    return np.array(
        [
            len(samples) / rate,
            rate,
            samples.mean(),
            samples.std(),
            np.sqrt(np.mean(samples**2)),
            zc,
            samples.min(),
            samples.max(),
        ],
        dtype=np.float32,
    )


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Image payload -> feature vector. Real paths decode binary PPM,
    8-bit PNG, and baseline JPEG (all dependency-free); WebP/AVIF/...
    still need codec libraries (not in this container)."""
    if fake:
        return _fake_decode(payload)
    if payload[:2] == b"P6":
        return image_features(decode_ppm(payload))
    if payload[:8] == PNG_SIG:
        return image_features(decode_png(payload))
    if payload[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg

        return image_features(decode_jpeg(payload))
    raise NotImplementedError(
        "real decode of non-PPM/PNG/JPEG images requires PIL/cv2 (not "
        "installed in this container); pass fake=True for the "
        "deterministic stub"
    )


def decode_audio(payload: bytes, fake: bool = False) -> np.ndarray:
    """Audio payload -> feature vector. Real path decodes RIFF PCM WAV;
    compressed formats need codec libraries (not in this container)."""
    if fake:
        return _fake_decode(payload)
    if payload[:4] == b"RIFF":
        return audio_features(*decode_wav(payload))
    raise NotImplementedError(
        "real decode of non-WAV audio requires codec libraries (not "
        "installed in this container); pass fake=True for the stub"
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
    repartition upstream by size if payloads are skewed. Iteration is
    a column zip — per-payload work is inherently per-row, but
    ``iterrows`` added ~10x bookkeeping per row on top of it.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for media_id, kind, duration_ms, payload in zip(
                b["media_id"], b["kind"], b["duration_ms"], b["payload"]
            ):
                payload = bytes(payload) if payload is not None else b""
                if kind == "audio":
                    feat = decode_audio(payload, fake=fake)
                else:  # image | video (video real-decode is lib-blocked)
                    feat = decode_image(payload, fake=fake)
                frames = (
                    max(1, int(duration_ms or 0) // (frame_stride * 1000))
                    if kind == "video"
                    else 1
                )
                out.append(
                    (
                        media_id,
                        kind,
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


def make_ppm(pixels: np.ndarray) -> bytes:
    """Encode (h, w, 3) uint8 -> binary PPM (for tests/fixtures)."""
    h, w = pixels.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.astype(np.uint8).tobytes()


def make_png(
    pixels: np.ndarray, filter_type: int = 0, color: int = 2
) -> bytes:
    """Encode uint8 pixels -> PNG (for tests/fixtures). ``pixels`` is
    (h, w, 3) for color type 2 (RGB) or (h, w) for type 0 (gray).
    ``filter_type`` applies the given PNG filter to every scanline so
    the decoder's unfiltering paths can each be exercised."""
    if color == 2:
        h, w = pixels.shape[:2]
        flat = pixels.astype(np.int64).reshape(h, w * 3)
        bpp = 3
    elif color == 0:
        h, w = pixels.shape
        flat = pixels.astype(np.int64).reshape(h, w)
        bpp = 1
    else:
        raise ValueError("test encoder supports color types 0 and 2")
    lines = []
    prev = np.zeros(flat.shape[1], dtype=np.int64)
    for y in range(h):
        cur = flat[y]
        left = np.zeros_like(cur)
        left[bpp:] = cur[:-bpp]
        upleft = np.zeros_like(prev)
        upleft[bpp:] = prev[:-bpp]
        if filter_type == 0:
            filt = cur
        elif filter_type == 1:
            filt = cur - left
        elif filter_type == 2:
            filt = cur - prev
        elif filter_type == 3:
            filt = cur - (left + prev) // 2
        elif filter_type == 4:
            p = left + prev - upleft
            pa, pb, pc = (
                np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            )
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            filt = cur - pred
        else:
            raise ValueError(filter_type)
        lines.append(bytes([filter_type]) + (filt % 256).astype(np.uint8).tobytes())
        prev = cur
    raw = zlib.compress(b"".join(lines))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", raw)
        + chunk(b"IEND", b"")
    )


def make_wav(rate: int, samples: np.ndarray) -> bytes:
    """Encode mono float32 [-1,1] -> 16-bit PCM WAV (for tests)."""
    pcm = np.clip(samples * 32768.0, -32768, 32767).astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF",
        36 + len(pcm),
        b"WAVE",
        b"fmt ",
        16,
        1,
        1,
        rate,
        rate * 2,
        2,
        16,
        b"data",
        len(pcm),
    )
    return hdr + pcm


def fake_media_frame(spark, n: int = 32, seed: int = 5) -> DataFrame:
    """Deterministic synthetic media table for tests: images are REAL
    tiny PPMs, PNGs, and baseline JPEGs (rotating, with rotating PNG
    filter types / JPEG subsampling) and audio is REAL PCM WAV
    (decodable with fake=False); video payloads are random bytes (real
    video decode is lib-blocked)."""
    from .jpeg import encode_jpeg

    rng = np.random.RandomState(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            px = rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)
            variant = (i // 3) % 3
            if variant == 0:
                payload = make_ppm(px)
            elif variant == 1:
                payload = make_png(px, filter_type=(i // 9) % 5)
            else:
                payload = encode_jpeg(
                    px, quality=90, subsample=("444", "420")[(i // 9) % 2]
                )
        elif kind == "audio":
            t = np.arange(800, dtype=np.float32) / 8000.0
            payload = make_wav(8000, np.sin(2 * np.pi * (100 + 50 * i) * t))
        else:
            payload = rng.bytes(64 + int(rng.randint(0, 192)))
        rows.append(
            (
                i,
                kind,
                {"image": "image/x-portable-pixmap", "audio": "audio/wav",
                 "video": "video/mp4"}[kind],
                8 if kind == "image" else None,
                8 if kind == "image" else None,
                int(rng.randint(1000, 60000)) if kind != "image" else None,
                bytearray(payload),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
