"""Gorilla compression for tier storage (north-star requirement):
delta-of-delta timestamps + XOR-encoded float values, packed per
(key, chunk) into BinaryType blocks inside Arrow-batched pandas UDFs.

Format (bitstream, MSB-first), after a 16-byte header
(count:uint32, t0:int64 micros, reserved:uint32):

Timestamps (Facebook Gorilla §4.1.1 layout, micros resolution with
the paper's value ranges scaled to seconds-as-micros):
  first delta: 32-bit signed (vs t0)
  then per point, dod = delta_i - delta_{i-1}:
    '0'                    dod == 0
    '10'  + 10-bit zigzag  |dod| fits
    '110' + 24-bit zigzag
    '1110'+ 40-bit zigzag
    '1111'+ 64-bit raw
Values (§4.1.2):
  first value: 64 raw bits
  then xor = bits(v_i) ^ bits(v_{i-1}):
    '0'                    xor == 0
    '10' + meaningful bits if leading>=prev_leading and trailing>=prev_trailing
    '11' + 5-bit leading + 6-bit sig-len + bits otherwise
NaN encodes naturally (its bit pattern XORs like any other), so the
pipeline's NaN-means-missing convention round-trips exactly.

The hot loops are per-chunk Python over numpy int arrays; chunks are
bounded (default 4096 points) so cost is linear and Arrow-batched.
Columnar Parquet remains the physical container: a compressed tier is
a normal DataFrame ``(key, chunk_start_us, n, blob binary)`` that any
TierTable can append/read.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHUNK = 4096

COMPRESSED_SCHEMA = "key string, chunk_start_us long, n int, blob binary"


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def bytes(self) -> bytes:
        if self.nbits:
            return bytes(self.buf) + bytes([(self.acc << (8 - self.nbits)) & 0xFF])
        return bytes(self.buf)


class _BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, bits: int) -> int:
        out = 0
        for _ in range(bits):
            byte = self.data[self.pos >> 3]
            out = (out << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return out


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def _unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def encode_chunk(ts_us: np.ndarray, values: np.ndarray) -> bytes:
    n = len(ts_us)
    assert n >= 1
    w = _BitWriter()
    t0 = int(ts_us[0])
    header = struct.pack("<IqI", n, t0, 0)
    if n > 1:
        # 64-bit first delta: the paper's 14-bit field assumes seconds
        # resolution and sub-4h gaps; micro-resolution tier series can
        # open with multi-day gaps, which overflowed a 32-bit field
        # (caught by the tier round-trip test).
        first_delta = int(ts_us[1]) - t0
        w.write(first_delta & 0xFFFFFFFFFFFFFFFF, 64)
    deltas = np.diff(ts_us.astype(np.int64))
    dods = np.diff(deltas)
    for dod in dods.tolist():
        if dod == 0:
            w.write(0, 1)
        else:
            z = _zigzag(dod)
            if z < (1 << 10):
                w.write(0b10, 2)
                w.write(z, 10)
            elif z < (1 << 24):
                w.write(0b110, 3)
                w.write(z, 24)
            elif z < (1 << 40):
                w.write(0b1110, 4)
                w.write(z, 40)
            else:
                w.write(0b1111, 4)
                w.write(dod & 0xFFFFFFFFFFFFFFFF, 64)
    bits = values.astype(np.float64).view(np.uint64)
    w.write(int(bits[0]), 64)
    prev = int(bits[0])
    prev_lead, prev_sig = 65, 0  # invalid -> force '11' branch first time
    for b in bits[1:].tolist():
        xor = prev ^ int(b)
        if xor == 0:
            w.write(0, 1)
        else:
            lead = 64 - xor.bit_length()
            trail = (xor & -xor).bit_length() - 1
            lead = min(lead, 31)
            sig = 64 - lead - trail
            if prev_lead <= lead and (64 - prev_lead - prev_sig) <= trail and prev_sig:
                w.write(0b10, 2)
                w.write(xor >> (64 - prev_lead - prev_sig), prev_sig)
            else:
                w.write(0b11, 2)
                w.write(lead, 5)
                w.write(sig & 0x3F, 6)  # 64 encodes as 0
                w.write(xor >> trail, sig)
                prev_lead, prev_sig = lead, sig
        prev = int(b)
    return header + w.bytes()


def decode_chunk(blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    n, t0, _ = struct.unpack_from("<IqI", blob, 0)
    r = _BitReader(blob[16:])
    ts = np.empty(n, dtype=np.int64)
    ts[0] = t0
    if n > 1:
        first_delta = r.read(64)
        if first_delta >= 1 << 63:
            first_delta -= 1 << 64
        ts[1] = t0 + first_delta
        delta = first_delta
        for i in range(2, n):
            c = r.read(1)
            if c == 0:
                dod = 0
            else:
                if r.read(1) == 0:
                    dod = _unzigzag(r.read(10))
                elif r.read(1) == 0:
                    dod = _unzigzag(r.read(24))
                elif r.read(1) == 0:
                    dod = _unzigzag(r.read(40))
                else:
                    dod = r.read(64)
                    if dod >= 1 << 63:
                        dod -= 1 << 64
            delta += dod
            ts[i] = ts[i - 1] + delta
    vals = np.empty(n, dtype=np.uint64)
    prev = r.read(64)
    vals[0] = prev
    lead, sig = 0, 0
    for i in range(1, n):
        if r.read(1) == 0:
            vals[i] = prev
        else:
            if r.read(1) == 1:
                lead = r.read(5)
                sig = r.read(6) or 64
            meaningful = r.read(sig)
            prev = prev ^ (meaningful << (64 - lead - sig))
            vals[i] = prev
    return ts, vals.view(np.float64)


# --- DataFrame-level API ----------------------------------------------------


def compress_series(
    df: DataFrame,
    key_col: str = "key",
    ts_col: str = "ts",
    value_col: str = "value",
    flags_col: str | None = None,
    chunk: int = CHUNK,
) -> DataFrame:
    """(key, ts, value[, flags]) -> (key, chunk_start_us, n, blob[, flags]).

    applyInPandas per key; rows inside are sorted and chunked.
    Timestamps+values go into the Gorilla blob; flags (strings — not
    Gorilla material) ride along as one array<string> per chunk, where
    an all-empty chunk stores NULL instead of 4096 empty strings, so
    the common unflagged case costs nothing. Tier storage stays
    lossless: decompress zips them back positionally.
    """
    with_flags = flags_col is not None

    def enc(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        ts = pdf[ts_col].to_numpy(dtype="datetime64[us]").astype(np.int64)
        vals = pdf[value_col].to_numpy(dtype=np.float64)
        fl = pdf[flags_col].tolist() if with_flags else None
        key = pdf[key_col].iloc[0]
        out = []
        for i in range(0, len(ts), chunk):
            t, v = ts[i : i + chunk], vals[i : i + chunk]
            row = [key, int(t[0]), len(t), encode_chunk(t, v)]
            if with_flags:
                chunk_fl = fl[i : i + len(t)]
                row.append(chunk_fl if any(chunk_fl) else None)
            out.append(tuple(row))
        cols = ["key", "chunk_start_us", "n", "blob"] + (
            ["flags"] if with_flags else []
        )
        return pd.DataFrame(out, columns=cols)

    schema = COMPRESSED_SCHEMA + (", flags array<string>" if with_flags else "")
    cols = [key_col, ts_col, value_col] + ([flags_col] if with_flags else [])
    return df.select(*cols).groupBy(key_col).applyInPandas(enc, schema=schema)


def decompress_series(df: DataFrame) -> DataFrame:
    """(key, chunk_start_us, n, blob[, flags]) -> (key, ts, value[, flags])."""
    with_flags = "flags" in df.columns

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            frames = []
            for _, row in b.iterrows():
                ts, vals = decode_chunk(bytes(row["blob"]))
                d = {
                    "key": row["key"],
                    "ts": pd.to_datetime(ts, unit="us"),
                    "value": vals,
                }
                if with_flags:
                    fl = row["flags"]
                    d["flags"] = (
                        list(fl) if fl is not None else [""] * len(ts)
                    )
                frames.append(pd.DataFrame(d))
            if frames:
                yield pd.concat(frames)

    schema = "key string, ts timestamp, value double" + (
        ", flags string" if with_flags else ""
    )
    return df.mapInPandas(dec, schema=schema)
