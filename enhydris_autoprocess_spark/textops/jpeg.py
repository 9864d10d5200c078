"""Dependency-free baseline JPEG codec (stdlib + numpy only).

VERDICT r02-r04 carried "JPEG decode" as the one environment-blocked
multimodal gap (no PIL/cv2/ffmpeg in the container). This module closes
it for baseline JPEG: a spec-correct decoder for the files that
dominate real corpora — baseline sequential DCT (SOF0), 8-bit,
grayscale or YCbCr with 4:4:4 / 4:2:2 / 4:2:0 subsampling, restart
markers — plus a matching encoder for fixtures, mirroring how
``make_ppm`` / ``make_png`` / ``make_wav`` pin the other decoders.

Everything here derives from the public JPEG specification (ITU-T T.81
/ ISO 10918-1): Annex K's example quantization + Huffman tables, the
zigzag order, the DC-difference / AC run-length entropy model, and the
JFIF YCbCr (BT.601) color transform. Progressive (SOF2), arithmetic
coding, and 12-bit precision are declared unsupported and raise.

Design notes:
- The entropy scan is decoded symbol-by-symbol in Python (inherently
  sequential), but everything after it — dequantize, IDCT, level
  shift, upsample, color transform — is one numpy einsum/broadcast
  pass over ALL blocks of a component at once.
- The IDCT is the exact separable orthonormal DCT-III: X = C.T @ B @ C
  with C[k,n] = a(k) cos((2n+1) k pi / 16) — bit-stable across runs,
  which the determinism tests pin.
"""

from __future__ import annotations

import struct

import numpy as np

# --- constant tables (ITU-T T.81 Annex K, public) ----------------------------

# zigzag scan order: ZIGZAG[i] = row-major index of the i-th coefficient
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
_UNZIGZAG = np.argsort(ZIGZAG)

_QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
_QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# standard Huffman specs: (BITS counts per code length 1..16, values)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# orthonormal 8x8 DCT-II matrix (forward: C @ B @ C.T)
_K = np.arange(8)
_DCT = np.cos((2 * _K[None, :] + 1) * _K[:, None] * np.pi / 16) * 0.5
_DCT[0, :] = 1.0 / np.sqrt(8.0)


def _canonical_codes(bits: list[int], values: list[int]):
    """(symbol -> (code, length)) canonical Huffman assignment per the
    spec's Annex C code-generation procedure."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    vi = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[vi]] = (code, length)
            code += 1
            vi += 1
        code <<= 1
    return out


def _decode_map(bits: list[int], values: list[int]):
    """((length, code) -> symbol) for the bit-serial decoder."""
    return {
        (length, code): sym
        for sym, (code, length) in _canonical_codes(bits, values).items()
    }


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """Annex-K tables scaled by the common IJG quality curve."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (_QUANT_LUMA, _QUANT_CHROMA):
        q = (base * scale + 50) // 100
        out.append(np.clip(q, 1, 255).astype(np.int64))
    return out[0], out[1]


def _magnitude(v: int) -> tuple[int, int]:
    """(category size, offset bits) of a DC diff / AC coefficient."""
    a = abs(v)
    size = int(a).bit_length()
    bits = v if v >= 0 else v + (1 << size) - 1
    return size, bits


class _BitWriter:
    def __init__(self) -> None:
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.bytes.append(b)
            if b == 0xFF:  # byte stuffing
                self.bytes.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-pad to byte boundary


class _BitReader:
    """Bit-serial reader over byte-DEstuffed scan data."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                # spec allows the final bits to be padding; missing
                # bits read as 1s (the standard pad)
                self.acc = (self.acc << 8) | 0xFF
            else:
                self.acc = (self.acc << 8) | self.data[self.pos]
                self.pos += 1
            self.nbits += 8
        out = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return out

    def read_symbol(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG scan")


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# --- encoder -----------------------------------------------------------------


def _blockify(plane: np.ndarray) -> np.ndarray:
    """(H, W) float, H/W multiples of 8 -> (n_blocks, 8, 8) row-major
    block order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _pad_to(img: np.ndarray, mh: int, mw: int) -> np.ndarray:
    """Edge-replicate to multiples of (mh, mw)."""
    h, w = img.shape
    ph = (-h) % mh
    pw = (-w) % mw
    if ph or pw:
        img = np.pad(img, ((0, ph), (0, pw)), mode="edge")
    return img


def _encode_component_blocks(
    blocks: np.ndarray, qtab: np.ndarray
) -> np.ndarray:
    """DCT + quantize all blocks at once -> (n, 64) int zigzag coeffs."""
    coef = np.einsum("ij,njk,lk->nil", _DCT, blocks - 128.0, _DCT)
    q = np.round(coef.reshape(-1, 64) / qtab[None, :].astype(np.float64))
    return q.astype(np.int64)[:, ZIGZAG]


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 75,
    subsample: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode (h, w, 3) RGB or (h, w) grayscale uint8 -> baseline JFIF
    JPEG bytes. ``subsample``: "444", "422", or "420" (ignored for
    grayscale). ``restart_interval``: MCUs between RSTn markers (0 =
    none) — exists so the decoder's restart path has fixtures."""
    pixels = np.asarray(pixels)
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")

    if gray:
        planes = [pixels.astype(np.float64)]
        samp = [(1, 1)]
    else:
        p = pixels.astype(np.float64)
        r, g, b = p[..., 0], p[..., 1], p[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        hs, vs = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}[subsample]
        samp = [(hs, vs), (1, 1), (1, 1)]
        planes = [y]
        for c in (cb, cr):
            if hs == 2 or vs == 2:
                cpad = _pad_to(c, vs, hs)
                c = cpad.reshape(
                    cpad.shape[0] // vs, vs, cpad.shape[1] // hs, hs
                ).mean(axis=(1, 3))
            planes.append(c)

    qy, qc = _quality_tables(quality)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)

    # per-component zigzag block arrays, in MCU-interleaved order
    comp_blocks = []
    mcus_x = mcus_y = None
    for ci, (plane, (hs, vs)) in enumerate(zip(planes, samp)):
        plane = _pad_to(plane, 8 * vs if ci == 0 else 8, 8 * hs if ci == 0 else 8)
        # every component must cover the same MCU grid
        if ci == 0:
            mcus_x = plane.shape[1] // (8 * hs)
            mcus_y = plane.shape[0] // (8 * vs)
        need_h = mcus_y * 8 * vs
        need_w = mcus_x * 8 * hs
        plane = _pad_to(plane, need_h, need_w)[:need_h, :need_w]
        qtab = qy if ci == 0 else qc
        zz = _encode_component_blocks(_blockify(plane), qtab)
        comp_blocks.append(zz.reshape(mcus_y * vs, mcus_x * hs, 64))

    dc_tabs = [
        _canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS),
        _canonical_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS),
    ]
    ac_tabs = [
        _canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS),
        _canonical_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS),
    ]

    writer = _BitWriter()
    pred = [0] * len(planes)
    scan = bytearray()
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                writer.flush()
                scan += writer.bytes
                scan += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                writer = _BitWriter()
                pred = [0] * len(planes)
            for ci, (hs, vs) in enumerate(samp):
                ti = 0 if ci == 0 else 1
                dct_t, act_t = dc_tabs[ti], ac_tabs[ti]
                for by in range(vs):
                    for bx in range(hs):
                        blk = comp_blocks[ci][my * vs + by, mx * hs + bx]
                        diff = int(blk[0]) - pred[ci]
                        pred[ci] = int(blk[0])
                        size, bits = _magnitude(diff)
                        code, length = dct_t[size]
                        writer.write(code, length)
                        if size:
                            writer.write(bits, size)
                        run = 0
                        last_nz = int(np.max(np.nonzero(blk)[0])) if np.any(blk[1:]) else 0
                        for k in range(1, 64):
                            v = int(blk[k])
                            if v == 0:
                                run += 1
                                continue
                            while run >= 16:
                                code, length = act_t[0xF0]  # ZRL
                                writer.write(code, length)
                                run -= 16
                            size, bits = _magnitude(v)
                            code, length = act_t[(run << 4) | size]
                            writer.write(code, length)
                            writer.write(bits, size)
                            run = 0
                            if k == last_nz:
                                break
                        if last_nz < 63:
                            code, length = act_t[0x00]  # EOB
                            writer.write(code, length)
            mcu_count += 1
    writer.flush()
    scan += writer.bytes

    # --- assemble segments ---
    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, bytes([0]) + bytes(qy[ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(0xFFDB, bytes([1]) + bytes(qc[ZIGZAG].astype(np.uint8)))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        hs, vs = samp[ci]
        sof += bytes([ci + 1, (hs << 4) | vs, 0 if ci == 0 else 1])
    out += seg(0xFFC0, sof)  # SOF0 baseline
    for tc_th, bits, vals in (
        ((0 << 4) | 0, _DC_LUMA_BITS, _DC_LUMA_VALS),
        ((1 << 4) | 0, _AC_LUMA_BITS, _AC_LUMA_VALS),
        ((0 << 4) | 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
        ((1 << 4) | 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
    ):
        if gray and (tc_th & 0x0F) == 1:
            continue
        out += seg(0xFFC4, bytes([tc_th]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        ti = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (ti << 4) | ti])
    sos += bytes([0, 63, 0])
    out += seg(0xFFDA, sos)
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder -----------------------------------------------------------------


def _destuff(data: bytes) -> tuple[list[bytes], int]:
    """Split the entropy scan into restart intervals with 0xFF00
    stuffing removed; returns (intervals, bytes consumed incl. the
    terminating marker's 0xFF)."""
    intervals: list[bytes] = []
    cur = bytearray()
    pos = 0
    while pos < len(data):
        b = data[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        nxt = data[pos + 1] if pos + 1 < len(data) else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            pos += 2
        elif 0xD0 <= nxt <= 0xD7:  # RSTn
            intervals.append(bytes(cur))
            cur = bytearray()
            pos += 2
        else:  # real marker ends the scan
            break
    intervals.append(bytes(cur))
    return intervals, pos


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG -> (h, w, 3) uint8 RGB (grayscale replicated).

    Supports SOF0 (baseline sequential), 8-bit, 1 or 3 components,
    sampling factors up to 2x2 (4:4:4 / 4:2:2 / 4:2:0 and their
    transposes), DRI/RSTn restart markers. Progressive (SOF2),
    arithmetic coding (SOF9+), and 12-bit raise NotImplementedError.
    """
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decode map
    sof = None
    restart_interval = 0
    comps: list[tuple[int, int, int, int]] = []  # id, hs, vs, qid
    scan_comps: list[tuple[int, int, int]] = []  # comp index, dc id, ac id
    scan_data = None

    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad a marker;
        # skip them so the byte after the LAST 0xFF is read as the marker
        while pos + 2 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        (length,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + length]
        if marker == 0xDB:  # DQT (may hold several tables)
            bp = 0
            while bp < len(body):
                pq, tq = body[bp] >> 4, body[bp] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                zz = np.frombuffer(body, np.uint8, 64, bp + 1).astype(np.int64)
                qtabs[tq] = zz[_UNZIGZAG]
                bp += 65
        elif marker == 0xC4:  # DHT (may hold several tables)
            bp = 0
            while bp < len(body):
                tc, th = body[bp] >> 4, body[bp] & 0x0F
                bits = list(body[bp + 1 : bp + 17])
                n = sum(bits)
                vals = list(body[bp + 17 : bp + 17 + n])
                huff[(tc, th)] = _decode_map(bits, vals)
                bp += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # baseline / ext. sequential
            precision, fh, fw, nc = struct.unpack_from(">BHHB", body, 0)
            if precision != 8:
                raise NotImplementedError(f"{precision}-bit JPEG")
            sof = (fh, fw, nc)
            for ci in range(nc):
                cid, hv, qid = body[6 + ci * 3 : 9 + ci * 3]
                comps.append((cid, hv >> 4, hv & 0x0F, qid))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"only baseline sequential JPEG supported (SOF {marker:#x})"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            ns = body[0]
            # legal baseline variants this decoder does not model: a
            # second SOS would silently overwrite scan_data while
            # scan_comps kept accumulating, decoding garbage
            if scan_data is not None:
                raise NotImplementedError(
                    "multi-scan baseline JPEG not supported"
                )
            if ns != len(comps):
                raise NotImplementedError(
                    "non-interleaved (partial-component scan) baseline "
                    "JPEG not supported"
                )
            for si in range(ns):
                cid, tt = body[1 + si * 2 : 3 + si * 2]
                idx = next(i for i, c in enumerate(comps) if c[0] == cid)
                scan_comps.append((idx, tt >> 4, tt & 0x0F))
            scan_start = pos + 2 + length
            intervals, used = _destuff(payload[scan_start:])
            scan_data = intervals
            pos = scan_start + used
            continue
        pos += 2 + length

    if sof is None or scan_data is None:
        raise ValueError("missing SOF/SOS segment")
    fh, fw, nc = sof
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))

    # entropy-decode every MCU into per-component (rows, cols, 64) ints
    comp_zz = [
        np.zeros((mcus_y * c[2], mcus_x * c[1], 64), dtype=np.int64)
        for c in comps
    ]
    n_mcus = mcus_x * mcus_y
    mcu_i = 0
    for interval in scan_data:
        reader = _BitReader(interval)
        pred = [0] * len(comps)
        limit = (
            min(mcu_i + restart_interval, n_mcus) if restart_interval else n_mcus
        )
        while mcu_i < limit:
            my, mx = divmod(mcu_i, mcus_x)
            for idx, dc_id, ac_id in scan_comps:
                _, hs, vs, _ = comps[idx]
                dct = huff[(0, dc_id)]
                act = huff[(1, ac_id)]
                for by in range(vs):
                    for bx in range(hs):
                        blk = comp_zz[idx][my * vs + by, mx * hs + bx]
                        size = reader.read_symbol(dct)
                        diff = _extend(reader.read(size), size) if size else 0
                        pred[idx] += diff
                        blk[0] = pred[idx]
                        k = 1
                        while k < 64:
                            rs = reader.read_symbol(act)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            blk[k] = _extend(reader.read(s), s)
                            k += 1
            mcu_i += 1
        if mcu_i >= n_mcus:
            break
    if mcu_i < n_mcus:
        raise ValueError("truncated JPEG scan")

    # dequantize + IDCT + reassemble, one vector pass per component
    planes = []
    for (cid, hs, vs, qid), zz in zip(comps, comp_zz):
        rows, cols = zz.shape[:2]
        coefs = (zz.reshape(-1, 64) * qtabs[qid][ZIGZAG][None, :])[
            :, _UNZIGZAG
        ].reshape(-1, 8, 8).astype(np.float64)
        spatial = np.einsum("ji,njk,kl->nil", _DCT, coefs, _DCT) + 128.0
        plane = (
            spatial.reshape(rows, cols, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(rows * 8, cols * 8)
        )
        # upsample to full MCU-grid resolution, then crop to frame
        if hs < hmax or vs < vmax:
            plane = np.repeat(np.repeat(plane, vmax // vs, 0), hmax // hs, 1)
        planes.append(plane[:fh, :fw])

    if nc == 1:
        gray = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(gray[..., None], 3, axis=2)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(
        np.uint8
    )
