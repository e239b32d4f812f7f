"""Pure-Python baseline JPEG codec (ITU-T T.81 / JFIF), numpy-backed.

No image library ships in this container, and the graft's payload is an
image+caption pair — so the real lossy path is implemented from the
public spec instead of stubbed: baseline sequential DCT, 8-bit, Huffman
entropy coding, 4:4:4 or 4:2:0 chroma, optional restart intervals.

Reference analogues: the reference crawls image documents as opaque
blobs (``darc/model/web/requests.py:50``) and screenshots
(``darc/crawl.py:333-341``); decoding them is this engine's multimodal
feature stage (SURVEY.md LLM-pipeline ops).

Scope (enough for the crawl pipeline, honest about limits):

* decode: baseline DCT (SOF0), single interleaved scan, 1- or
  3-component, sampling factors up to 2×2, DRI/RSTn. Progressive
  (SOF2), arithmetic coding, and 12-bit are rejected with ValueError.
* encode: quality-scaled Annex-K quantization tables, Annex-K Huffman
  tables, 4:4:4 (default, highest fidelity) or 4:2:0.

The decoder builds its Huffman tables from the FILE's DHT segments (not
from our constants), so it decodes third-party baseline JPEGs, not just
our own output. Hot paths are numpy: DCT/IDCT/quantization as batched
matrix ops over all blocks at once, destuffing as one equality pass,
and Huffman decoding via a flat 2^16-entry LUT over a precomputed
32-bit-window table (a few integer ops per symbol — the round-4
per-bit dict walk was the decode bottleneck). The *encoder's* entropy
loop remains per-symbol Python (encode is not on the crawl hot path);
the Spark side always wraps both in Arrow-batched ``mapInPandas``.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Constants from the public spec (ITU-T T.81 Annex K)

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
UNZIGZAG = np.argsort(ZIGZAG)

# K.1 / K.2 base quantization tables (quality 50), row-major
QT_LUMA = np.array(
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
QT_CHROMA = np.array(
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

# K.3 Huffman table specifications: (BITS[1..16], HUFFVAL)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
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
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
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

# orthonormal 8×8 DCT-II matrix: DCT = C @ block @ C.T
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16.0) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )


def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling of a base table (public libjpeg convention)."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * s + 50) // 100, 1, 255).astype(np.int64)


# ---------------------------------------------------------------------------
# Huffman code construction (canonical, from BITS/HUFFVAL — spec C.2)

def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _Lut(list):
    """The decode LUT as a plain list (fastest to index from the Python
    per-symbol loop) carrying its uint16 ndarray twin for the optional
    native scan decoder (:mod:`darc_spark.functions.jpeg_native`)."""

    __slots__ = ("np", "key")


_LUT_CACHE: dict[tuple, "_Lut"] = {}
_PACK_CACHE: dict[tuple, np.ndarray] = {}


def _build_lut(
    bits: list[int], vals: list[int], ac: bool, progressive: bool = False
) -> "_Lut":
    """Flat decode table over the next 16 bits of the stream.

    Canonical Huffman (spec C.2) means every code is the prefix of a
    contiguous range of 16-bit values, so one table index replaces the
    round-4 bit-at-a-time dict walk (the decoder's bottleneck). Entry 0
    marks an invalid code. Two entry shapes:

    * ``0x8000 | (code_len + size) << 8 | symbol`` — COMBINED: the
      symbol's magnitude bits also fit in the same 16-bit peek, so one
      window fetch yields symbol AND value (``size`` = low nibble for
      AC, the symbol itself for DC). This is the common path.
    * ``code_len << 8 | symbol`` — plain; the value bits (if any) need
      their own read. Used for EOB/ZRL and for long code+size combos.

    ``progressive=True`` additionally admits the EOBn symbols
    (run>0, size 0) that only exist in progressive AC tables — packed
    as PLAIN entries, since their extra bits count is the run length,
    not a magnitude size. Baseline tables keep rejecting them.

    Returned as a plain Python list — list indexing with Python ints is
    several times faster than numpy scalar indexing in the per-symbol
    loop — and cached: a corpus reuses the same DHT tables across
    files, so the 2^16-entry build cost amortizes inside a batch."""
    key = (tuple(bits), tuple(vals), ac, progressive)
    hit = _LUT_CACHE.get(key)
    if hit is not None:
        return hit
    lut = np.zeros(1 << 16, dtype=np.uint16)
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            sym = vals[k]
            size = (sym & 0x0F) if ac else sym
            if (not ac and sym > 15) or (
                ac
                and size == 0
                and sym not in (0x00, 0xF0)
                and not (progressive and sym & 0x0F == 0)
            ):
                # spec-invalid symbols (DC size category >15, or an AC
                # run/size with size 0 that isn't EOB/ZRL — F.1.2):
                # leave the range as entry 0 so BOTH scan decoders
                # reject them as "invalid Huffman code" instead of the
                # Python path dying on a negative shift and the C path
                # hitting shift UB
                code += 1
                k += 1
                continue
            special = ac and (sym in (0x00, 0xF0) or size == 0)
            if size and not special and length + size <= 16:
                entry = 0x8000 | ((length + size) << 8) | sym
            else:
                entry = (length << 8) | sym
            lo = code << (16 - length)
            lut[lo : lo + (1 << (16 - length))] = entry
            code += 1
            k += 1
        code <<= 1
    out = _Lut(lut.tolist())
    out.np = lut
    out.key = key  # content key — _PACK_CACHE must never key on id()
    if len(_LUT_CACHE) > 64:  # bound worst-case adversarial-corpus growth
        _LUT_CACHE.clear()
        _PACK_CACHE.clear()
    _LUT_CACHE[key] = out
    return out


# ---------------------------------------------------------------------------
# Bit I/O with 0xFF stuffing

class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits (spec F.1.2.3)
        return bytes(self.buf)


def _destuff_segments(data: bytes, pos: int) -> list[np.ndarray]:
    """Split the entropy-coded scan into restart segments with 0xFF00
    byte stuffing removed: one numpy equality pass finds the (rare)
    0xFF positions, then a Python walk over only those classifies each
    as stuffing (keep the 0xFF, drop the 0x00), a RSTn boundary (new
    segment), or a terminating marker (EOI / anything else)."""
    raw = np.frombuffer(data, dtype=np.uint8, count=len(data) - pos, offset=pos)
    segments: list[list[tuple[int, int]]] = []
    cur: list[tuple[int, int]] = []
    start = 0
    ended = False
    for i in np.flatnonzero(raw == 0xFF).tolist():
        if i < start:
            continue
        nxt = int(raw[i + 1]) if i + 1 < raw.size else -1
        if nxt == 0x00:
            cur.append((start, i + 1))
            start = i + 2
        elif 0xD0 <= nxt <= 0xD7:
            cur.append((start, i))
            segments.append(cur)
            cur = []
            start = i + 2
        else:
            cur.append((start, i))
            segments.append(cur)
            ended = True
            break
    if not ended:
        cur.append((start, raw.size))
        segments.append(cur)
    return [
        np.concatenate([raw[a:b] for a, b in seg])
        if seg
        else np.zeros(0, np.uint8)
        for seg in segments
    ]


class _ScanReader:
    """Bit reader over one destuffed restart segment.

    ``w32[i]`` is the big-endian 32-bit window starting at byte ``i``
    (built in one vectorized pass), so peeking the next 16 bits is a
    single index + shift and a Huffman symbol is one flat-LUT probe —
    a few integer ops per symbol instead of per-bit dict walks."""

    __slots__ = ("w32", "nbits", "p")

    def __init__(self, seg: np.ndarray) -> None:
        # 0xFF padding past the end: spec pad bits are 1s, and any decode
        # that walks into it either finishes a legal final EOB inside the
        # last real byte or overruns nbits and raises. The pad is sized
        # for a WHOLE worst-case garbage block — 64 coefficients × (16-bit
        # code + 15-bit magnitude) = 1984 bits = 248 bytes: the overrun
        # check runs once per block, not per symbol, so the window index
        # must stay in range until it fires.
        pad = np.concatenate([seg, np.full(256, 0xFF, np.uint8)]).astype(
            np.uint32
        )
        # plain list: indexed once or twice per symbol with Python ints,
        # where a numpy scalar index would dominate the loop
        self.w32: list[int] = (
            (pad[:-3] << 24) | (pad[1:-2] << 16) | (pad[2:-1] << 8) | pad[3:]
        ).tolist()
        self.nbits = int(seg.size) * 8
        self.p = 0


def _extend(v: int, size: int) -> int:
    """Spec F.2.2.1 EXTEND: map `size` raw bits to the signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


# ---------------------------------------------------------------------------
# Encoder

def _prepare_blocks(
    arr: np.ndarray, quality: int, subsample: bool
) -> tuple[list, list, np.ndarray, np.ndarray, int, int]:
    """Shared encoder front-end (baseline and progressive): color
    convert, optional 4:2:0 chroma subsample, pad, batched DCT,
    quantize, zigzag. Returns (comp_blocks[ci][by][bx] → 64 zigzag
    coefs, samp, qt_l, qt_c, mcus_x, mcus_y)."""
    assert arr.ndim == 3 and arr.shape[2] == 3 and arr.dtype == np.uint8
    h, w = arr.shape[:2]
    rgb = arr.astype(np.float64)
    y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    cb = -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2] + 128.0
    cr = 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2] + 128.0

    qt_l = _quality_scale(QT_LUMA, quality)
    qt_c = _quality_scale(QT_CHROMA, quality)

    if subsample:
        # 2×2 box-average chroma (4:2:0)
        ch = _pad_to(cb, 2)
        cb_s = (ch[0::2, 0::2] + ch[0::2, 1::2] + ch[1::2, 0::2] + ch[1::2, 1::2]) / 4.0
        ch = _pad_to(cr, 2)
        cr_s = (ch[0::2, 0::2] + ch[0::2, 1::2] + ch[1::2, 0::2] + ch[1::2, 1::2]) / 4.0
        samp = [(2, 2), (1, 1), (1, 1)]
        planes = [y, cb_s, cr_s]
    else:
        samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h

    # per-component quantized zigzag blocks, indexed [comp][by][bx]
    comp_blocks = []
    for ci, plane in enumerate(planes):
        sh, sv = samp[ci]
        need_w, need_h = mcus_x * 8 * sh, mcus_y * 8 * sv
        p = _pad_edge(plane, need_h, need_w) - 128.0
        qt = qt_l if ci == 0 else qt_c
        nby, nbx = need_h // 8, need_w // 8
        blocks = p.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3)
        coef = _C @ blocks @ _C.T  # batched DCT: BLAS matmul beats einsum
        q = np.round(coef / qt.reshape(8, 8)).astype(np.int64)
        comp_blocks.append(q.reshape(nby, nbx, 64)[:, :, ZIGZAG])
    return comp_blocks, samp, qt_l, qt_c, mcus_x, mcus_y


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 92,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """RGB8 HxWx3 → baseline JFIF JPEG bytes.

    ``subsample=True`` emits 4:2:0 chroma (the common web shape);
    default 4:4:4 maximizes fidelity for the PSNR≥40dB invariant.
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    that many MCUs (resync points, like real encoders targeting error
    resilience). Deterministic: same inputs → identical bytes.
    """
    comp_blocks, samp, qt_l, qt_c, mcus_x, mcus_y = _prepare_blocks(
        arr, quality, subsample
    )
    h, w = arr.shape[:2]

    enc_dc = [_build_codes(DC_LUMA_BITS, DC_LUMA_VALS)] + [
        _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ] * 2
    enc_ac = [_build_codes(AC_LUMA_BITS, AC_LUMA_VALS)] + [
        _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    ] * 2

    bw = _BitWriter()
    pred = [0, 0, 0]
    scan_parts: list[bytes] = []
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
            ):
                scan_parts.append(bw.flush())
                scan_parts.append(
                    bytes([0xFF, 0xD0 + ((mcu_count // restart_interval - 1) % 8)])
                )
                bw = _BitWriter()
                pred = [0, 0, 0]
            for ci in range(3):
                sh, sv = samp[ci]
                for by in range(sv):
                    for bx in range(sh):
                        zz = comp_blocks[ci][my * sv + by, mx * sh + bx]
                        pred[ci] = _encode_block(
                            bw, zz, pred[ci], enc_dc[ci], enc_ac[ci]
                        )
            mcu_count += 1
    scan_parts.append(bw.flush())
    scan = b"".join(scan_parts)

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")  # APP0
    out += _seg(0xDB, bytes([0]) + bytes(qt_l[ZIGZAG].tolist()))
    out += _seg(0xDB, bytes([1]) + bytes(qt_c[ZIGZAG].tolist()))
    sof = bytearray(struct.pack(">BHHB", 8, h, w, 3))
    for ci in range(3):
        sh, sv = samp[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += _seg(0xC0, bytes(sof))  # SOF0 baseline
    out += _seg(0xC4, bytes([0x00] + DC_LUMA_BITS) + bytes(DC_LUMA_VALS))
    out += _seg(0xC4, bytes([0x10] + AC_LUMA_BITS) + bytes(AC_LUMA_VALS))
    out += _seg(0xC4, bytes([0x01] + DC_CHROMA_BITS) + bytes(DC_CHROMA_VALS))
    out += _seg(0xC4, bytes([0x11] + AC_CHROMA_BITS) + bytes(AC_CHROMA_VALS))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytearray([3])
    for ci in range(3):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, bytes(sos))
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _pad_to(a: np.ndarray, mult: int) -> np.ndarray:
    h, w = a.shape
    return _pad_edge(a, ((h + mult - 1) // mult) * mult, ((w + mult - 1) // mult) * mult)


def _pad_edge(a: np.ndarray, need_h: int, need_w: int) -> np.ndarray:
    h, w = a.shape
    if need_h == h and need_w == w:
        return a
    return np.pad(a, ((0, need_h - h), (0, need_w - w)), mode="edge")


def _encode_block(bw, zz, pred, dc_tab, ac_tab) -> int:
    dc = int(zz[0])
    diff = dc - pred
    size = _category(diff)
    code, ln = dc_tab[size]
    bw.write(code, ln)
    if size:
        bw.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, ln = ac_tab[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        size = _category(v)
        code, ln = ac_tab[(run << 4) | size]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz != 63:
        code, ln = ac_tab[0x00]  # EOB
        bw.write(code, ln)
    return dc


# ---------------------------------------------------------------------------
# Decoder

def decode_jpeg_py(data: bytes) -> np.ndarray:
    """JFIF JPEG bytes → RGB8 HxWx3 (grayscale → replicated).

    Baseline (SOF0/1) decoded here; progressive (SOF2) dispatches to
    :mod:`darc_spark.functions.jpeg_progressive`. Tables come from the
    file's own DQT/DHT segments; lossless/arithmetic/12-bit streams are
    rejected with ValueError. Any malformed stream — truncated header,
    missing DHT/DQT slot, garbage entropy data — raises ValueError too
    (never a raw IndexError/KeyError/struct.error out of a Spark decode
    batch).
    """
    try:
        return _decode_jpeg_inner(data)
    except ValueError:
        raise
    except (IndexError, KeyError, struct.error) as exc:
        raise ValueError(
            f"malformed JPEG: {type(exc).__name__}: {exc}"
        ) from exc


def _decode_jpeg_inner(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], np.ndarray] = {}  # (tc, th) → flat LUT
    frame = None
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack_from(">H", data, pos)
        payload = data[pos + 2 : pos + seg_len]
        pos += seg_len
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                p += 1
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.frombuffer(payload, dtype=np.uint8, count=64, offset=p)
                qts[tq] = tbl.astype(np.int64)[UNZIGZAG]
                p += 64
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0x0F
                p += 1
                bits = list(payload[p : p + 16])
                p += 16
                n = sum(bits)
                vals = list(payload[p : p + n])
                p += n
                huff[(tc, th)] = _build_lut(bits, vals, tc == 1)
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, fh, fw, nc = struct.unpack_from(">BHHB", payload)
            if prec != 8:
                raise ValueError("only 8-bit baseline supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = payload[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker == 0xC2:  # SOF2 — progressive DCT
            from darc_spark.functions import jpeg_progressive

            return jpeg_progressive.decode_progressive(data)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG (lossless/arithmetic)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", payload)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = payload[0]
            if ns != len(frame["comps"]):
                # legal baseline can split components across scans; this
                # decoder supports the single interleaved scan only —
                # reject per the documented ValueError contract instead
                # of KeyError-ing mid-MCU
                raise ValueError(
                    "non-interleaved multi-scan JPEG unsupported "
                    f"(scan has {ns} of {len(frame['comps'])} components)"
                )
            scan_tabs = {}
            for i in range(ns):
                cs, tdta = payload[1 + 2 * i], payload[2 + 2 * i]
                scan_tabs[cs] = (tdta >> 4, tdta & 0x0F)
            return _decode_scan(
                data, pos, frame, scan_tabs, qts, huff, restart_interval
            )
    raise ValueError("no scan data found")


def _decode_scan(data, pos, frame, scan_tabs, qts, huff, restart_interval):
    comps = frame["comps"]
    fh, fw = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = (fw + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (fh + 8 * vmax - 1) // (8 * vmax)

    # entropy decode appends (flat coefficient index, value) pairs into
    # ONE shared pair of Python lists — component offsets are baked into
    # the flat index, so a SINGLE vectorized scatter builds every
    # component's zigzag array at once, and the IDCT runs once per
    # component as a batched matmul over all blocks (per-element numpy
    # writes and per-block views were half the round-4 decode cost)
    shapes = [(mcus_y * c["v"], mcus_x * c["h"]) for c in comps]
    offsets = []
    total = 0
    for nby, nbx in shapes:
        offsets.append(total)
        total += nby * nbx * 64
    # per-component constants hoisted out of the MCU loop (the dict
    # probes per MCU were measurable at megapixel block counts)
    comp_meta = []
    for ci, c in enumerate(comps):
        td, ta = scan_tabs[c["id"]]
        comp_meta.append(
            (
                ci,
                huff[(0, td)],
                huff[(1, ta)],
                c["v"],
                c["h"],
                shapes[ci][1],
                offsets[ci],
            )
        )

    seg_list = _destuff_segments(data, pos)

    from darc_spark.functions import jpeg_native

    if jpeg_native.available() and len(comps) <= 8:
        # native fast path: the same scan loop compiled to C — the
        # pure-Python loop below is the reference implementation and
        # the differential tests pin both to identical output
        # keyed by LUT CONTENT, not id(): a _Lut evicted from _LUT_CACHE
        # mid-batch can be freed and its address reused by a different
        # table, which would silently serve the wrong concatenated LUTs
        pack_key = tuple(
            t.key for m in comp_meta for t in (m[1], m[2])
        )
        luts = _PACK_CACHE.get(pack_key)
        if luts is None:
            luts = np.concatenate(
                [m[j].np for m in comp_meta for j in (1, 2)]
            )
            _PACK_CACHE[pack_key] = luts
        flat = jpeg_native.decode_scan(
            seg_list,
            luts,
            np.array([c["v"] for c in comps], dtype=np.int32),
            np.array([c["h"] for c in comps], dtype=np.int32),
            np.array([s[1] for s in shapes], dtype=np.int32),
            np.array(offsets, dtype=np.int64),
            total,
            mcus_y,
            mcus_x,
            restart_interval,
        ).astype(np.int64)
    else:
        idxs: list[int] = []
        vals: list[int] = []
        segs = iter(seg_list)
        r = _ScanReader(next(segs))
        pred = [0] * len(comps)
        mcu_count = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if (
                    restart_interval
                    and mcu_count
                    and mcu_count % restart_interval == 0
                ):
                    try:
                        r = _ScanReader(next(segs))
                    except StopIteration:
                        raise ValueError("expected restart marker") from None
                    pred = [0] * len(comps)
                for ci, dc_tab, ac_tab, cv, ch, nbx, off in comp_meta:
                    for by in range(cv):
                        row = (my * cv + by) * nbx + mx * ch
                        for bx in range(ch):
                            pred[ci] = _decode_block(
                                r, dc_tab, ac_tab, pred[ci],
                                off + (row + bx) * 64, idxs, vals,
                            )
                mcu_count += 1

        # one scatter for all components, then per component:
        # dequantize + unzigzag + batched IDCT + upsample + crop
        flat = np.zeros(total, dtype=np.int64)
        flat[np.asarray(idxs, dtype=np.int64)] = np.asarray(
            vals, dtype=np.int64
        )
    return _reconstruct(flat, frame, qts, shapes, offsets)


def _reconstruct(flat, frame, qts, shapes, offsets) -> np.ndarray:
    """Shared reconstruction tail (baseline and progressive): dequantize
    + unzigzag + batched IDCT + chroma upsample + color convert."""
    comps = frame["comps"]
    fh, fw = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    full = []
    for ci, c in enumerate(comps):
        qt = qts[c["tq"]]
        nby, nbx = shapes[ci]
        zz = flat[offsets[ci] : offsets[ci] + nby * nbx * 64].reshape(
            nby, nbx, 64
        )
        coef = (zz[:, :, UNZIGZAG] * qt).reshape(
            nby, nbx, 8, 8
        ).astype(np.float64)
        blocks = _C.T @ coef @ _C  # batched IDCT: BLAS matmul beats einsum
        nby, nbx = blocks.shape[:2]
        p = blocks.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:fh, :fw])
    if len(comps) == 1:
        g = np.clip(full[0] + 128.0, 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    y, cb, cr = full[0] + 128.0, full[1], full[2]
    r_ = y + 1.402 * cr
    g_ = y - 0.344136 * cb - 0.714136 * cr
    b_ = y + 1.772 * cb
    return np.clip(np.stack([r_, g_, b_], axis=-1), 0, 255).astype(np.uint8)


def _decode_block(r, dc_tab, ac_tab, pred, base, idxs, vals):
    """Entropy-decode one block, appending (flat index, value) pairs —
    ``base`` is the block's offset into the component's flat zigzag
    coefficient array; a single vectorized scatter materializes all
    blocks afterwards. Returns the new DC predictor.

    The bit reads are INLINED (window peek + LUT probe + EXTEND as raw
    int arithmetic on the reader's state): at ~100 symbols per block the
    method-call overhead of a per-symbol reader API was the single
    largest decode cost after the old per-bit dict walk was removed.
    Combined LUT entries (flag 0x8000) deliver symbol AND magnitude
    bits from ONE 16-bit peek; the stream-overrun check runs once per
    block (the reader's pad keeps the window index safe meanwhile)."""
    w32, p = r.w32, r.p
    ap, vp = idxs.append, vals.append
    peek = (w32[p >> 3] >> (16 - (p & 7))) & 0xFFFF
    e = dc_tab[peek]
    if e == 0:
        raise ValueError("invalid Huffman code")
    size = e & 0xFF
    if e & 0x8000:  # combined: value bits inside the same peek
        total = (e >> 8) & 0x7F
        v = (peek >> (16 - total)) & ((1 << size) - 1)
        p += total
        diff = v if v >= 1 << (size - 1) else v - (1 << size) + 1  # EXTEND
    elif size:
        p += e >> 8
        v = ((w32[p >> 3] >> (16 - (p & 7))) >> (16 - size)) & ((1 << size) - 1)
        p += size
        diff = v if v >= 1 << (size - 1) else v - (1 << size) + 1
    else:
        p += e >> 8
        diff = 0
    dc = pred + diff
    ap(base)
    vp(dc)
    k = 1
    while k < 64:
        peek = (w32[p >> 3] >> (16 - (p & 7))) & 0xFFFF
        e = ac_tab[peek]
        if e == 0:
            raise ValueError("invalid Huffman code")
        sym = e & 0xFF
        if e & 0x8000:  # combined run/size + value (the common path)
            size = sym & 0x0F
            k += sym >> 4
            if k > 63:
                raise ValueError("AC run past block end")
            total = (e >> 8) & 0x7F
            v = (peek >> (16 - total)) & ((1 << size) - 1)
            p += total
            ap(base + k)
            vp(v if v >= 1 << (size - 1) else v - (1 << size) + 1)
            k += 1
            continue
        p += e >> 8
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            k += 16
            continue
        size = sym & 0x0F
        k += sym >> 4
        if k > 63:
            raise ValueError("AC run past block end")
        v = ((w32[p >> 3] >> (16 - (p & 7))) >> (16 - size)) & ((1 << size) - 1)
        p += size
        ap(base + k)
        vp(v if v >= 1 << (size - 1) else v - (1 << size) + 1)
        k += 1
    if p > r.nbits:
        raise ValueError("truncated scan")
    r.p = p
    return dc
