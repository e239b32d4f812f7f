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
our own output. Hot loops are numpy where the data is block-shaped
(DCT/IDCT/quantization as matrix ops); the entropy coder is per-symbol
Python — fine for the ≤128px payloads of this corpus, and the Spark
side always wraps it in Arrow-batched ``mapInPandas``.
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


def _build_decode(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol, for the bit-at-a-time reader."""
    enc = _build_codes(bits, vals)
    return {(ln, code): sym for sym, (code, ln) in enc.items()}


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


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            elif 0xD0 <= nxt <= 0xD7:
                # restart marker reached mid-read: signal via exception-free
                # sentinel — callers align to markers via sync_restart()
                raise _MarkerHit(nxt)
            else:
                raise _MarkerHit(nxt)
        self.acc = (self.acc << 8) | b
        self.n += 8

    def read_bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        bit = (self.acc >> self.n) & 1
        # truncate like _BitWriter does — without the mask acc grows into
        # an unbounded int and every shift copies it: O(scan²) decode
        self.acc &= (1 << self.n) - 1
        return bit

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Skip to just past the next RSTn marker; reset bit alignment."""
        self.acc, self.n = 0, 0
        d, p = self.data, self.pos
        while p + 1 < len(d):
            if d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7:
                self.pos = p + 2
                return
            p += 1
        raise ValueError("expected restart marker")


class _MarkerHit(ValueError):
    """A marker interrupted entropy data where none was expected —
    malformed stream (or a restart the caller failed to sync)."""

    def __init__(self, marker: int) -> None:
        super().__init__(f"unexpected marker 0xFF{marker:02X} in scan")
        self.marker = marker


def _huff_decode(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length <= 16:
        code = (code << 1) | r.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    """Spec F.2.2.1 EXTEND: map `size` raw bits to the signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


# ---------------------------------------------------------------------------
# Encoder

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
        coef = np.einsum("ij,abjk,lk->abil", _C, blocks, _C)
        q = np.round(coef / qt.reshape(8, 8)).astype(np.int64)
        comp_blocks.append(q.reshape(nby, nbx, 64)[:, :, ZIGZAG])

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
    """Baseline JFIF JPEG bytes → RGB8 HxWx3 (grayscale → replicated).

    Tables come from the file's own DQT/DHT segments; rejects
    progressive/arithmetic/12-bit streams with ValueError.
    """
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
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
                huff[(tc, th)] = _build_decode(bits, vals)
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
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG (progressive/arithmetic)")
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

    planes = []
    for c in comps:
        planes.append(
            np.zeros((mcus_y * 8 * c["v"], mcus_x * 8 * c["h"]), dtype=np.float64)
        )

    r = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                r.sync_restart()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                td, ta = scan_tabs[c["id"]]
                dc_tab, ac_tab = huff[(0, td)], huff[(1, ta)]
                qt = qts[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk, pred[ci] = _decode_block(
                            r, dc_tab, ac_tab, qt, pred[ci]
                        )
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = blk
            mcu_count += 1

    # upsample to full resolution (nearest), crop, color-convert
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
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


def _decode_block(r, dc_tab, ac_tab, qt, pred):
    zz = np.zeros(64, dtype=np.int64)
    size = _huff_decode(r, dc_tab)
    diff = _extend(r.read_bits(size), size) if size else 0
    dc = pred + diff
    zz[0] = dc
    k = 1
    while k < 64:
        sym = _huff_decode(r, ac_tab)
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            k += 16
            continue
        run, size = sym >> 4, sym & 0x0F
        k += run
        if k > 63:
            raise ValueError("AC run past block end")
        zz[k] = _extend(r.read_bits(size), size)
        k += 1
    # zz is zigzag-ordered; qt is stored natural (row-major) — bring the
    # coefficients to natural order FIRST, then dequantize elementwise.
    # The output stays level-shifted; the caller adds 128 after color
    # conversion.
    coef = (zz[UNZIGZAG] * qt).reshape(8, 8).astype(np.float64)
    blk = _C.T @ coef @ _C
    return blk, dc
