"""Image payload codecs — pure-stdlib PNG + deterministic lossy variant.

The graft's page payload is an image+caption pair (BASELINE.json
input_hint; darc analogues: document blob ``darc/model/web/requests.py:50``,
screenshot PNG ``darc/crawl.py:333-341``, data-URI decode
``darc/proxy/data.py:33-56``).

PIL is not in this container, so:

* ``encode_png``/``decode_png`` — a real, spec-conformant RGB8 PNG codec
  on stdlib ``zlib``+``struct`` (filter 0; decoder handles filters 0-4).
  Lossless: decode(encode(x)) == x exactly.
* ``encode_lossy``/``decode_lossy`` — deterministic quantizing codec
  (PNG container, fmt tag ``qpng``): step-4 quantization ⇒ PSNR ≈ 47 dB,
  exercising the ≥40 dB invariant without a JPEG library.
* ``decode_jpeg`` — the real-JPEG path: PIL when importable, else the
  pure-Python baseline codec in :mod:`darc_spark.functions.jpeg`
  (implemented from the public ITU T.81 spec) — no stub either way.
* ``phash64`` — 64-bit average perceptual hash (8×8 block-mean), used
  for the ``phash`` column and near-dup checks.

All batch functions are numpy-vectorized per element over Arrow batches.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """RGB8 HxWx3 → PNG bytes (filter 0, fixed zlib level ⇒ deterministic)."""
    assert arr.ndim == 3 and arr.shape[2] == 3 and arr.dtype == np.uint8
    h, w = arr.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit truecolor
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _unfilter(data: bytes, w: int, h: int, bpp: int = 3) -> np.ndarray:
    stride = w * bpp
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ftype = data[pos]
        pos += 1
        row = np.frombuffer(data, dtype=np.uint8, count=stride, offset=pos).astype(
            np.int32
        )
        pos += stride
        if ftype == 0:
            cur = row
        elif ftype == 1:  # Sub
            cur = row.copy()
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            cur = (row + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = row.copy()
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = row.copy()
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(h, w, bpp)


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → RGB8 array. Raises ValueError on malformed input."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w, h = 8, 0, 0
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bit_depth, color_type = struct.unpack_from(">IIBB", payload)
            if bit_depth != 8 or color_type != 2:
                raise ValueError("only RGB8 supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    return _unfilter(zlib.decompress(idat), w, h)


LOSSY_STEP = 4  # ⇒ PSNR ≈ 10·log10(255²·12/step²) ≈ 46.9 dB


def encode_lossy(arr: np.ndarray, step: int = LOSSY_STEP) -> bytes:
    """Deterministic quantizing 'lossy' codec (fmt tag: qpng)."""
    q = ((arr.astype(np.int32) // step) * step + step // 2).clip(0, 255)
    return encode_png(q.astype(np.uint8))


def decode_lossy(data: bytes) -> np.ndarray:
    return decode_png(data)


def decode_jpeg(data: bytes) -> np.ndarray:
    """Real-JPEG decode.

    PIL when importable (C-speed, the production path on a real
    cluster); otherwise the pure-Python baseline decoder implemented
    from the public spec (:mod:`darc_spark.functions.jpeg`) — no stub,
    real lossy coverage either way. Binary column in, HxWx3 uint8 out.
    """
    try:
        import io

        from PIL import Image  # type: ignore[import-not-found]
    except ImportError:
        from darc_spark.functions.jpeg import decode_jpeg_py

        return decode_jpeg_py(data)
    return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))


def smooth_pixels(rng: np.random.Generator, side: int) -> np.ndarray:
    """Deterministic low-frequency RGB test image (per-channel sinusoid
    fields) — the JPEG-friendly content class: pure noise is the one
    signal JPEG cannot compress faithfully, and real crawl payloads are
    photographs, not noise."""
    yy, xx = np.mgrid[0:side, 0:side] / max(side, 1)
    img = np.empty((side, side, 3))
    for c in range(3):
        base = rng.uniform(64, 192)
        amp = rng.uniform(16, 60)
        fx, fy = rng.uniform(0.5, 2.5, size=2)
        ph = rng.uniform(0, 2 * np.pi)
        img[..., c] = base + amp * np.sin(2 * np.pi * (fx * xx + fy * yy) + ph)
    return np.clip(img, 0, 255).astype(np.uint8)


def _decode_gif(data: bytes) -> np.ndarray:
    from darc_spark.functions.gif import decode_gif as _dg

    return _dg(data)


_DECODERS = {
    "png": decode_png,
    "qpng": decode_lossy,
    "jpeg": decode_jpeg,
    "gif": _decode_gif,
}


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    return _DECODERS[fmt](data)


def phash64(arr: np.ndarray) -> int:
    """64-bit average hash: grayscale → 8×8 block means → bits > mean."""
    gray = arr.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = gray.shape
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    blocks = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            blocks[i, j] = gray[ys[i] : max(ys[i + 1], ys[i] + 1), xs[j] : max(xs[j + 1], xs[j] + 1)].mean()
    bits = (blocks > blocks.mean()).ravel()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return val - (1 << 64) if val >= (1 << 63) else val  # signed int64


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)
