"""Image payload codecs — pure-stdlib PNG + deterministic lossy variant.

The graft's page payload is an image+caption pair (BASELINE.json
input_hint; darc analogues: document blob ``darc/model/web/requests.py:50``,
screenshot PNG ``darc/crawl.py:333-341``, data-URI decode
``darc/proxy/data.py:33-56``).

PIL is not in this container, so:

* ``encode_png``/``decode_png`` — a real, spec-conformant PNG codec on
  stdlib ``zlib``+``struct``. The encoder writes RGB8/filter 0; the
  decoder handles the real-web surface: filters 0-4, color types
  0/2/3/4/6 (gray, RGB, palette, gray+alpha, RGBA), bit depths
  1/2/4/8/16, Adam7 interlace. Lossless: decode(encode(x)) == x.
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


def _unfilter(
    data: bytes, w: int, h: int, bpp: int = 3, stride: int | None = None
) -> np.ndarray:
    """Reverse PNG row filters 0-4 over ``h`` rows of ``stride`` bytes
    (default ``w*bpp``); ``bpp`` is the filter's left-neighbor offset
    in BYTES (max(1, channels·depth/8) per the spec). Returns the
    (h, stride) byte matrix reshaped to (h, w, bpp) when stride is
    the natural w·bpp, else left as (h, stride) for sub-byte depths."""
    natural = stride is None
    stride = w * bpp if stride is None else stride
    if len(data) < h * (stride + 1):
        raise ValueError("PNG pixel data truncated")
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
    return out.reshape(h, w, bpp) if natural else out


_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# Adam7 pass grid: (x0, y0, dx, dy)
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _png_samples(
    raw: bytes, w: int, h: int, depth: int, channels: int
) -> tuple[np.ndarray, int]:
    """Unfilter + unpack one (sub)image → (h, w, channels) uint8
    samples (16-bit scaled to 8 via the high byte, sub-byte depths
    left-aligned per spec). Returns (samples, bytes consumed)."""
    bpp = max(1, channels * depth // 8)
    stride = (w * channels * depth + 7) // 8
    consumed = h * (stride + 1)
    rows = _unfilter(raw, w, h, bpp, stride=stride)
    if depth == 8:
        return rows[:, : w * channels].reshape(h, w, channels), consumed
    if depth == 16:
        # most-significant byte ≡ the spec's sample/257 rounding ±1
        return (
            rows.reshape(h, stride)[:, : w * channels * 2]
            .reshape(h, w, channels, 2)[..., 0]
        ), consumed
    # 1/2/4-bit: unpack bits per row, regroup into depth-sized samples
    bits = np.unpackbits(rows, axis=1)
    n = w * channels
    samples = np.zeros((h, n), dtype=np.uint8)
    for b in range(depth):
        samples = (samples << 1) | bits[:, b::depth][:, :n]
    return samples.reshape(h, w, channels), consumed


def _png_to_rgb(
    samples: np.ndarray, color_type: int, depth: int, palette: np.ndarray | None
) -> np.ndarray:
    if color_type == 2:
        return samples
    if color_type == 6:
        return samples[..., :3]  # drop alpha (PIL convert("RGB") semantics)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG without PLTE chunk")
        idx = samples[..., 0]
        if int(idx.max()) >= len(palette):
            raise ValueError("palette index out of range")
        return palette[idx]
    # grayscale (0) / gray+alpha (4): scale sub-byte depths to 0..255
    g = samples[..., 0]
    if depth < 8:
        g = (g.astype(np.uint16) * 255 // ((1 << depth) - 1)).astype(np.uint8)
    return np.repeat(g[..., None], 3, axis=2)


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → RGB8 array — the real-web decode surface: color
    types 0/2/3/4/6, bit depths 1/2/4/8/16, Adam7 interlace. Alpha is
    dropped (PIL ``convert("RGB")`` semantics); 16-bit scales via the
    high byte. Raises ValueError on malformed input."""
    try:
        return _decode_png(data)
    except ValueError:
        raise
    except (IndexError, struct.error, zlib.error, OverflowError) as exc:
        raise ValueError(f"malformed PNG: {type(exc).__name__}: {exc}") from exc


def _decode_png(data: bytes) -> np.ndarray:
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w, h = 8, 0, 0
    depth, color_type, interlace = 8, 2, 0
    palette: np.ndarray | None = None
    idat = b""
    seen_ihdr = False
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) != length:
            raise ValueError("PNG chunk truncated")
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color_type, _comp, _filt, interlace = (
                struct.unpack_from(">IIBBBBB", payload)
            )
            seen_ihdr = True
            if color_type not in _PNG_CHANNELS:
                raise ValueError(f"bad PNG color type {color_type}")
            ok_depths = (
                (1, 2, 4, 8) if color_type == 3
                else (1, 2, 4, 8, 16) if color_type == 0
                else (8, 16)
            )
            if depth not in ok_depths:
                raise ValueError(
                    f"bad PNG bit depth {depth} for color type {color_type}"
                )
            if w == 0 or h == 0:
                raise ValueError("zero-size PNG")
        elif tag == b"PLTE":
            if length % 3:
                raise ValueError("bad PLTE length")
            palette = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if not seen_ihdr or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    raw = zlib.decompress(idat)
    channels = _PNG_CHANNELS[color_type]
    if interlace == 0:
        samples, _ = _png_samples(raw, w, h, depth, channels)
        return _png_to_rgb(samples, color_type, depth, palette)
    if interlace != 1:
        raise ValueError(f"bad PNG interlace method {interlace}")
    out = np.zeros((h, w, channels), dtype=np.uint8)
    off = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        sub, consumed = _png_samples(raw[off:], pw, ph, depth, channels)
        off += consumed
        out[y0::dy, x0::dx] = sub
    return _png_to_rgb(out, color_type, depth, palette)


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
