"""PNG decoder over the real-web surface: hand-built spec-conformant
streams for every color type (gray, RGB, palette, gray+alpha, RGBA),
sub-byte and 16-bit depths, Adam7 interlace, all five row filters, and
malformed-stream rejection. The encoder side (RGB8/filter 0) is pinned
by exact roundtrips."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from darc_spark.functions.images import _PNG_SIG, _chunk, decode_png, encode_png

_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _mk_png(
    w: int,
    h: int,
    depth: int,
    color_type: int,
    raw_rows: bytes,
    plte: bytes | None = None,
    interlace: int = 0,
) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)
    out = _PNG_SIG + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    out += _chunk(b"IDAT", zlib.compress(raw_rows, 6)) + _chunk(b"IEND", b"")
    return out


def _rows(arr2d: np.ndarray) -> bytes:
    """filter-0 rows from an (h, stride) byte matrix."""
    return b"".join(b"\x00" + r.tobytes() for r in arr2d)


def test_rgb8_roundtrip_exact():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (13, 9, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)


def test_grayscale8():
    rng = np.random.default_rng(2)
    g = rng.integers(0, 256, (5, 7), dtype=np.uint8)
    data = _mk_png(7, 5, 8, 0, _rows(g))
    want = np.repeat(g[..., None], 3, axis=2)
    assert np.array_equal(decode_png(data), want)


def test_grayscale_1bit_scales_to_255():
    # 10 px/row → 2 bytes/row, bits left-aligned MSB-first
    pattern = np.array(
        [[0b10110010, 0b11000000], [0b01001101, 0b00000000]], dtype=np.uint8
    )
    data = _mk_png(10, 2, 1, 0, _rows(pattern))
    got = decode_png(data)
    bits0 = [1, 0, 1, 1, 0, 0, 1, 0, 1, 1]
    bits1 = [0, 1, 0, 0, 1, 1, 0, 1, 0, 0]
    want = np.repeat(
        (np.array([bits0, bits1], dtype=np.uint8) * 255)[..., None], 3, axis=2
    )
    assert np.array_equal(got, want)


def test_palette_4bit():
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 7, 7, 7])  # r g b gray
    # 3 px/row, 4-bit indices: [0,1,2] → 0x01 0x20 ; [3,0,1] → 0x30 0x10
    rows = np.array([[0x01, 0x20], [0x30, 0x10]], dtype=np.uint8)
    data = _mk_png(3, 2, 4, 3, _rows(rows), plte=plte)
    want = np.array(
        [
            [[255, 0, 0], [0, 255, 0], [0, 0, 255]],
            [[7, 7, 7], [255, 0, 0], [0, 255, 0]],
        ],
        dtype=np.uint8,
    )
    assert np.array_equal(decode_png(data), want)


def test_rgba8_drops_alpha():
    rng = np.random.default_rng(3)
    rgba = rng.integers(0, 256, (4, 6, 4), dtype=np.uint8)
    data = _mk_png(6, 4, 8, 6, _rows(rgba.reshape(4, -1)))
    assert np.array_equal(decode_png(data), rgba[..., :3])


def test_gray_alpha8():
    rng = np.random.default_rng(4)
    ga = rng.integers(0, 256, (3, 5, 2), dtype=np.uint8)
    data = _mk_png(5, 3, 8, 4, _rows(ga.reshape(3, -1)))
    assert np.array_equal(decode_png(data), np.repeat(ga[..., :1], 3, axis=2))


def test_rgb16_takes_high_byte():
    rng = np.random.default_rng(5)
    hi = rng.integers(0, 256, (3, 4, 3), dtype=np.uint8)
    lo = rng.integers(0, 256, (3, 4, 3), dtype=np.uint8)
    inter = np.stack([hi, lo], axis=-1).reshape(3, -1)  # big-endian pairs
    data = _mk_png(4, 3, 16, 2, _rows(inter))
    assert np.array_equal(decode_png(data), hi)


def test_all_filters_rgb8():
    """One row per filter type 0-4, checked against a straightforward
    scalar reference implementation."""
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (5, 8, 3), dtype=np.int32)
    stride = 8 * 3
    flat = img.reshape(5, stride)
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y, ftype in enumerate([0, 1, 2, 3, 4]):
        cur = flat[y]
        enc = np.zeros(stride, dtype=np.int32)
        for x in range(stride):
            a = cur[x - 3] if x >= 3 else 0
            b = prev[x]
            c = prev[x - 3] if x >= 3 else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            enc[x] = (cur[x] - pred) & 0xFF
        raw += bytes([ftype]) + enc.astype(np.uint8).tobytes()
        prev = cur
    data = _mk_png(8, 5, 8, 2, bytes(raw))
    assert np.array_equal(decode_png(data), img.astype(np.uint8))


def test_adam7_interlaced_rgb8():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (11, 13, 3), dtype=np.uint8)
    raw = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        sub = img[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        raw += _rows(sub.reshape(sub.shape[0], -1))
    data = _mk_png(13, 11, 8, 2, bytes(raw), interlace=1)
    assert np.array_equal(decode_png(data), img)


def test_adam7_tiny_image_skips_empty_passes():
    img = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    raw = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        sub = img[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        raw += _rows(sub.reshape(sub.shape[0], -1))
    data = _mk_png(2, 2, 8, 2, bytes(raw), interlace=1)
    assert np.array_equal(decode_png(data), img)


@pytest.mark.parametrize(
    "breaker",
    [
        lambda d: d[:20],  # truncated inside IHDR chunk
        lambda d: d[:-30],  # truncated IDAT
        lambda d: d.replace(b"IDAT", b"IDAX", 1),  # no pixel data
    ],
)
def test_malformed_raises_valueerror(breaker):
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    with pytest.raises(ValueError):
        decode_png(breaker(encode_png(img)))


def test_bad_header_fields_raise():
    img = np.zeros((2, 2), dtype=np.uint8)
    with pytest.raises(ValueError, match="color type"):
        decode_png(_mk_png(2, 2, 8, 5, _rows(img)))
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(_mk_png(2, 2, 4, 2, _rows(img)))
    with pytest.raises(ValueError, match="palette"):
        decode_png(_mk_png(2, 2, 8, 3, _rows(img)))  # no PLTE
    plte = bytes([1, 2, 3])
    with pytest.raises(ValueError, match="index"):
        decode_png(_mk_png(2, 2, 8, 3, _rows(img + 9), plte=plte))


def test_fuzz_never_raises_non_valueerror():
    rng = np.random.default_rng(8)
    base = bytearray(encode_png(np.zeros((8, 8, 3), dtype=np.uint8)))
    for _ in range(300):
        d = bytearray(base)
        for _ in range(rng.integers(1, 5)):
            d[rng.integers(8, len(d))] = rng.integers(0, 256)
        try:
            decode_png(bytes(d))
        except ValueError:
            pass


def test_differential_vs_pil_if_available():
    PIL = pytest.importorskip("PIL.Image")
    import io

    rng = np.random.default_rng(9)
    for mode, ct in [("L", 0), ("RGB", 2), ("RGBA", 6)]:
        ch = {"L": 1, "RGB": 3, "RGBA": 4}[mode]
        arr = rng.integers(0, 256, (10, 12, ch), dtype=np.uint8).squeeze()
        buf = io.BytesIO()
        PIL.fromarray(arr, mode=mode).save(buf, format="PNG")
        theirs = np.asarray(PIL.open(buf).convert("RGB"))
        assert np.array_equal(decode_png(buf.getvalue()), theirs), mode
