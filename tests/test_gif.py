"""From-spec GIF codec: exact roundtrips (GIF is lossless for
palette-native content), interlace, animation compositing,
transparency, LZW table-overflow handling, and malformed-stream
rejection (ValueError contract, same as the JPEG codec)."""

from __future__ import annotations

import numpy as np
import pytest

from darc_spark.functions.gif import (
    decode_gif,
    encode_gif,
    encode_gif_frames,
    gif_frames,
)


def _paletted(seed: int, side: int, n_colors: int = 64) -> np.ndarray:
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, size=(n_colors, 3), dtype=np.uint8)
    return pal[rng.integers(0, n_colors, size=(side, side))]


@pytest.mark.parametrize("side", [1, 7, 16, 33, 64])
def test_roundtrip_exact(side):
    img = _paletted(side, side)
    data = encode_gif(img)
    assert data[:6] == b"GIF89a" and data[-1:] == b"\x3b"
    assert np.array_equal(decode_gif(data), img)


def test_roundtrip_interlaced():
    img = _paletted(5, 37)
    assert np.array_equal(decode_gif(encode_gif(img, interlace=True)), img)


def test_roundtrip_few_colors_and_monochrome():
    img = np.zeros((9, 9, 3), dtype=np.uint8)
    assert np.array_equal(decode_gif(encode_gif(img)), img)
    img2 = _paletted(3, 21, n_colors=2)
    assert np.array_equal(decode_gif(encode_gif(img2)), img2)


def test_lzw_table_overflow_roundtrip():
    """>4096 dictionary entries forces the mid-stream Clear path on
    both encoder and decoder."""
    img = _paletted(11, 128, n_colors=256)
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_animation_frames_roundtrip():
    # one shared palette across frames (a GIF has one global table)
    rng = np.random.default_rng(100)
    pal = rng.integers(0, 256, size=(40, 3), dtype=np.uint8)
    frames = [pal[rng.integers(0, 40, size=(24, 24))] for _ in range(5)]
    data = encode_gif_frames(frames)
    got = gif_frames(data)
    assert len(got) == 5
    for a, b in zip(got, frames):
        assert np.array_equal(a, b)


def test_transparency_composites_over_previous_frame():
    """A hand-built 2-frame GIF whose second frame marks index 0
    transparent: those pixels must keep frame 1's color."""
    import struct

    from darc_spark.functions.gif import _chunk, _lzw_encode

    # palette: 0=red 1=green 2=blue 3=black
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0])
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 2, 2, 0x81, 0, 0)  # 4-color GCT
    out += pal
    # frame 1: all green (index 1)
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
    out.append(2)
    out += _chunk(_lzw_encode(bytes([1, 1, 1, 1]), 2))
    # frame 2: GCE transparent index 0; pixels [0,2,0,2]
    out += b"\x21\xf9\x04\x01\x00\x00\x00\x00"
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
    out.append(2)
    out += _chunk(_lzw_encode(bytes([0, 2, 0, 2]), 2))
    out += b"\x3b"
    f1, f2 = gif_frames(bytes(out))
    assert np.array_equal(f1, np.full((2, 2, 3), [0, 255, 0], np.uint8))
    want = np.array(
        [[[0, 255, 0], [0, 0, 255]], [[0, 255, 0], [0, 0, 255]]], np.uint8
    )
    assert np.array_equal(f2, want)


def test_subrect_frame_and_disposal_restore_background():
    """Frame 2 paints a 1×2 sub-rect; disposal=2 restores the rect to
    the background color before frame 3."""
    import struct

    from darc_spark.functions.gif import _chunk, _lzw_encode

    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0])
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 2, 2, 0x81, 3, 0)  # bg = index 3 (black)
    out += pal
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
    out.append(2)
    out += _chunk(_lzw_encode(bytes([0, 0, 0, 0]), 2))  # all red
    # GCE disposal=2, then 1x2 blue rect at (0,1)
    out += b"\x21\xf9\x04\x08\x00\x00\x00\x00"
    out += b"\x2c" + struct.pack("<HHHHB", 0, 1, 2, 1, 0)
    out.append(2)
    out += _chunk(_lzw_encode(bytes([2, 2]), 2))
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 1, 1, 0)
    out.append(2)
    out += _chunk(_lzw_encode(bytes([1]), 2))  # green px top-left
    out += b"\x3b"
    f1, f2, f3 = gif_frames(bytes(out))
    red, green, blue, black = (
        [255, 0, 0],
        [0, 255, 0],
        [0, 0, 255],
        [0, 0, 0],
    )
    assert np.array_equal(f2[1], np.array([blue, blue], np.uint8))
    assert f2[0].tolist() == [red, red]
    # frame 3: rect restored to bg black, new green pixel top-left
    assert f3.tolist() == [[green, red], [black, black]]


def _smash_block_intro(d: bytes) -> bytes:
    off = 13 + 3 * (2 << (d[10] & 0x07))
    return d[:off] + b"\x7c" + d[off + 1 :]


@pytest.mark.parametrize(
    "mutate",
    [
        lambda d: d[:5],  # truncated header
        lambda d: b"XIF89a" + d[6:],  # bad signature
        lambda d: d[:20],  # truncated mid-palette/blocks
        lambda d: d[:-10],  # truncated LZW stream
        lambda d: d[:-1],  # missing trailer
        # unknown block tag: the first block intro byte sits right
        # after the global color table (size from the LSD packed field)
        lambda d: _smash_block_intro(d),
    ],
)
def test_malformed_raises_valueerror(mutate):
    data = mutate(encode_gif(_paletted(7, 24)))
    with pytest.raises(ValueError):
        gif_frames(bytes(data))


def test_fuzz_never_raises_non_valueerror():
    rng = np.random.default_rng(0)
    base = bytearray(encode_gif(_paletted(9, 20)))
    for _ in range(300):
        d = bytearray(base)
        for _ in range(rng.integers(1, 6)):
            d[rng.integers(0, len(d))] = rng.integers(0, 256)
        try:
            gif_frames(bytes(d))
        except ValueError:
            pass  # the only allowed failure


def test_decode_image_dispatch():
    from darc_spark.functions.images import decode_image

    img = _paletted(13, 16)
    assert np.array_equal(decode_image(encode_gif(img), "gif"), img)


def test_differential_vs_pil_if_available():
    PIL = pytest.importorskip("PIL.Image")
    import io

    img = _paletted(17, 32)
    theirs = np.asarray(
        PIL.open(io.BytesIO(encode_gif(img))).convert("RGB")
    )
    assert np.array_equal(theirs, img)
    # and decode a PIL-encoded stream
    buf = io.BytesIO()
    PIL.fromarray(img).save(buf, format="GIF")
    assert np.array_equal(
        decode_gif(buf.getvalue()),
        np.asarray(PIL.open(io.BytesIO(buf.getvalue())).convert("RGB")),
    )
