"""Pure-Python baseline JPEG codec (darc_spark/functions/jpeg.py).

The real lossy path of the image payload pipeline (VERDICT r3 item 5 —
`decode_jpeg` must stop being a stub). Checks: roundtrip fidelity on
photograph-like content, 4:2:0 + restart-interval decode paths, odd
geometry, determinism, malformed-stream rejection, and the corpus
contract (two fifths of payloads are real JPEGs — baseline and
progressive — meeting the PSNR≥40dB
invariant). Differential vs PIL when available (not in this container).
"""

from __future__ import annotations

import numpy as np
import pytest

from darc_spark.functions.images import decode_image, psnr, smooth_pixels
from darc_spark.functions.jpeg import decode_jpeg_py, encode_jpeg
from darc_spark.sources.synth import image_payload


def _smooth(seed: int, side: int = 48) -> np.ndarray:
    return smooth_pixels(np.random.default_rng(seed), side)


def test_roundtrip_psnr_444():
    for seed in range(5):
        img = _smooth(seed)
        dec = decode_jpeg_py(encode_jpeg(img, quality=92))
        assert dec.shape == img.shape
        assert psnr(img, dec) >= 40.0


def test_roundtrip_psnr_420_subsampled():
    """4:2:0 exercises the multi-block MCU + chroma upsampling decode
    path. Chroma halving costs real fidelity on fast-varying chroma
    fields, so the bar here is structural correctness (high-30s PSNR),
    not the corpus invariant — the corpus uses 4:4:4."""
    for seed in range(3):
        img = _smooth(seed, 64)
        dec = decode_jpeg_py(encode_jpeg(img, quality=92, subsample=True))
        assert dec.shape == img.shape
        assert psnr(img, dec) >= 33.0


def test_quality_monotonic():
    img = _smooth(7)
    p = [
        psnr(img, decode_jpeg_py(encode_jpeg(img, quality=q)))
        for q in (30, 60, 92)
    ]
    assert p[0] < p[1] < p[2]


def test_restart_interval_roundtrip():
    """DRI + RSTn markers: byte-identical reconstruction to the
    no-restart stream's decode (restarts change framing, not content)."""
    img = _smooth(3, 56)
    plain = decode_jpeg_py(encode_jpeg(img, quality=92))
    restarted = decode_jpeg_py(
        encode_jpeg(img, quality=92, restart_interval=2)
    )
    assert (plain == restarted).all()
    data = encode_jpeg(img, quality=92, restart_interval=2)
    assert b"\xff\xdd" in data  # DRI present
    assert any(bytes([0xFF, 0xD0 + i]) in data for i in range(8))


def test_odd_geometry_and_padding():
    rng = np.random.default_rng(11)
    for shape in [(1, 1), (7, 9), (8, 8), (15, 17), (5, 16), (17, 31)]:
        img = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
        for sub in (False, True):
            dec = decode_jpeg_py(encode_jpeg(img, quality=95, subsample=sub))
            assert dec.shape == img.shape, (shape, sub)


def test_deterministic_bytes():
    img = _smooth(5)
    assert encode_jpeg(img, quality=92) == encode_jpeg(img, quality=92)


def test_rejects_non_baseline_and_garbage():
    img = _smooth(1, 16)
    data = bytearray(encode_jpeg(img))
    sof = data.find(b"\xff\xc0")
    data[sof + 1] = 0xC2  # rebrand SOF0 as progressive SOF2
    with pytest.raises(ValueError):
        decode_jpeg_py(bytes(data))
    with pytest.raises(ValueError):
        decode_jpeg_py(b"not a jpeg at all")
    with pytest.raises((ValueError, IndexError)):
        decode_jpeg_py(encode_jpeg(img)[:40])  # truncated


def test_decode_image_dispatch_uses_real_decoder():
    """fmt="jpeg" through the production dispatch decodes without PIL."""
    img = _smooth(9, 32)
    dec = decode_image(encode_jpeg(img, quality=92), "jpeg")
    assert psnr(img, dec) >= 40.0


def test_corpus_contains_real_jpegs_meeting_invariant():
    """image_payload: two fifths of payloads are real JFIF JPEG — one
    class baseline SOF0, one PROGRESSIVE SOF2 — every one decoding to
    ≥40dB vs its pre-encode pixels; the GIF fifth is real GIF89a and
    roundtrips exactly (lossless for palette-native content)."""
    from darc_spark.functions.gif import decode_gif

    fmts = {"png": 0, "qpng": 0, "jpeg": 0, "gif": 0}
    sofs = {0xC0: 0, 0xC2: 0}
    for ih in range(0, 6000, 100):
        arr, fmt, data = image_payload(ih * 7919 + 13, 32)
        fmts[fmt] += 1
        if fmt == "jpeg":
            assert data[:2] == b"\xff\xd8" and data[6:10] == b"JFIF"
            for marker in (0xC0, 0xC2):
                if bytes([0xFF, marker]) in data:
                    sofs[marker] += 1
            assert psnr(arr, decode_jpeg_py(data)) >= 40.0
        elif fmt == "gif":
            assert data[:6] == b"GIF89a"
            assert np.array_equal(decode_gif(data), arr)
    assert all(v > 0 for v in fmts.values()), fmts
    assert sofs[0xC0] > 0 and sofs[0xC2] > 0, sofs  # both JPEG shapes


def test_differential_vs_pil_if_available():
    PIL = pytest.importorskip("PIL.Image")
    import io

    img = _smooth(21, 40)
    data = encode_jpeg(img, quality=92)
    ours = decode_jpeg_py(data)
    theirs = np.asarray(PIL.open(io.BytesIO(data)).convert("RGB"))
    # same bitstream, two decoders: IDCT rounding differs by ≤ a few LSB
    assert psnr(ours, theirs) >= 45.0


def test_decode_large_image_linear_time():
    """Regression: the bit-reader must truncate its accumulator — an
    unmasked acc turns entropy decode O(scan²) (a 96px photo took
    minutes; masked it is well under a second)."""
    import time

    img = _smooth(31, 96)
    data = encode_jpeg(img, quality=95)
    t0 = time.perf_counter()
    dec = decode_jpeg_py(data)
    assert time.perf_counter() - t0 < 10.0
    assert psnr(img, dec) >= 40.0


def test_rejects_non_interleaved_multi_scan():
    """A scan covering fewer components than the frame must raise the
    documented ValueError, not KeyError mid-MCU."""
    data = bytearray(encode_jpeg(_smooth(2, 16)))
    sos = data.find(b"\xff\xda")
    # rebuild the SOS: ns=1 (first component only), fix segment length
    import struct

    comp1 = data[sos + 5 : sos + 7]
    tail = data[sos + 11 : sos + 14]  # Ss, Se, AhAl
    new_payload = bytes([1]) + comp1 + tail
    new_seg = b"\xff\xda" + struct.pack(">H", len(new_payload) + 2) + new_payload
    data = bytes(data[:sos]) + new_seg + bytes(data[sos + 14 :])
    with pytest.raises(ValueError, match="multi-scan"):
        decode_jpeg_py(data)




def test_decoder_never_hangs_on_corrupt_streams():
    """Never-throw-at-the-operator contract, decoder side: random
    single-byte corruptions of a valid stream must either decode or
    raise promptly — no hangs, no non-Exception escapes (the
    image_features wrapper converts any raise into a decode_error
    row)."""
    import time

    rng = np.random.default_rng(77)
    base = bytearray(encode_jpeg(_smooth(13, 32), quality=92))
    t0 = time.perf_counter()
    decoded, raised = 0, 0
    for _ in range(150):
        data = bytearray(base)
        for _ in range(rng.integers(1, 4)):
            data[rng.integers(2, len(data))] = rng.integers(0, 256)
        try:
            decode_jpeg_py(bytes(data))
            decoded += 1
        except Exception:
            raised += 1
    assert decoded + raised == 150
    assert time.perf_counter() - t0 < 60.0
    # corruption actually bites sometimes (the fuzz isn't vacuous)
    assert raised > 0


def test_roundtrip_property_extreme_pixels():
    """Property: any uint8 image (including saturated extremes and
    hard edges) roundtrips at the encoder's documented fidelity class —
    structurally valid output of the right shape, monotone-bounded
    error."""
    try:
        from hypothesis import given, settings, strategies as st
        from hypothesis.extra.numpy import arrays
    except ImportError:  # pragma: no cover
        import pytest as _pytest

        _pytest.skip("hypothesis not installed")

    @settings(max_examples=30, deadline=None)
    @given(
        arrays(
            np.uint8,
            st.tuples(
                st.integers(1, 24), st.integers(1, 24), st.just(3)
            ),
        )
    )
    def prop(img):
        dec = decode_jpeg_py(encode_jpeg(img, quality=97))
        assert dec.shape == img.shape
        assert dec.dtype == np.uint8
        # error bounded: quantized DCT at q97 stays within a coarse
        # absolute band even on adversarial content
        assert float(np.abs(dec.astype(int) - img.astype(int)).mean()) < 64

    prop()


def test_native_and_python_scan_decoders_agree():
    """Differential: the optional ctypes-compiled scan decoder and the
    pure-Python reference must agree exactly — on valid streams (pixel
    equality) and on corrupted ones (both decode to the same pixels, or
    both raise ValueError)."""
    from darc_spark.functions import jpeg_native

    if not jpeg_native.available():
        import pytest as _pytest

        _pytest.skip("no C compiler available for the native path")

    def decode_both(data):
        import darc_spark.functions.jpeg_native as jn

        saved_lib, saved_tried = jn._lib, jn._tried
        try:
            out_native = _try(data)
            jn._lib, jn._tried = None, True  # force the Python path
            out_py = _try(data)
        finally:
            jn._lib, jn._tried = saved_lib, saved_tried
        return out_native, out_py

    def _try(data):
        try:
            return ("ok", decode_jpeg_py(data))
        except ValueError:
            return ("raise", None)

    # valid streams across shapes/sampling/restart
    rng = np.random.default_rng(5)
    for side, sub, ri in [(16, False, 0), (33, True, 0), (40, True, 3), (24, False, 2)]:
        img = _smooth(side, side)
        data = encode_jpeg(img, quality=92, subsample=sub, restart_interval=ri)
        (sa, da), (sb, db) = decode_both(data)
        assert sa == sb == "ok"
        assert (da == db).all()

    # corrupted streams: identical verdicts, identical pixels when ok
    base = bytearray(encode_jpeg(_smooth(21, 32), quality=92))
    agree_raise = agree_ok = 0
    for _ in range(120):
        data = bytearray(base)
        for _ in range(rng.integers(1, 4)):
            data[rng.integers(2, len(data))] = rng.integers(0, 256)
        (sa, da), (sb, db) = decode_both(bytes(data))
        assert sa == sb, "native and python disagree on verdict"
        if sa == "ok":
            assert (da == db).all()
            agree_ok += 1
        else:
            agree_raise += 1
    assert agree_ok > 0 and agree_raise > 0
