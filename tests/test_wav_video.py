"""Pure-stdlib WAV codec + MJPEG splitter (functions/wav.py, video.py).

The real audio/video decode paths (VERDICT r4 item 5 — replace the
deterministic fakes the way jpeg.py replaced the image stub). Checks:
WAV PCM16/PCM8 round-trip exactness, multi-channel interleave, RIFF
chunk-walk tolerance (unknown/odd-sized chunks, EXTENSIBLE fmt),
malformed-stream rejection as ValueError (never a raw parser crash —
the Spark never-throw contract depends on it), fuzz over truncations
and byte flips, exact MJPEG SOI/EOI frame splitting (including 0xFF D9
inside entropy data being impossible by stuffing), and sampling-index
properties.

Reference analogue: darc stores media bodies as opaque blobs
(darc/save.py:118-133, darc/model/web/requests.py:50); these codecs are
the downstream decode step the reference leaves to its consumers.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from darc_spark.functions.images import smooth_pixels
from darc_spark.functions.jpeg import encode_jpeg
from darc_spark.functions.video import (
    encode_avi_mjpg,
    sample_frame_indices,
    split_avi_mjpg,
    split_frames,
    split_mjpeg,
)
from darc_spark.functions.wav import decode_wav, encode_wav, tone_wave


def test_wav_roundtrip_mono_exact():
    w = tone_wave(7, 4096, 16000)
    samples, sr = decode_wav(encode_wav(w, 16000))
    assert sr == 16000
    assert samples.shape == (4096, 1)
    assert (samples[:, 0] == w).all()


def test_wav_roundtrip_stereo_interleave():
    left = tone_wave(1, 1000, 44100)
    right = tone_wave(2, 1000, 44100)
    w = np.stack([left, right], axis=1)
    samples, sr = decode_wav(encode_wav(w, 44100))
    assert sr == 44100
    assert samples.shape == (1000, 2)
    assert (samples[:, 0] == left).all() and (samples[:, 1] == right).all()


def test_wav_odd_data_size_padded():
    # 3 mono samples of 8-bit would be odd; with int16 mono use an odd
    # byte count via a trailing LIST chunk after data to check the
    # word-align walk, plus an odd-sized unknown chunk before fmt.
    w = tone_wave(3, 11, 8000)
    body = encode_wav(w, 8000)
    # splice an odd-sized junk chunk right after the WAVE tag
    junk = b"junk" + struct.pack("<I", 3) + b"abc" + b"\x00"  # pad byte
    spliced = body[:12] + junk + body[12:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    samples, sr = decode_wav(spliced)
    assert sr == 8000
    assert (samples[:, 0] == w).all()


def test_wav_pcm8_widened():
    pcm8 = bytes([0, 128, 255, 64])
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm8)) + pcm8
    )
    raw = b"RIFF" + struct.pack("<I", len(body)) + body
    samples, sr = decode_wav(raw)
    assert sr == 8000
    assert samples[:, 0].tolist() == [
        (0 - 128) << 8, 0, (255 - 128) << 8, (64 - 128) << 8
    ]


def test_wav_extensible_pcm_accepted_non_pcm_rejected():
    w = tone_wave(4, 64, 16000)
    raw = encode_wav(w, 16000)
    # rebuild the fmt chunk as WAVE_FORMAT_EXTENSIBLE with the PCM GUID
    from darc_spark.functions.wav import _PCM_GUID

    ext = struct.pack(
        "<HHIIHHHHI", 0xFFFE, 1, 16000, 32000, 2, 16, 22, 16, 0
    ) + _PCM_GUID
    data_off = raw.find(b"data")
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(ext)) + ext
        + raw[data_off:]
    )
    raw_ext = b"RIFF" + struct.pack("<I", len(body)) + body
    samples, sr = decode_wav(raw_ext)
    assert (samples[:, 0] == w).all()
    # a non-PCM subformat GUID must be rejected cleanly
    bad = raw_ext.replace(_PCM_GUID, b"\x03" + _PCM_GUID[1:])
    with pytest.raises(ValueError):
        decode_wav(bad)


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b[:10],                      # truncated header
        lambda b: b[: len(b) // 2],            # truncated data
        lambda b: b"OGGS" + b[4:],             # wrong magic
        lambda b: b.replace(b"fmt ", b"fmX "), # missing fmt
        lambda b: b.replace(b"data", b"datx"), # missing data
        lambda b: b"",                         # empty
    ],
)
def test_wav_malformed_raises_valueerror(mutate):
    raw = encode_wav(tone_wave(5, 256, 16000), 16000)
    with pytest.raises(ValueError):
        decode_wav(bytes(mutate(raw)))


def test_wav_fuzz_never_raises_non_valueerror():
    """Any corruption → either a successful decode or ValueError; no
    IndexError/struct.error escapes into a Spark task."""
    rng = np.random.default_rng(99)
    base = encode_wav(tone_wave(6, 512, 16000), 16000)
    for _ in range(300):
        b = bytearray(base)
        for _ in range(int(rng.integers(1, 6))):
            b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
        cut = int(rng.integers(0, len(b) + 1))
        try:
            decode_wav(bytes(b[:cut]))
        except ValueError:
            pass


def test_tone_wave_deterministic_and_bounded():
    a, b = tone_wave(42, 2048, 16000), tone_wave(42, 2048, 16000)
    assert (a == b).all()
    assert a.dtype == np.int16
    assert np.abs(a.astype(np.int32)).max() <= 32767


def _frames(seed: int, n: int) -> list[bytes]:
    return [
        encode_jpeg(smooth_pixels(np.random.default_rng(seed + f), 24))
        for f in range(n)
    ]


def test_split_mjpeg_exact_roundtrip():
    frames = _frames(100, 4)
    sep = b"\r\n--frame\r\nContent-Type: image/jpeg\r\n\r\n"
    assert split_mjpeg(sep.join(frames)) == frames
    assert split_mjpeg(b"".join(frames)) == frames  # bare concatenation


def test_split_mjpeg_torn_tail_kept_complete_frames():
    frames = _frames(200, 3)
    payload = b"".join(frames) + frames[0][:20]  # torn 4th frame
    assert split_mjpeg(payload) == frames


def test_split_mjpeg_no_complete_frame_raises():
    with pytest.raises(ValueError):
        split_mjpeg(_frames(300, 1)[0][:40])
    with pytest.raises(ValueError):
        split_mjpeg(b"not a jpeg stream at all")


def _with_exif_thumbnail(frame: bytes, thumb: bytes) -> bytes:
    """Splice an EXIF-style APP1 segment whose payload embeds a whole
    thumbnail JPEG (its own SOI..EOI) right after the frame's SOI —
    the standard camera-JPEG layout."""
    body = b"Exif\x00\x00" + thumb
    app1 = b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body
    return frame[:2] + app1 + frame[2:]


def test_split_mjpeg_exif_thumbnail_not_a_boundary():
    """A frame whose APP1 carries an embedded thumbnail JPEG (inner
    FF D9!) must split at the OUTER frame's EOI — a raw EOI scan would
    truncate the frame at the thumbnail and corrupt every such frame."""
    from darc_spark.functions.images import decode_jpeg

    frames = _frames(800, 3)
    thumb = encode_jpeg(smooth_pixels(np.random.default_rng(801), 16))
    rich = [_with_exif_thumbnail(f, thumb) for f in frames]
    got = split_mjpeg(b"".join(rich))
    assert got == rich
    for f in got:  # and each split frame still decodes
        assert decode_jpeg(f).shape == (24, 24, 3)
    # DQT-payload bytes that equal FF D9 must not split either
    fake_dqt = b"\xff\xdb" + struct.pack(">H", 2 + 65) + b"\x00" + bytes(
        [0xFF, 0xD9] * 32
    )
    tricky = frames[0][:2] + fake_dqt + frames[0][2:]
    assert split_mjpeg(tricky + frames[1]) == [tricky, frames[1]]


def test_entropy_ff_bytes_cannot_fake_eoi():
    """Inside a frame's entropy-coded data every 0xFF is stuffed as
    FF 00 or is a real marker, so a raw FF D9 scan never splits a frame
    early: each split frame must itself decode."""
    from darc_spark.functions.images import decode_jpeg

    frames = _frames(400, 5)
    for f in split_mjpeg(b"".join(frames)):
        assert decode_jpeg(f).shape == (24, 24, 3)


def test_avi_mjpg_roundtrip():
    frames = _frames(500, 6)
    avi = encode_avi_mjpg(frames, 24, 24, fps=10)
    assert split_avi_mjpg(avi) == frames
    assert split_frames(avi) == frames  # dispatch picks the RIFF walk


def test_avi_idx1_bytes_cannot_fake_frames():
    """An idx1 index whose entries happen to contain FF D8 / FF D9 byte
    pairs must not yield phantom frames — the RIFF walk never raw-scans
    outside movi. (A raw SOI/EOI scan over the whole file would break
    here.)"""
    import struct as _s

    frames = _frames(600, 2)
    avi = bytearray(encode_avi_mjpg(frames, 24, 24))
    # graft adversarial SOI/EOI bytes into the idx1 entries' offset field
    i = avi.find(b"idx1")
    assert i > 0
    _s.pack_into("<I", avi, i + 8 + 4, 0xD9FFD8FF)  # little-endian FF D8 FF D9
    got = split_avi_mjpg(bytes(avi))
    assert got == frames
    # ...while the raw scan over the same bytes sees a phantom boundary
    raw = split_mjpeg(bytes(avi))
    assert raw != frames


def test_avi_non_avi_returns_none_torn_raises():
    assert split_avi_mjpg(b"\xff\xd8 not riff") is None
    frames = _frames(700, 3)
    avi = encode_avi_mjpg(frames, 24, 24)
    # tear inside the movi list: complete chunks survive
    torn = avi[: avi.find(b"00dc", avi.find(b"00dc") + 4) + 10]
    assert split_avi_mjpg(torn) == frames[:1]
    # header-only AVI (no frame) raises
    headless = avi[: avi.find(b"movi") + 4]
    with pytest.raises(ValueError):
        split_avi_mjpg(headless)


def test_sample_frame_indices_properties():
    assert sample_frame_indices(0, 3) == []
    assert sample_frame_indices(2, 3) == [0, 1]
    assert sample_frame_indices(10, 3) == [0, 3, 6]
    for n in range(1, 40):
        idx = sample_frame_indices(n, 3)
        assert idx[0] == 0 and idx == sorted(set(idx))
        assert all(0 <= i < n for i in idx)
        assert len(idx) == min(3, n)


def test_frame_pixels_animated_gif():
    """Animated GIF as a video container: frame_pixels samples the
    composited frames pixel-exactly (GIF is lossless)."""
    import numpy as np

    from darc_spark.functions.gif import encode_gif_frames
    from darc_spark.functions.video import frame_pixels

    rng = np.random.default_rng(42)
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    frames = [pal[rng.integers(0, 16, size=(20, 20))] for _ in range(7)]
    got = frame_pixels(encode_gif_frames(frames), 3)
    assert [i for i, _ in got] == [0, 2, 4]
    for i, px in got:
        assert np.array_equal(px, frames[i])


def test_frame_pixels_torn_gif_raises():
    import numpy as np
    import pytest as _pytest

    from darc_spark.functions.gif import encode_gif_frames
    from darc_spark.functions.video import frame_pixels

    rng = np.random.default_rng(43)
    pal = rng.integers(0, 256, size=(8, 3), dtype=np.uint8)
    data = encode_gif_frames(
        [pal[rng.integers(0, 8, size=(12, 12))] for _ in range(3)]
    )
    with _pytest.raises(ValueError):
        frame_pixels(data[: len(data) // 3], 3)
