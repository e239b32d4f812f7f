"""Pure-stdlib RIFF/WAVE PCM codec (struct + numpy only).

The real audio decode path for the engine's multimodal operators —
replaces the round-4 deterministic fake the way
:mod:`darc_spark.functions.jpeg` replaced the image stub. Scope matches
what a crawl pipeline actually meets in ``audio/wav`` payloads:

* RIFF/WAVE container, chunk-walked tolerantly (unknown chunks skipped,
  word-aligned per the RIFF spec — odd-sized chunks carry a pad byte)
* ``fmt `` PCM (tag 1) and WAVE_FORMAT_EXTENSIBLE (tag 0xFFFE with the
  PCM subformat GUID), 8-bit unsigned / 16-bit signed little-endian
* mono or multi-channel interleaved ``data``
* any malformed stream raises ``ValueError`` (never IndexError /
  struct.error out of a Spark batch — same contract as the JPEG codec)

Reference analogue: darc stores fetched media as opaque blobs
(darc/model/web/requests.py:50); decoding happens downstream — this is
that downstream step for audio, kept dependency-free because this
container ships no audio library (a real deployment may swap in
soundfile and keep the same feature contract).
"""

from __future__ import annotations

import struct

import numpy as np

_PCM_GUID = (
    b"\x01\x00\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
)


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 samples ``(n,)`` or ``(n, channels)`` → WAV bytes
    (PCM16-LE). Deterministic: same input → identical bytes."""
    arr = np.asarray(samples)
    if arr.dtype != np.int16:
        raise ValueError(f"encode_wav wants int16 samples, got {arr.dtype}")
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    data = arr.astype("<i2").tobytes()
    block = ch * 2
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * block, block, 16
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
        + (b"\x00" if len(data) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (int16 samples ``(n, channels)``, sample_rate).

    8-bit PCM is widened to int16 (``(x − 128) << 8``). Raises
    ``ValueError`` on anything malformed or unsupported (compressed
    formats, missing chunks, truncated data)."""
    try:
        return _decode_wav_inner(data)
    except ValueError:
        raise
    except Exception as exc:  # noqa: BLE001 - normalize parser crashes
        raise ValueError(f"malformed WAV: {type(exc).__name__}: {exc}") from exc


def _decode_wav_inner(data: bytes) -> tuple[np.ndarray, int]:
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    riff_size = struct.unpack_from("<I", data, 4)[0]
    end = min(len(data), 8 + riff_size)
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body_start = pos + 8
        if body_start + size > end:
            if cid == b"data":
                raise ValueError("truncated data chunk")
            break  # tolerate a torn trailing metadata chunk
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too small")
            tag, ch, sr, _br, block, bits = struct.unpack_from(
                "<HHIIHH", data, body_start
            )
            if tag == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE
                if size < 40:
                    raise ValueError("extensible fmt chunk too small")
                cb = struct.unpack_from("<H", data, body_start + 16)[0]
                if cb < 22:
                    raise ValueError("extensible fmt missing subformat")
                guid = data[body_start + 24 : body_start + 40]
                if guid != _PCM_GUID:
                    raise ValueError("non-PCM extensible subformat")
                tag = 1
            if tag != 1:
                raise ValueError(f"unsupported wFormatTag {tag}")
            if bits not in (8, 16):
                raise ValueError(f"unsupported bit depth {bits}")
            if ch < 1 or ch > 64:
                raise ValueError(f"implausible channel count {ch}")
            if sr < 1:
                raise ValueError("zero sample rate")
            if block != ch * (bits // 8):
                raise ValueError("block align mismatch")
            fmt = (ch, sr, bits)
        elif cid == b"data":
            pcm = data[body_start : body_start + size]
        pos = body_start + size + (size & 1)  # RIFF chunks word-align
    if fmt is None:
        raise ValueError("missing fmt chunk")
    if pcm is None:
        raise ValueError("missing data chunk")
    ch, sr, bits = fmt
    width = bits // 8
    usable = len(pcm) - len(pcm) % (ch * width)
    if usable == 0:
        raise ValueError("empty data chunk")
    if bits == 16:
        arr = np.frombuffer(pcm, dtype="<i2", count=usable // 2).astype(
            np.int16
        )
    else:
        arr = (
            np.frombuffer(pcm, dtype=np.uint8, count=usable).astype(np.int16)
            - 128
        ) << 8
    return arr.reshape(-1, ch), sr


def tone_wave(seed: int, n_samples: int = 4096, sample_rate: int = 16000) -> np.ndarray:
    """Deterministic int16 test waveform: a seeded mix of three
    sinusoids + low-level noise — real audio structure (periodicity,
    bounded peak) so features like zero-crossing rate are meaningful,
    reproducible from the seed alone for corpus generation and oracle
    enumeration."""
    rng = np.random.default_rng(seed)
    t = np.arange(n_samples, dtype=np.float64) / sample_rate
    wave = np.zeros(n_samples, dtype=np.float64)
    for _ in range(3):
        f = float(rng.uniform(80.0, 3500.0))
        a = float(rng.uniform(0.1, 0.3))
        ph = float(rng.uniform(0.0, 2.0 * np.pi))
        wave += a * np.sin(2.0 * np.pi * f * t + ph)
    wave += rng.normal(0.0, 0.01, n_samples)
    return np.clip(wave * 32767.0, -32768, 32767).astype(np.int16)
