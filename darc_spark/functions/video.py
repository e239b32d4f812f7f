"""MJPEG frame extraction — the real video decode path.

Motion-JPEG is the simplest real video encoding a crawler meets (IP
cameras, ``multipart/x-mixed-replace`` streams, AVI/MJPG payloads): the
stream is baseline JPEG frames back to back. Splitting is exact, not
heuristic: inside JPEG entropy data every 0xFF byte is stuffed as
``FF 00`` (or is a marker), so a raw ``FF D9`` (EOI) scan finds true
frame boundaries, and each frame decodes with the from-spec codec
(:mod:`darc_spark.functions.jpeg` — PIL fast path when importable).

This replaces the round-4 deterministic fake frame decoder; container
formats beyond concatenated/AVI-wrapped MJPEG (mp4/h264 etc.) need a
real media library and stay out of scope for this dependency-free
build — a deployment swaps :func:`split_mjpeg` + ``decode_jpeg`` for
pyav/ffmpeg behind the same ``sample_frames`` contract.

Reference analogue: darc saves media bodies as opaque blobs
(darc/save.py:118-133); frame extraction is the downstream consumer.
"""

from __future__ import annotations

import numpy as np

_SOI = b"\xff\xd8"
_EOI = b"\xff\xd9"


def split_mjpeg(payload: bytes) -> list[bytes]:
    """Concatenated-JPEG stream → list of single-JPEG byte strings.

    Walks SOI→EOI spans; bytes between frames (multipart boundaries,
    AVI chunk headers) are skipped. Raises ``ValueError`` if no
    complete frame is present."""
    frames: list[bytes] = []
    pos = 0
    n = len(payload)
    while True:
        start = payload.find(_SOI, pos)
        if start < 0:
            break
        end = payload.find(_EOI, start + 2)
        if end < 0:
            break  # torn final frame — keep the complete ones
        frames.append(payload[start : end + 2])
        pos = end + 2
        if pos >= n:
            break
    if not frames:
        raise ValueError("no complete JPEG frame in MJPEG stream")
    return frames


def sample_frame_indices(n_available: int, n_frames: int) -> list[int]:
    """Evenly spaced frame picks (first frame always included) — the
    standard video-sampling shape, deterministic."""
    if n_available <= 0:
        return []
    k = min(n_frames, n_available)
    return sorted({(i * n_available) // k for i in range(k)})


def frame_pixels(payload: bytes, n_frames: int) -> list[tuple[int, np.ndarray]]:
    """Decode the sampled frames of an MJPEG payload:
    [(frame_index, HxWx3 uint8), ...]. Pure (shared by the distributed
    operator and driver-side oracle enumeration). Raises ValueError on
    malformed payloads — callers map that to a never-throw error row."""
    from darc_spark.functions.images import decode_jpeg

    frames = split_mjpeg(payload)
    return [
        (i, decode_jpeg(frames[i]))
        for i in sample_frame_indices(len(frames), n_frames)
    ]
