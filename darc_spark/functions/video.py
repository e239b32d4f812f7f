"""MJPEG frame extraction — the real video decode path.

Motion-JPEG is the simplest real video encoding a crawler meets, in two
wire shapes:

* **raw streams** (IP cameras, ``multipart/x-mixed-replace``): JPEG
  frames back to back, split by exact SOI/EOI scan — inside JPEG
  entropy data every 0xFF byte is stuffed as ``FF 00`` (or is a
  marker), so a raw ``FF D9`` (EOI) scan finds true frame boundaries
  (:func:`split_mjpeg`);
* **AVI/MJPG containers** (``video/x-msvideo`` downloads): a RIFF file
  whose ``movi`` LIST holds one JPEG per ``..dc`` chunk. These are
  chunk-walked properly (:func:`split_avi_mjpg`) rather than raw-
  scanned, because bytes OUTSIDE the movi list (the ``idx1`` index,
  header fields) can legally contain spurious FF D8/FF D9 pairs.

Each frame decodes with the from-spec codec
(:mod:`darc_spark.functions.jpeg` — PIL fast path when importable).

This replaces the round-4 deterministic fake frame decoder; container
formats beyond MJPEG (mp4/h264 etc.) need a real media library and
stay out of scope for this dependency-free build — a deployment swaps
:func:`split_frames` + ``decode_jpeg`` for pyav/ffmpeg behind the same
``sample_frames`` contract.

Reference analogue: darc saves media bodies as opaque blobs
(darc/save.py:118-133); frame extraction is the downstream consumer.
"""

from __future__ import annotations

import struct

import numpy as np

_SOI = b"\xff\xd8"
_EOI = b"\xff\xd9"


def _frame_end(payload: bytes, start: int) -> int | None:
    """End offset (exclusive) of the JPEG frame starting at ``start``
    (which must point at SOI), or None if the frame is torn.

    Marker-structure walk, not a raw EOI scan: marker SEGMENT payloads
    are NOT byte-stuffed — an EXIF APP1 routinely embeds a whole
    thumbnail JPEG (its own SOI..EOI), and DQT/DHT bytes can equal
    FF D9 — so lengths must be honored up to SOS. Only from SOS onward
    is entropy data stuffed (FF 00) and a bare FF D9 a true frame end."""
    n = len(payload)
    pos = start + 2
    while True:
        # --- marker segments until SOS/EOI ---
        while True:
            if pos + 2 > n:
                return None
            if payload[pos] != 0xFF:
                return None  # not a marker where one must be: corrupt
            marker = payload[pos + 1]
            if marker == 0xD9:  # EOI before any scan (header-only JPEG)
                return pos + 2
            if marker == 0xDA:  # SOS
                if pos + 4 > n:
                    return None
                seg_len = struct.unpack_from(">H", payload, pos + 2)[0]
                pos += 2 + seg_len
                break
            if 0xD0 <= marker <= 0xD7 or marker == 0x01:  # RSTn/TEM: bare
                pos += 2
                continue
            if pos + 4 > n:
                return None
            seg_len = struct.unpack_from(">H", payload, pos + 2)[0]
            if seg_len < 2:
                return None
            pos += 2 + seg_len  # skips any embedded-thumbnail FF D9
        # --- entropy-coded data: FF is stuffed (FF 00) or a marker ---
        while True:
            ff = payload.find(b"\xff", pos)
            if ff < 0 or ff + 2 > n:
                return None  # torn scan
            nxt = payload[ff + 1]
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:  # stuffing / RSTn
                pos = ff + 2
                continue
            if nxt == 0xD9:  # true EOI
                return ff + 2
            if nxt == 0xFF:  # fill byte run
                pos = ff + 1
                continue
            # another marker (DNL, or a new scan's tables/SOS):
            # back to the marker-segment walk
            pos = ff
            break


def split_mjpeg(payload: bytes) -> list[bytes]:
    """Concatenated-JPEG stream → list of single-JPEG byte strings.

    Finds each SOI then walks that frame's marker structure to its true
    EOI (:func:`_frame_end` — EXIF thumbnails and table payloads may
    legally contain FF D9 bytes, so segment lengths are honored); bytes
    between frames (multipart boundaries, AVI chunk headers) are
    skipped. A torn final frame is dropped; a frame whose structure is
    corrupt past SOI ends the stream (keep the complete leading
    frames). Raises ``ValueError`` if no complete frame is present."""
    frames: list[bytes] = []
    pos = 0
    n = len(payload)
    while True:
        start = payload.find(_SOI, pos)
        if start < 0:
            break
        end = _frame_end(payload, start)
        if end is None:
            break  # torn/corrupt tail — keep the complete ones
        frames.append(payload[start:end])
        pos = end
        if pos >= n:
            break
    if not frames:
        raise ValueError("no complete JPEG frame in MJPEG stream")
    return frames


def split_avi_mjpg(payload: bytes) -> list[bytes] | None:
    """AVI/MJPG container → list of single-JPEG byte strings, or None
    if ``payload`` is not an AVI RIFF file.

    Walks the RIFF chunk tree (word-aligned, same rule as the WAV
    parser) to the ``movi`` LIST and collects video chunks (fourcc
    ``##dc``/``##db``, optionally nested in ``rec `` LISTs) whose body
    starts with SOI — never a raw byte scan, so index or header bytes
    that happen to contain FF D8/FF D9 can't produce phantom frames. A
    torn ``movi`` list yields its complete leading frames (same
    keep-the-complete-frames recovery as :func:`split_mjpeg`). Raises
    ``ValueError`` if the container holds no complete JPEG frame."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        return None
    riff_size = struct.unpack_from("<I", payload, 4)[0]
    end = min(len(payload), 8 + riff_size)
    frames: list[bytes] = []

    def collect(pos: int, stop: int) -> None:
        while pos + 8 <= stop:
            cid = payload[pos : pos + 4]
            size = struct.unpack_from("<I", payload, pos + 4)[0]
            body = pos + 8
            torn = body + size > stop
            if cid == b"LIST" and min(body + size, stop) - body >= 4:
                ltype = payload[body : body + 4]
                if ltype in (b"movi", b"rec "):
                    # descend even when torn: complete inner frames keep
                    collect(body + 4, min(body + size, stop))
            elif (
                not torn
                and cid[2:4] in (b"dc", b"db")
                and cid[:2].isdigit()
                and payload[body : body + 2] == _SOI
            ):
                frames.append(payload[body : body + size])
            if torn:
                break
            pos = body + size + (size & 1)

    collect(12, end)
    if not frames:
        raise ValueError("no complete JPEG frame in AVI/MJPG container")
    return frames


def encode_avi_mjpg(
    frames: list[bytes], width: int, height: int, fps: int = 25
) -> bytes:
    """JPEG frame list → minimal spec-valid AVI/MJPG container
    (hdrl with avih + vids/MJPG strl, movi with ``00dc`` chunks, idx1).
    Deterministic; used for corpus generation and round-trip tests."""

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) % 2 else b""
        )

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    max_size = max((len(f) for f in frames), default=0)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps, max_size * fps, 0, 0x10,  # HASINDEX
        len(frames), 0, 1, max_size, width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vidsMJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(frames),
                      max_size, 0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(
        b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)
    ))
    movi_body = b"movi"
    offsets = []
    for f in frames:
        offsets.append(len(movi_body))  # offset of the 00dc fourcc in movi
        movi_body += chunk(b"00dc", f)
    movi = chunk(b"LIST", movi_body)
    idx1 = b"".join(
        b"00dc" + struct.pack("<III", 0x10, off, len(f))  # AVIIF_KEYFRAME
        for off, f in zip(offsets, frames)
    )
    body = b"AVI " + hdrl + movi + chunk(b"idx1", idx1)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def split_frames(payload: bytes) -> list[bytes]:
    """Container-aware frame split: AVI/MJPG RIFF walk when the payload
    is an AVI file, exact SOI/EOI scan otherwise (raw / multipart
    MJPEG). Raises ``ValueError`` when no complete frame exists."""
    frames = split_avi_mjpg(payload)
    return frames if frames is not None else split_mjpeg(payload)


def sample_frame_indices(n_available: int, n_frames: int) -> list[int]:
    """Evenly spaced frame picks (first frame always included) — the
    standard video-sampling shape, deterministic."""
    if n_available <= 0:
        return []
    k = min(n_frames, n_available)
    return sorted({(i * n_available) // k for i in range(k)})


def frame_pixels(payload: bytes, n_frames: int) -> list[tuple[int, np.ndarray]]:
    """Decode the sampled frames of a video payload:
    [(frame_index, HxWx3 uint8), ...]. Containers: animated GIF
    (container == codec, composited frames), AVI/MJPG RIFF, raw or
    multipart MJPEG. Pure (shared by the distributed operator and
    driver-side oracle enumeration). Raises ValueError on malformed
    payloads — callers map that to a never-throw error row."""
    from darc_spark.functions.images import decode_jpeg

    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from darc_spark.functions.gif import gif_frames

        gfs = gif_frames(payload)
        return [
            (i, gfs[i]) for i in sample_frame_indices(len(gfs), n_frames)
        ]
    frames = split_frames(payload)
    return [
        (i, decode_jpeg(frames[i]))
        for i in sample_frame_indices(len(frames), n_frames)
    ]
