"""From-spec GIF87a/GIF89a codec — pure Python + numpy, no deps.

The third of the three dominant still-image formats a web crawl meets
(JPEG/PNG/GIF); reference analogue: darc archives fetched image bodies
as opaque blobs (darc/model/web/requests.py:50) — this engine decodes
them for the per-row pixel invariants and phash dedup.

Implements the GIF89a specification (CompuServe, 1990-07-31):

* LZW decompression with variable code width (3..12 bits, LSB-first
  packing), the KwKwK case, early code-width growth, 4096-entry table
  cap with deferred-clear handling.
* Logical screen + global/local color tables, multiple image
  descriptors (animation), Graphic Control Extension (transparency
  index, disposal methods 0-3), interlaced row ordering (the 8/8/4/2
  four-pass scheme), comment/application/plain-text extension skipping.
* A real LZW *encoder* (dictionary-building, emits Clear on table
  overflow) for the test corpus and synthetic payloads — GIF is
  lossless for palette-native (≤256-color) content, so roundtrips are
  exact.

Decode contract: any malformed/truncated stream raises ``ValueError``
(never IndexError/KeyError/struct.error) so Spark-side decode UDFs
surface clean per-row rejections, same contract as
:mod:`darc_spark.functions.jpeg`.
"""

from __future__ import annotations

import struct

import numpy as np

# interlace passes: (row offset, row step) per the GIF89a appendix E
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


# ---------------------------------------------------------------------------
# LZW (GIF variant)


def _lzw_decode(blocks: bytes, min_code_size: int, n_pixels: int) -> bytes:
    """GIF LZW: variable width starting at min_code_size+1, LSB-first.

    Stops after ``n_pixels`` output bytes (streams may legally carry a
    partial trailing code) or at the EOI code.
    """
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # table as bytes entries; rebuilt on Clear
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    prev: bytes | None = None

    acc = 0
    nbits = 0
    pos = 0
    data = blocks
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("malformed GIF: LZW stream truncated")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("malformed GIF: first LZW code not literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError("malformed GIF: LZW code out of range")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            # width grows when the NEXT code would not fit; capped at 12
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return bytes(out[:n_pixels])


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF LZW encoder: emits Clear up-front and on table overflow."""
    clear = 1 << min_code_size
    eoi = clear + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    prefix = b""
    for b in indices:
        cand = prefix + bytes([b])
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix], width)
        if next_code < 4096:
            table[cand] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = bytes([b])
    if prefix:
        emit(table[prefix], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# container


def _sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate data sub-blocks starting at ``pos``; returns
    (payload, position after the 0x00 terminator)."""
    out = bytearray()
    while True:
        if pos >= len(data):
            raise ValueError("malformed GIF: unterminated sub-blocks")
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(data):
            raise ValueError("malformed GIF: sub-block overruns stream")
        out += data[pos : pos + n]
        pos += n


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    h = idx.shape[0]
    rows = []
    for off, step in _INTERLACE:
        rows.extend(range(off, h, step))
    out = np.empty_like(idx)
    out[np.array(rows, dtype=np.int64)] = idx
    return out


def gif_frames(data: bytes) -> list[np.ndarray]:
    """Decode EVERY frame, composited onto the logical screen —
    (H, W, 3) uint8 each. Raises ``ValueError`` on malformed input."""
    try:
        return _gif_frames(data)
    except ValueError:
        raise
    except (IndexError, KeyError, struct.error, OverflowError) as exc:
        raise ValueError(
            f"malformed GIF: {type(exc).__name__}: {exc}"
        ) from exc


def _gif_frames(data: bytes) -> list[np.ndarray]:
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("malformed GIF: bad signature")
    w, h, packed, bg, _aspect = struct.unpack_from("<HHBBB", data, 6)
    if w == 0 or h == 0:
        raise ValueError("malformed GIF: zero-size logical screen")
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8)
        if gct.size != 3 * n:
            raise ValueError("malformed GIF: truncated global color table")
        gct = gct.reshape(n, 3)
        pos += 3 * n

    frames: list[np.ndarray] = []
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None and bg < len(gct):
        canvas[:, :] = gct[bg]
    transparent = -1
    disposal = 0
    while True:
        if pos >= len(data):
            raise ValueError("malformed GIF: missing trailer")
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(data):
                raise ValueError("malformed GIF: truncated extension")
            label = data[pos]
            pos += 1
            payload, pos = _sub_blocks(data, pos)
            if label == 0xF9 and len(payload) >= 4:  # Graphic Control
                flags = payload[0]
                disposal = (flags >> 2) & 0x07
                transparent = payload[3] if flags & 0x01 else -1
            continue
        if block != 0x2C:
            raise ValueError(f"malformed GIF: unknown block 0x{block:02x}")
        # image descriptor
        left, top, fw, fh, fpacked = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        if fw == 0 or fh == 0 or left + fw > w or top + fh > h:
            raise ValueError("malformed GIF: frame rect outside screen")
        pal = gct
        if fpacked & 0x80:
            n = 2 << (fpacked & 0x07)
            pal = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8)
            if pal.size != 3 * n:
                raise ValueError("malformed GIF: truncated local color table")
            pal = pal.reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("malformed GIF: no color table for frame")
        if pos >= len(data):
            raise ValueError("malformed GIF: missing LZW min code size")
        mcs = data[pos]
        pos += 1
        if not 2 <= mcs <= 11:
            raise ValueError(f"malformed GIF: LZW min code size {mcs}")
        blocks, pos = _sub_blocks(data, pos)
        idx = np.frombuffer(
            _lzw_decode(blocks, mcs, fw * fh), dtype=np.uint8
        ).reshape(fh, fw)
        if fpacked & 0x40:
            idx = _deinterlace(idx)
        if int(idx.max()) >= len(pal):
            raise ValueError("malformed GIF: pixel index outside palette")
        region = canvas[top : top + fh, left : left + fw]
        rgb = pal[idx]
        if transparent >= 0:
            mask = idx != transparent
            region[mask] = rgb[mask]
        else:
            region[:, :] = rgb
        frames.append(canvas.copy())
        if disposal == 2:  # restore to background
            bgc = gct[bg] if gct is not None and bg < len(gct) else 0
            canvas[top : top + fh, left : left + fw] = bgc
        transparent = -1
        disposal = 0
    if not frames:
        raise ValueError("malformed GIF: no image data")
    return frames


def decode_gif(data: bytes) -> np.ndarray:
    """First composited frame as (H, W, 3) uint8."""
    try:
        return _gif_frames(data)[0]
    except ValueError:
        raise
    except (IndexError, KeyError, struct.error, OverflowError) as exc:
        raise ValueError(
            f"malformed GIF: {type(exc).__name__}: {exc}"
        ) from exc


# ---------------------------------------------------------------------------
# encoder


def _build_palette(frames: list[np.ndarray]) -> tuple[np.ndarray, dict]:
    colors = np.unique(
        np.concatenate([f.reshape(-1, 3) for f in frames], axis=0), axis=0
    )
    if len(colors) > 256:
        raise ValueError(
            f"GIF needs a <=256-color palette, got {len(colors)}"
        )
    lut = {tuple(int(x) for x in c): i for i, c in enumerate(colors)}
    return colors, lut


def _indices(frame: np.ndarray, palette: np.ndarray) -> bytes:
    # exact-match palettization via a 24-bit key table
    key = (
        palette[:, 0].astype(np.int64) << 16
        | palette[:, 1].astype(np.int64) << 8
        | palette[:, 2].astype(np.int64)
    )
    flat = frame.reshape(-1, 3).astype(np.int64)
    fkey = flat[:, 0] << 16 | flat[:, 1] << 8 | flat[:, 2]
    order = np.argsort(key)
    pos = np.searchsorted(key[order], fkey)
    return order[pos].astype(np.uint8).tobytes()


def _chunk(payload: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(payload), 255):
        part = payload[i : i + 255]
        out.append(len(part))
        out += part
    out.append(0)
    return bytes(out)


def encode_gif_frames(
    frames: list[np.ndarray], interlace: bool = False
) -> bytes:
    """Encode full-canvas RGB frames (all the same shape, ≤256 distinct
    colors across the set) as an (animated if len>1) GIF89a. Lossless:
    ``gif_frames(encode_gif_frames(fs))`` is pixel-exact."""
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    palette, _ = _build_palette(frames)
    n = len(palette)
    bits = max(2, int(n - 1).bit_length())
    pal = np.zeros((1 << bits, 3), dtype=np.uint8)
    pal[:n] = palette
    mcs = bits

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += pal.tobytes()
    if len(frames) > 1:
        # Netscape 2.0 loop-forever application extension
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("all frames must share the canvas shape")
        if len(frames) > 1:
            out += b"\x21\xf9\x04\x00\x04\x00\x00\x00"  # GCE, 4cs delay
        fpacked = 0x40 if interlace else 0x00
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, fpacked)
        idx = np.frombuffer(_indices(f, pal[:n]), dtype=np.uint8).reshape(
            h, w
        )
        if interlace:
            rows = []
            for off, step in _INTERLACE:
                rows.extend(range(off, h, step))
            idx = idx[np.array(rows, dtype=np.int64)]
        out.append(mcs)
        out += _chunk(_lzw_encode(idx.tobytes(), mcs))
    out += b"\x3b"
    return bytes(out)


def encode_gif(arr: np.ndarray, interlace: bool = False) -> bytes:
    """Single-frame lossless GIF of a ≤256-color RGB array."""
    return encode_gif_frames([arr], interlace=interlace)
