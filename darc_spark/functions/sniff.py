"""Content-type sniffing fallback.

Reference ``get_content_type`` (darc/parse.py:276-302): when the
``Content-Type`` header is absent, the body is sniffed with libmagic,
falling back to ``"(null)"`` if detection fails. This is a
dependency-free magic-bytes/heuristic sniffer covering the types the
engine actually routes on (HTML vs text vs binary); anything else maps
to ``"(null)"`` exactly like the reference's failure path, which sends
the page down the generic (non-HTML) branch.

Cold path by construction: it only runs on rows whose header was
missing — the hot fetch path never calls it.
"""

from __future__ import annotations

import re

import pandas as pd

# magic-byte prefixes → MIME (the subset libmagic would report for the
# payloads this engine carries)
_MAGIC: list[tuple[bytes, str]] = [
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF87a", "image/gif"),
    (b"GIF89a", "image/gif"),
    (b"RIFF", "image/webp"),  # RIFF....WEBP checked below
    (b"%PDF", "application/pdf"),
    (b"PK\x03\x04", "application/zip"),
    (b"\x1f\x8b", "application/gzip"),
]

_HTML_RE = re.compile(r"^\s*(?:<!doctype\s+html|<html|<head|<body)", re.IGNORECASE)
_XML_RE = re.compile(r"^\s*<\?xml\b", re.IGNORECASE)


def sniff_one(text: str | None, blob: bytes | None) -> str:
    """Sniff a single body: binary magic first, then text heuristics."""
    if blob:
        head = bytes(blob[:16])
        for prefix, mime in _MAGIC:
            if head.startswith(prefix):
                if mime == "image/webp" and head[8:12] != b"WEBP":
                    continue
                return mime
    if isinstance(text, str) and text:
        if _HTML_RE.match(text):
            return "text/html"
        if _XML_RE.match(text):
            return "text/xml"
        return "text/plain"
    return "(null)"


def sniff_mime(texts: pd.Series, blobs: pd.Series | None = None) -> pd.Series:
    """Row-wise sniff over the (small) missing-header subset."""
    if blobs is None:
        blobs = pd.Series([None] * len(texts), index=texts.index)
    return pd.Series(
        [
            sniff_one(t if isinstance(t, str) else None, b)
            for t, b in zip(texts, blobs)
        ],
        index=texts.index,
        dtype=object,
    )
