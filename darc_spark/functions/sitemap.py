"""Sitemap XML parsing + recursive sitemap-index expansion.

Reference: ``fetch_sitemap`` recursion (``darc/proxy/null.py:231-332``),
``get_sitemap``/``read_sitemap`` (``darc/proxy/null.py:174-228``), gzip
handling (``darc/proxy/null.py:314-318``).

Spark-first: one batched parser emits both page ``loc``s and child
sitemap ``loc``s per document; the recursion over sitemap indexes is a
driver-side BFS over DataFrames (bounded depth), each level fully
parallel — the reference recurses per URL in Python.
"""

from __future__ import annotations

import gzip
import re
from urllib.parse import urljoin

import pandas as pd
import xml.etree.ElementTree as ET

_TAG_RE = re.compile(r"\{[^}]*\}")  # strip XML namespaces


def _localname(tag: str) -> str:
    return _TAG_RE.sub("", tag).lower()


def maybe_gunzip(data: bytes) -> bytes:
    """Transparent gunzip (darc/proxy/null.py:314-318)."""
    if data[:2] == b"\x1f\x8b":
        try:
            return gzip.decompress(data)
        except OSError:
            return data
    return data


def parse_sitemap_one(sitemap_url: str, content: str | bytes) -> tuple[list[str], list[str]]:
    """One sitemap document → (page_urls, child_sitemap_urls), absolutized."""
    if isinstance(content, bytes):
        content = maybe_gunzip(content).decode("utf-8", errors="replace")
    if not content or not content.strip():
        return [], []
    try:
        root = ET.fromstring(content)
    except ET.ParseError:
        return [], []
    pages: list[str] = []
    children: list[str] = []
    root_tag = _localname(root.tag)
    for child in root:
        ctag = _localname(child.tag)
        for loc in child:
            if _localname(loc.tag) != "loc" or loc.text is None:
                continue
            target = urljoin(sitemap_url, loc.text.strip())
            if root_tag == "sitemapindex" and ctag == "sitemap":
                children.append(target)
            elif root_tag == "urlset" and ctag == "url":
                pages.append(target)
    return pages, children


def parse_sitemaps_batch(
    sitemap_urls: pd.Series, contents: pd.Series
) -> pd.DataFrame:
    """Batch → rows (sitemap_url, loc, is_index_child)."""
    rows = []
    for url, content in zip(sitemap_urls.astype(str), contents):
        if content is None or (isinstance(content, float) and pd.isna(content)):
            continue
        pages, children = parse_sitemap_one(url, content)
        rows.extend({"sitemap_url": url, "loc": p, "is_index": False} for p in pages)
        rows.extend({"sitemap_url": url, "loc": c, "is_index": True} for c in children)
    return pd.DataFrame(rows, columns=["sitemap_url", "loc", "is_index"])
