"""Batched link extraction from HTML and raw text.

Reference semantics: ``extract_links`` / ``extract_links_from_text``
(``darc/parse.py:305-374``) — every ``href``/``src`` attribute joined
against the page URL, plus regex extraction of bare URLs / emails /
bitcoin / ethereum addresses from text (URL pattern table
``darc/parse.py:40-59``; extensible via the equivalent of
``DARC_URL_PAT`` through :func:`register_url_pattern`).

Spark-first shape (north rule: *batch* extraction, no per-row Python on
the hot path): one Arrow-batched pandas UDF per document batch, emitting
``array<string>`` of absolute URLs, exploded downstream. The reference
parses with bs4/html5lib; that library is not in this container and a
full HTML5 tree is unnecessary for attribute harvesting — a compiled
attribute regex handles the href/src contract. urljoin is stdlib and
never throws here (tolerant wrappers, ``darc/link.py:85-106``).
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlsplit

import pandas as pd
from pyspark.sql import types as T
from pyspark.sql import functions as F

# href/src attribute values, single/double-quoted or bare
_ATTR_RE = re.compile(
    r"""(?:href|src)\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s"'<>`]+))""",
    re.IGNORECASE,
)
# html5lib-parity pre-passes: an attribute regex would otherwise harvest
# from markup the reference's tree parser never sees as elements —
# comments (bs4 Comment nodes) and raw text inside script/style
# (parsed as text, not tags). The reference does NOT honor <base href>
# for joining (bs4 applies no base resolution; darc/parse.py:322-329
# joins against link.url), and a <base href> element itself IS extracted
# (it has an href attribute) — both matched here.
_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
_SCRIPT_STYLE_RE = re.compile(
    r"(<(script|style)\b[^>]*>).*?(</\2\s*>)", re.S | re.I
)

# Text URL patterns — same contract as the reference's URL_PAT table
# (darc/parse.py:40-59; the http/mail patterns follow the public py-gfm
# autolink/automail expressions the reference cites).
URL_PAT: dict[str, re.Pattern[str]] = {
    "http": re.compile(
        r"(?i)\b(?P<url>(?:(?:ftp|https?|wss?|irc)://|www\d{0,3}[.])"
        r"(?:[^\s()<>]+|\(([^\s()<>]+|(\([^\s()<>]+\)))*\))+"
        r"(?:\(([^\s()<>]+|(\([^\s()<>]+\)))*\)|[^\s`!()\[\]{};:'\".,<>?«»“”‘’]))",
        re.ASCII,
    ),
    "mailto:": re.compile(
        r"(?i)\b(?P<url>(?:mailto:)?[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]+)\b", re.ASCII
    ),
    "bitcoin": re.compile(
        r"(?i)\b(?P<url>(?:(?:bitcoin|btc):)?[13][a-z0-9]{27,34})\b", re.ASCII
    ),
    "ethereum": re.compile(
        r"(?i)\b(?P<url>(?:(?:ethereum|eth):)?(?:0x)?[0-9a-f]{40})\b", re.ASCII
    ),
}


def register_url_pattern(scheme: str, pattern: str, flags: int = 0) -> None:
    """Extension point mirroring ``DARC_URL_PAT`` (darc/parse.py:58-59)."""
    URL_PAT[scheme] = re.compile(pattern, re.RegexFlag(flags) | re.ASCII)


def _safe_urljoin(base: str, href: str) -> str:
    try:
        return urljoin(base, href)
    except ValueError:
        return href


def extract_hrefs_one(page_url: str, html: str) -> list[str]:
    """All href/src targets of one document, absolutized against page_url."""
    if not html:
        return []
    html = _COMMENT_RE.sub(" ", html)
    html = _SCRIPT_STYLE_RE.sub(r"\1\3", html)
    out = []
    for m in _ATTR_RE.finditer(html):
        # empty quoted values count: href="" joins to the page itself
        # (bs4 .get returns "" and the reference urljoins it)
        href = next((g for g in m.groups() if g is not None), None)
        if href is None:
            continue
        out.append(_safe_urljoin(page_url, href))
    return out


def extract_text_urls_one(text: str) -> list[str]:
    """Bare URLs/emails/coin addresses in text (darc/parse.py:340-374).

    The reference iterates whitespace-split parts; the patterns contain no
    whitespace so finditer over parts == finditer over the whole string.
    A matched URL with no scheme gets the pattern's scheme prefixed.
    """
    if not text:
        return []
    out = []
    for part in text.split():
        for scheme, pattern in URL_PAT.items():
            for m in pattern.finditer(part):
                url = m.group("url")
                try:
                    has_scheme = bool(urlsplit(url).scheme)
                except ValueError:
                    has_scheme = False
                if not has_scheme:
                    url = f"{scheme}:{url}"
                out.append(url)
    return out


def extract_links_batch(
    page_urls: pd.Series, htmls: pd.Series, include_text: bool = True
) -> pd.Series:
    """Batch: (page_url, html) → list of absolute extracted URLs."""
    res = []
    for url, html in zip(page_urls.astype(str), htmls):
        html = html if isinstance(html, str) else ""
        links = extract_hrefs_one(url, html)
        if include_text:
            # reference extracts from soup.text; tag-stripped text
            text = re.sub(r"<[^>]*>", " ", html)
            links.extend(extract_text_urls_one(text))
        res.append(links)
    return pd.Series(res, index=page_urls.index, dtype=object)


@F.pandas_udf(T.ArrayType(T.StringType()))
def extract_links_udf(page_urls: pd.Series, htmls: pd.Series) -> pd.Series:
    return extract_links_batch(page_urls, htmls)


def decode_data_uris(df, url_col: str = "url"):
    """Decode ``data:`` URIs into (mime, is_base64, payload) columns.

    Reference: ``save_data`` (``darc/proxy/data.py:33-56``) — decodes the
    URI and writes the payload under ``misc/data/``. Here the decode is
    pure SQL (``regexp_extract`` + ``unbase64``/``url_decode`` never leave
    the JVM); rows that are not data URIs get nulls.
    """
    c = F.col(url_col)
    head = F.regexp_extract(c, r"^data:([^,]*),", 1)
    mime = F.when(
        head.endswith(";base64"),
        F.regexp_replace(head, r";base64$", ""),
    ).otherwise(head)
    mime = F.when(mime == "", F.lit("text/plain")).otherwise(mime)
    body = F.regexp_extract(c, r"^data:[^,]*,(.*)$", 1)
    is_b64 = head.endswith(";base64")
    payload = F.when(is_b64, F.try_to_binary(body, F.lit("base64"))).otherwise(
        F.encode(F.url_decode(body), "utf-8")
    )
    is_data = c.startswith("data:") & c.contains(",")
    return (
        df.withColumn("data_mime", F.when(is_data, mime))
        .withColumn("data_is_base64", F.when(is_data, is_b64))
        .withColumn("data_payload", F.when(is_data, payload))
    )
