"""White/black-list predicates as native Spark Column expressions.

Reference semantics (``darc/parse.py:62-155``): black list first, then
white list, then a fallback flag; ``script`` proxies are always dropped;
a null hostname is always dropped. All three return a **drop?** boolean.

These compile to pure Catalyst expressions (``isin`` / anchored
``rlike`` / ``when``) — no Python, fully pushdown-able, and on a real
cluster the regex lists are constant-folded into the scan filter.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F


def _any_fullmatch(col: Column, patterns: list[str]) -> Column:
    """OR of anchored regex fullmatches (re.fullmatch ≡ ^(?:pat)$)."""
    if not patterns:
        return F.lit(False)
    return reduce(
        lambda a, b: a | b,
        [col.rlike(f"^(?:{p})$") for p in patterns],
    )


def match_proxy_drop(
    proxy: Column,
    white_list: list[str] | None = None,
    black_list: list[str] | None = None,
    fallback: bool = False,
) -> Column:
    """drop? by proxy type (darc/parse.py:62-93). Literal membership."""
    white = list(white_list or [])
    black = list(black_list or [])
    return (
        F.when(proxy == "script", F.lit(True))
        .when(proxy.isin(black) if black else F.lit(False), F.lit(True))
        .when(proxy.isin(white) if white else F.lit(False), F.lit(False))
        .otherwise(F.lit(fallback))
    )


def match_host_drop(
    host: Column,
    white_list: list[str] | None = None,
    black_list: list[str] | None = None,
    fallback: bool = False,
) -> Column:
    """drop? by hostname regex fullmatch (darc/parse.py:96-128)."""
    return (
        F.when(host.isNull(), F.lit(True))
        .when(_any_fullmatch(host, list(black_list or [])), F.lit(True))
        .when(_any_fullmatch(host, list(white_list or [])), F.lit(False))
        .otherwise(F.lit(fallback))
    )


def match_mime_drop(
    mime: Column,
    white_list: list[str] | None = None,
    black_list: list[str] | None = None,
    fallback: bool = False,
) -> Column:
    """drop? by content type regex fullmatch (darc/parse.py:131-155)."""
    return (
        F.when(_any_fullmatch(mime, list(black_list or [])), F.lit(True))
        .when(_any_fullmatch(mime, list(white_list or [])), F.lit(False))
        .otherwise(F.lit(fallback))
    )


def normalize_content_type(ct: Column) -> Column:
    """casefold + strip parameters (darc/parse.py:276-302)."""
    return F.trim(F.lower(F.split_part(ct, F.lit(";"), F.lit(1))))
