"""Content-type sniffing fallback (darc/parse.py:276-302): a response
with no Content-Type header is routed by body sniffing — header-less
HTML goes down the HTML branch (links extracted), binary magic maps to
its MIME, and an unsniffable body falls back to "(null)" → generic."""

from __future__ import annotations

import pandas as pd

from darc_spark.functions.sniff import sniff_mime, sniff_one
from darc_spark.operators.fetch import run_fetch


def test_sniff_one_magic_and_text():
    assert sniff_one(None, b"\x89PNG\r\n\x1a\n" + b"\x00" * 8) == "image/png"
    assert sniff_one(None, b"\xff\xd8\xff\xe0rest") == "image/jpeg"
    assert sniff_one(None, b"GIF89a;;;") == "image/gif"
    assert sniff_one(None, b"RIFF\x00\x00\x00\x00WEBPVP8 ") == "image/webp"
    assert sniff_one(None, b"RIFF\x00\x00\x00\x00WAVEfmt ") == "(null)"
    assert sniff_one(None, b"%PDF-1.4") == "application/pdf"
    assert sniff_one("<!DOCTYPE html><html></html>", None) == "text/html"
    assert sniff_one("  <html><body>x</body></html>", None) == "text/html"
    assert sniff_one('<?xml version="1.0"?><urlset/>', None) == "text/xml"
    assert sniff_one("just words", None) == "text/plain"
    assert sniff_one("", None) == "(null)"
    assert sniff_one(None, None) == "(null)"
    # blob wins over text (reference sniffs response.content)
    assert sniff_one("<html>", b"\x89PNG\r\n\x1a\nxx") == "image/png"


def test_sniff_mime_vector():
    out = sniff_mime(
        pd.Series(["<html>x</html>", "words", ""]),
        pd.Series([None, None, b"%PDF-"]),
    )
    assert list(out) == ["text/html", "text/plain", "application/pdf"]


def _claimed(spark, urls):
    rows = [
        (f"name{i}", u, "http", "null", "h.example", "h.example", None, 0, 0, 0)
        for i, u in enumerate(urls)
    ]
    return spark.createDataFrame(
        rows,
        "name string, url string, scheme string, proxy string, host string,"
        " hostname string, backref string, priority int, retry_count int,"
        " enqueue_round long",
    )


def test_headerless_routing_through_fetch(spark):
    # local function: cloudpickle ships it by VALUE into the UDF closure
    # (a module-level function would be pickled by reference, and
    # executors can't import the tests package)
    def _pages(urls: pd.Series) -> pd.DataFrame:
        """Header-less responses: content_type None throughout."""
        rows = []
        for u in urls.astype(str):
            body, blob = "", None
            if u.endswith("/html"):
                body = '<html><body><a href="/p/1">x</a><a href="/p/2">y</a></body></html>'
            elif u.endswith("/plain"):
                body = "plain words"
            elif u.endswith("/png"):
                blob = b"\x89PNG\r\n\x1a\n" + b"\x00" * 16
            rows.append(
                {
                    "status_code": 200,
                    "content_type": None,  # the missing header
                    "html": body,
                    "bytes": blob,
                    "image_id": None,
                    "fmt": None,
                    "caption": None,
                    "w": None,
                    "h": None,
                    "phash": None,
                }
            )
        df = pd.DataFrame(rows, index=urls.index)
        df["phash"] = pd.array([None] * len(rows), dtype="Int64")
        return df

    urls = [
        "http://h.example/html",
        "http://h.example/plain",
        "http://h.example/png",
        "http://h.example/empty",
    ]
    out = run_fetch(_claimed(spark, urls), _pages).select(
        "url", "content_type", "is_html", "empty_body", "links", "body_text"
    )
    got = {r["url"].rsplit("/", 1)[1]: r for r in out.collect()}
    assert got["html"]["content_type"] == "text/html"
    assert got["html"]["is_html"] is True
    assert len(got["html"]["links"]) == 2  # HTML branch: links extracted
    assert got["plain"]["content_type"] == "text/plain"
    assert got["plain"]["is_html"] is False
    assert got["plain"]["body_text"] == "plain words"  # text/* body kept
    assert got["png"]["content_type"] == "image/png"
    assert got["png"]["is_html"] is False
    assert got["empty"]["content_type"] == "(null)"  # magic-failure fallback
    assert got["empty"]["is_html"] is False
