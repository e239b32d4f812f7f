"""Data-URI decode (C10) and HEAD precheck (F6) coverage."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from darc_spark.functions.extract import decode_data_uris
from darc_spark.operators.crawl import Crawler, CrawlConfig
from darc_spark.sources.synth import SynthWeb


def test_decode_data_uris(spark):
    df = spark.createDataFrame(
        [
            ("data:text/plain;base64,SGVsbG8=",),
            ("data:,plain%20text",),
            ("data:image/png;base64,QUJD",),
            ("http://not-a-data-uri.example/",),
            ("data:application/json,{\"a\":1}",),
        ],
        "url string",
    )
    rows = {r["url"]: r for r in decode_data_uris(df).collect()}
    r = rows["data:text/plain;base64,SGVsbG8="]
    assert r["data_mime"] == "text/plain" and bytes(r["data_payload"]) == b"Hello"
    r = rows["data:,plain%20text"]
    assert r["data_mime"] == "text/plain" and bytes(r["data_payload"]) == b"plain text"
    assert rows["data:image/png;base64,QUJD"]["data_mime"] == "image/png"
    assert rows["http://not-a-data-uri.example/"]["data_payload"] is None
    assert (
        bytes(rows['data:application/json,{"a":1}']["data_payload"]) == b'{"a":1}'
    )
    # pure JVM plan — no Python stage
    from darc_spark.plans import assert_no_python

    assert_no_python(decode_data_uris(df))


def test_synth_head_matches_page():
    web = SynthWeb(seed=42, pages_per_host=40)
    for host in web.hosts[:3]:
        for pid in range(20):
            url = web.url(host, pid)
            status, ct = web.head(url)
            page = web.page(url)
            assert status == page["status_code"], url
            assert ct == page["content_type"], url


def test_check_ng_blocks_mime_filtered_links(spark, tmp_path):
    """With CHECK_NG on and image/png blacklisted, extracted links whose
    HEAD reports image/png never enter the frontier."""
    web = SynthWeb(seed=42, pages_per_host=40, branching=3)
    crawler = Crawler(
        spark,
        str(tmp_path / "s"),
        web,
        CrawlConfig(
            per_host=6,
            lease=2,
            max_retries=0,
            selenium_enabled=False,
            check_ng=True,
            mime_black=(r"image/png",),
        ),
    )
    crawler.seed(web.seeds())
    crawler.run(2)
    pending_urls = [
        r["url"] for r in crawler.fr_req.pending(99).select("url").collect()
    ]
    assert pending_urls, "crawl discovered nothing"
    for url in pending_urls:
        _, ct = web.head(url)
        assert ct != "image/png", url
