"""End-to-end crawl equivalence vs the single-threaded oracle simulator.

SURVEY.md §5 item 3: identical seed list + politeness budget ⇒ equal
per-round fetch sets (crawl ordering), equal final URL-seen sets, equal
edges and special sinks. Plus per-row image invariants (§5 item 4) and
kill/resume state equality (§5 item 5).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from darc_spark.functions.images import decode_image, phash64, psnr
from darc_spark.operators.crawl import Crawler, CrawlConfig
from darc_spark.sources.synth import SynthWeb
from tests.oracle_crawler import SimCrawler

WEB = SynthWeb(seed=42, pages_per_host=60, branching=3)
CFG = CrawlConfig(
    per_host=4,
    lease=2,
    max_retries=1,
    salt_shards=4,
    n_filter_buckets=4,
    robots_enabled=True,
    selenium_enabled=True,
)
ROUNDS = 4


@pytest.fixture(scope="module")
def crawled(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("crawl") / "store")
    crawler = Crawler(spark, root, WEB, CFG)
    crawler.seed(WEB.seeds())
    crawler.run(ROUNDS)

    sim = SimCrawler(WEB, CFG)
    sim.seed(WEB.seeds())
    sim.run(ROUNDS)
    return crawler, sim


def _engine_fetches(crawler, table):
    return {
        (
            r["fetch_round"],
            r["hostname"],
            r["url"],
            r["status_code"],
            r["is_html"],
            r["n_links"],
        )
        for r in crawler.store.read(table)
        .select("fetch_round", "hostname", "url", "status_code", "is_html", "n_links")
        .collect()
    }


def test_fetch_sets_and_crawl_ordering(crawled):
    crawler, sim = crawled
    engine = _engine_fetches(crawler, "fetches")
    oracle = set(sim.fetches)
    assert engine == oracle, (
        f"missing={sorted(oracle - engine)[:5]} extra={sorted(engine - oracle)[:5]}"
    )


def test_selenium_fetch_sets(crawled):
    crawler, sim = crawled
    engine = _engine_fetches(crawler, "fetches_selenium")
    assert engine == set(sim.fetches_sel)


def test_final_url_seen_sets(crawled):
    crawler, sim = crawled
    engine_seen = {r["name"] for r in crawler.fr_req.seen().select("name").collect()}
    assert engine_seen == sim.fr_req.seen
    engine_sel = {r["name"] for r in crawler.fr_sel.seen().select("name").collect()}
    assert engine_sel == sim.fr_sel.seen


def test_edges_equal(crawled):
    crawler, sim = crawled
    engine = {
        (r["parent_name"], r["child_name"])
        for r in crawler.store.read("edges").select("parent_name", "child_name").collect()
    }
    assert engine == sim.edges


def test_special_sinks_equal(crawled):
    crawler, sim = crawled
    engine = {
        (r["kind"], r["url"])
        for r in crawler.store.read("special_links").select("kind", "url").collect()
    }
    assert engine == sim.special


def test_image_invariants(crawled):
    """input_hint: decoded-pixel PSNR≥40dB (lossy) / exact (lossless) +
    caption equality, per fetched payload row."""
    crawler, _ = crawled
    rows = (
        crawler.store.read("fetches")
        .filter(F.col("bytes").isNotNull())
        .select("url", "image_id", "bytes", "w", "h", "fmt", "caption", "phash")
        .collect()
    )
    assert rows, "no image payloads were fetched"
    for r in rows:
        orig = WEB.original_pixels(r["image_id"])
        dec = decode_image(bytes(r["bytes"]), r["fmt"])
        assert dec.shape == (r["h"], r["w"], 3)
        if r["fmt"] == "png":
            assert (dec == orig).all(), r["url"]
        else:
            assert psnr(orig, dec) >= 40.0, r["url"]
        assert r["phash"] == phash64(orig)
        page = WEB.page(r["url"])
        assert r["caption"] == page["caption"]


def test_response_metadata_persisted(crawled):
    """S9/W2 parity: every fetches row carries the response headers,
    cookies and redirect history exactly as the web served them
    (darc/save.py:136-220, darc/model/web/requests.py:66-103)."""
    crawler, _ = crawled
    rows = (
        crawler.store.read("fetches")
        .select("url", "headers", "cookies", "history")
        .collect()
    )
    assert rows
    n_hist = 0
    for r in rows:
        page = WEB.page(r["url"])
        assert dict(r["headers"] or {}) == page["headers"], r["url"]
        assert dict(r["cookies"] or {}) == page["cookies"], r["url"]
        got_hist = [
            {"url": h["url"], "status": h["status"]} for h in (r["history"] or [])
        ]
        assert got_hist == page["history"], r["url"]
        n_hist += len(got_hist)
    assert n_hist > 0, "corpus should include redirect chains"


def test_selenium_screenshot_distinct_artifact(crawled):
    """The render stage stores a screenshot PNG SEPARATE from the page
    payload (darc/model/web/selenium.py:31-40): deterministic, decodable,
    and not the same bytes as the document image."""
    import numpy as np

    from darc_spark.functions.images import decode_png

    crawler, _ = crawled
    rows = (
        crawler.store.read("fetches_selenium")
        .filter(F.col("screenshot").isNotNull())
        .select("url", "screenshot", "bytes")
        .collect()
    )
    assert rows, "render stage should have produced screenshots"
    for r in rows[:20]:
        shot = bytes(r["screenshot"])
        arr = decode_png(shot)
        assert arr.shape == (8, 8, 3)
        # deterministic: re-render yields identical bytes
        ih = WEB._h(r["url"], "shot")
        expect = np.random.default_rng(ih).integers(0, 256, (8, 8, 3), dtype=np.uint8)
        assert (arr == expect).all()
        if r["bytes"] is not None:
            assert shot != bytes(r["bytes"])


def test_kill_resume_equivalence(spark, tmp_path):
    """Run 2 rounds, 'die', resume a fresh Crawler, run 2 more — final
    state equals the uninterrupted 4-round run."""
    root = str(tmp_path / "resume")
    c1 = Crawler(spark, root, WEB, CFG)
    c1.seed(WEB.seeds())
    c1.run(2)
    assert c1.round == 2
    c2 = Crawler(spark, root, WEB, CFG)  # resume from manifest
    assert c2.round == 2
    c2.run(2)

    sim = SimCrawler(WEB, CFG)
    sim.seed(WEB.seeds())
    sim.run(ROUNDS)
    engine = _engine_fetches(c2, "fetches")
    assert engine == set(sim.fetches)
    engine_seen = {r["name"] for r in c2.fr_req.seen().select("name").collect()}
    assert engine_seen == sim.fr_req.seen


def test_metrics_recorded(crawled):
    crawler, _ = crawled
    rows = crawler.metrics_table().collect()
    assert {r["metric"] for r in rows} >= {"claimed_requests", "fetched_requests"}
