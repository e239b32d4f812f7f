"""Engine↔oracle equivalence under non-default configurations."""

from __future__ import annotations

import pytest

from darc_spark.operators.crawl import Crawler, CrawlConfig
from darc_spark.sources.synth import SynthWeb
from tests.oracle_crawler import SimCrawler

WEB = SynthWeb(seed=13, pages_per_host=30, branching=3)

VARIANTS = {
    "no_robots_no_selenium": CrawlConfig(
        per_host=5,
        lease=2,
        max_retries=1,
        robots_enabled=False,
        selenium_enabled=False,
        n_filter_buckets=4,
    ),
    "host_blacklist": CrawlConfig(
        per_host=4,
        lease=2,
        max_retries=0,
        host_black=(r".*?\.onion",),
        n_filter_buckets=4,
    ),
    "proxy_whitelist_fallback_drop": CrawlConfig(
        per_host=4,
        lease=2,
        max_retries=1,
        proxy_white=("null", "tor"),
        proxy_fallback=True,  # i2p/zeronet/freenet dropped
        selenium_enabled=False,
        n_filter_buckets=4,
        filter_kind="bloom",  # exercise the bloom (insert-only) variant
    ),
}


@pytest.mark.parametrize("name", sorted(VARIANTS))
def test_variant_equivalence(spark, tmp_path, name):
    cfg = VARIANTS[name]
    crawler = Crawler(spark, str(tmp_path / name), WEB, cfg)
    crawler.seed(WEB.seeds())
    crawler.run(2)
    sim = SimCrawler(WEB, cfg)
    sim.seed(WEB.seeds())
    sim.run(2)

    engine_fetches = {
        (
            r["fetch_round"],
            r["hostname"],
            r["url"],
            r["status_code"],
            r["is_html"],
            r["n_links"],
        )
        for r in crawler.store.read("fetches")
        .select("fetch_round", "hostname", "url", "status_code", "is_html", "n_links")
        .collect()
    }
    assert engine_fetches == set(sim.fetches), name
    engine_seen = {r["name"] for r in crawler.fr_req.seen().select("name").collect()}
    assert engine_seen == sim.fr_req.seen, name
