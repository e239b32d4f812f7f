"""Compaction transparency: a crawl that compacts every k rounds must
produce exactly the state of one that never compacts."""

from __future__ import annotations

from darc_spark.operators.crawl import Crawler, CrawlConfig
from darc_spark.sources.synth import SynthWeb

WEB = SynthWeb(seed=21, pages_per_host=32, branching=3)
BASE = dict(per_host=4, lease=2, max_retries=1, n_filter_buckets=4)
ROUNDS = 4


def _state(crawler):
    fetches = {
        (r["fetch_round"], r["url"], r["status_code"])
        for r in crawler.store.read("fetches")
        .select("fetch_round", "url", "status_code")
        .collect()
    }
    seen = {r["name"] for r in crawler.fr_req.seen().select("name").collect()}
    pending = {
        r["url"] for r in crawler.fr_req.pending(ROUNDS + 10).select("url").collect()
    }
    return fetches, seen, pending


def test_compaction_equivalence(spark, tmp_path):
    plain = Crawler(spark, str(tmp_path / "plain"), WEB, CrawlConfig(**BASE))
    plain.seed(WEB.seeds())
    plain.run(ROUNDS)

    compacting = Crawler(
        spark, str(tmp_path / "compact"), WEB, CrawlConfig(**BASE, compact_every=2)
    )
    compacting.seed(WEB.seeds())
    compacting.run(ROUNDS)

    assert _state(plain) == _state(compacting)
    # compaction actually folded segments down
    plain_segs = len(plain.store.segments("frontier_requests"))
    compact_segs = len(compacting.store.segments("frontier_requests"))
    assert compact_segs < plain_segs
