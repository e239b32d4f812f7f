"""Compaction transparency: a crawl that compacts every k rounds must
produce exactly the state of one that never compacts."""

from __future__ import annotations

from pyspark.sql import functions as F

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
    # state-table rollups (hostname_state / robots_docs fold at compaction)
    # must preserve the aggregate the gates consume
    hosts = {
        (r["hostname"], r["proxy"], r["first_seen_round"], r["last_fetch_round"])
        for r in crawler._hostname_state().collect()
    }
    robots = {
        (r["hostname"], r["status_code"], r["text"], r["fetch_round"])
        for r in crawler.store.read("robots_docs")
        .groupBy("hostname")
        .agg(
            F.max_by("status_code", "fetch_round").alias("status_code"),
            F.max_by("text", "fetch_round").alias("text"),
            F.max("fetch_round").alias("fetch_round"),
        )
        .collect()
    }
    return fetches, seen, pending, hosts, robots


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

    # the queryable artifacts are DUPLICATE-FREE after a compaction
    # round: a host fetched in the compaction round must not appear
    # once in the replacement and again via the round's staged appends
    docs = compacting.store.read("robots_docs")
    assert docs.count() == docs.select("hostname").distinct().count()
    rules = compacting.store.read("robots_rules")
    assert (
        rules.count()
        == rules.select("hostname", "agent", "rule_index").distinct().count()
    )
    hosts_tbl = compacting.store.read("hostname_state")
    assert (
        hosts_tbl.count() == hosts_tbl.select("hostname").distinct().count()
    )
