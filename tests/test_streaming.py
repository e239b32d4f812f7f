from __future__ import annotations

import os
import time

import pytest

from darc_spark.operators.crawl import Crawler, CrawlConfig
from darc_spark.sources.store import SnapshotStore
from darc_spark.sources.synth import SynthWeb
from darc_spark.streaming import SeedStreamIngestor, hostname_counts_stream


def test_seed_stream_ingests_and_dedups(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path / "store"))
    seed_dir = str(tmp_path / "seeds")
    ingestor = SeedStreamIngestor(spark, store, seed_dir, use_filter=False)
    q = ingestor.start(str(tmp_path / "ckpt"))
    try:
        with open(os.path.join(seed_dir, "batch1.txt"), "w") as f:
            f.write("http://a.example/1\nhttp://b.onion/x\n# comment\n\n")
        q.processAllAvailable()
        # second file overlaps the first — NX must dedup across batches
        with open(os.path.join(seed_dir, "batch2.txt"), "w") as f:
            f.write("http://a.example/1\nhttp://c.i2p/y\n")
        q.processAllAvailable()
    finally:
        q.stop()
    fr = ingestor.frontier
    urls = sorted(r["url"] for r in fr.pending(10).select("url").collect())
    assert urls == ["http://a.example/1", "http://b.onion/x", "http://c.i2p/y"]
    assert ingestor.batches_seen >= 2
    # resume-safe: the streaming checkpoint + snapshot manifests agree
    assert store.version >= 2


def test_hostname_counts_stream(spark, tmp_path):
    web = SynthWeb(seed=42, pages_per_host=40, branching=3)
    root = str(tmp_path / "crawlstore")
    crawler = Crawler(
        spark, root, web, CrawlConfig(per_host=4, lease=2, max_retries=1)
    )
    crawler.seed(web.seeds())
    crawler.run(2)
    q = hostname_counts_stream(spark, root, query_name="t_host_counts")
    try:
        q.processAllAvailable()
        rows = {
            r["hostname"]: r["n_fetches"]
            for r in spark.sql("SELECT * FROM t_host_counts").collect()
        }
    finally:
        q.stop()
    batch_counts = (
        crawler.store.read("fetches").groupBy("hostname").count().collect()
    )
    expected = {r["hostname"]: r["count"] for r in batch_counts}
    assert rows == expected
