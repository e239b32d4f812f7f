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


def test_url_seen_dedup_stream_stateful(spark, tmp_path):
    """applyInPandasWithState URL-seen: dedups across micro-batches AND
    across query restarts (state recovered from the checkpoint)."""
    from darc_spark.streaming import url_seen_dedup_stream

    seed_dir = str(tmp_path / "seeds")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    q = url_seen_dedup_stream(spark, seed_dir, ckpt, out_dir)
    try:
        with open(os.path.join(seed_dir, "b1.txt"), "w") as f:
            f.write("http://a.example/1\nhttp://b.onion/x\nhttp://a.example/1\n")
        q.processAllAvailable()
        with open(os.path.join(seed_dir, "b2.txt"), "w") as f:
            f.write("http://a.example/1\nhttp://c.i2p/y\n")
        q.processAllAvailable()
    finally:
        q.stop()
    rows1 = {r["url"] for r in spark.read.parquet(out_dir).collect()}
    assert rows1 == {"http://a.example/1", "http://b.onion/x", "http://c.i2p/y"}

    # restart from the same checkpoint: state survives, overlaps stay deduped
    q2 = url_seen_dedup_stream(spark, seed_dir, ckpt, out_dir)
    try:
        with open(os.path.join(seed_dir, "b3.txt"), "w") as f:
            f.write("http://b.onion/x\nhttp://d.example/z\n")
        q2.processAllAvailable()
    finally:
        q2.stop()
    rows2 = {r["url"] for r in spark.read.parquet(out_dir).collect()}
    assert rows2 == rows1 | {"http://d.example/z"}
