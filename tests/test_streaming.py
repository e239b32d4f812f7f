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


def test_event_windows_stream_drops_late_data(spark, tmp_path):
    """Watermarked windowed agg: a window finalizes once the watermark
    passes its end (append mode emits it exactly once), and events
    arriving later than the watermark bound are dropped — state stays
    bounded by the watermark horizon."""
    from datetime import datetime

    from darc_spark.streaming.stream import event_windows_stream

    events_dir = str(tmp_path / "events")
    os.makedirs(events_dir)
    schema = "event_id long, ts timestamp, event_type string, value double"

    def write_batch(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            os.path.join(events_dir, name)
        )

    T = datetime
    # batch 1: 3 on-time clicks in [00:00, 01:00) + one event at 02:10
    # that advances the watermark past 01:00, closing that window
    b1 = [
        (1, T(2026, 1, 1, 0, 10), "click", 1.0),
        (2, T(2026, 1, 1, 0, 20), "click", 1.0),
        (3, T(2026, 1, 1, 0, 40), "click", 1.0),
        (4, T(2026, 1, 1, 2, 10), "click", 1.0),
    ]
    q = event_windows_stream(
        spark,
        events_dir + "/*",
        str(tmp_path / "ckpt"),
        str(tmp_path / "out"),
        schema,
    )
    try:
        write_batch("b1", b1)
        q.processAllAvailable()
        # batch 2: TWO LATE clicks for the closed 00:00 window (beyond
        # the 1h watermark → dropped) + a 04:10 watermark driver
        b2 = [
            (5, T(2026, 1, 1, 0, 25), "click", 1.0),
            (6, T(2026, 1, 1, 0, 45), "click", 1.0),
            (7, T(2026, 1, 1, 4, 10), "click", 1.0),
        ]
        write_batch("b2", b2)
        q.processAllAvailable()
    finally:
        q.stop()
    out = {
        (r["bucket"], r["event_type"]): r["n"]
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    # the 00:00 window emitted exactly once, WITHOUT the 2 late rows
    assert out[("2026-01-01 00:00:00", "click")] == 3, out


def test_url_seen_dedup_stream_exactly_once_after_midcommit_kill(
    spark, tmp_path
):
    """Crash surgically BETWEEN sink write and checkpoint commit: run a
    batch to completion, then delete its entry from the checkpoint's
    commit log — exactly the on-disk state a kill leaves after the
    parquet sink wrote its files but before the offset commit finalized.
    On restart Spark MUST replay the batch; the file sink's own
    transaction log has to dedupe the replayed files so readers see each
    URL exactly once."""
    import glob

    from darc_spark.streaming import url_seen_dedup_stream

    seed_dir = str(tmp_path / "seeds")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    q = url_seen_dedup_stream(spark, seed_dir, ckpt, out_dir)
    try:
        with open(os.path.join(seed_dir, "b1.txt"), "w") as f:
            f.write("http://a.example/1\nhttp://b.onion/x\n")
        q.processAllAvailable()
        with open(os.path.join(seed_dir, "b2.txt"), "w") as f:
            f.write("http://c.i2p/y\nhttp://a.example/1\n")
        q.processAllAvailable()
    finally:
        q.stop()

    # un-commit the LAST batch (sink data files + state already on disk)
    commits = sorted(
        p
        for p in glob.glob(os.path.join(ckpt, "commits", "*"))
        if os.path.basename(p).isdigit()
    )
    assert len(commits) >= 2
    os.remove(commits[-1])
    # Hadoop's local FS keeps a sidecar checksum; a stale one makes the
    # re-written commit entry unreadable (a real kill removes neither)
    crc = os.path.join(
        os.path.dirname(commits[-1]), f".{os.path.basename(commits[-1])}.crc"
    )
    if os.path.exists(crc):
        os.remove(crc)

    # restart: the un-committed batch replays against state version N-1
    q2 = url_seen_dedup_stream(spark, seed_dir, ckpt, out_dir)
    try:
        q2.processAllAvailable()
        # and the stream keeps going afterwards
        with open(os.path.join(seed_dir, "b3.txt"), "w") as f:
            f.write("http://d.example/z\nhttp://c.i2p/y\n")
        q2.processAllAvailable()
    finally:
        q2.stop()

    rows = [r["url"] for r in spark.read.parquet(out_dir).collect()]
    # exactly-once: no URL emitted twice despite the replay
    assert sorted(rows) == sorted(set(rows)), rows
    assert set(rows) == {
        "http://a.example/1",
        "http://b.onion/x",
        "http://c.i2p/y",
        "http://d.example/z",
    }
