"""Queue-semantics fixtures (FIXTURES.md §8): NX, lease, ordering, drop."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from darc_spark.functions.canon import with_parsed_link
from darc_spark.operators.frontier import Frontier
from darc_spark.sources.store import SnapshotStore


def _links(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return with_parsed_link(df).withColumn("backref", F.lit(None).cast("string"))


@pytest.fixture()
def fr(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path / "store"))
    return Frontier(store, "requests", n_filter_buckets=4)


def _urls(df):
    return sorted(r["url"] for r in df.select("url").collect())


def test_enqueue_nx_dedups(spark, fr):
    fr.enqueue_nx(_links(spark, ["http://a.example/1", "http://a.example/2"]), 0)
    fr.store.commit()
    # second enqueue of same URL + one new
    fr.enqueue_nx(_links(spark, ["http://a.example/1", "http://a.example/3"]), 1)
    fr.store.commit()
    assert _urls(fr.pending(1)) == [
        "http://a.example/1",
        "http://a.example/2",
        "http://a.example/3",
    ]
    # the re-enqueued URL kept its original enqueue_round (NX: not re-added)
    row = fr.pending(1).filter(F.col("url") == "http://a.example/1").head()
    assert row["enqueue_round"] == 0


def test_claim_leases_and_expires(spark, fr):
    fr.enqueue_nx(_links(spark, ["http://a.example/1"]), 0)
    fr.store.commit()
    batch = fr.claim(0, per_host=10, lease=2)
    fr.store.commit()
    assert _urls(batch) == ["http://a.example/1"]
    # leased: invisible within the lease window
    assert fr.pending(1).count() == 0
    # lease expires at round 2 → re-claimable (at-least-once)
    assert _urls(fr.pending(2)) == ["http://a.example/1"]


def test_mark_done_removes(spark, fr):
    fr.enqueue_nx(_links(spark, ["http://a.example/1"]), 0)
    fr.store.commit()
    batch = fr.claim(0)
    fr.mark_done(batch, 0)
    fr.store.commit()
    assert fr.pending(10).count() == 0


def test_done_revisit_after(spark, fr):
    """TIME_CACHE re-fetch semantics (darc/const.py:134-139)."""
    fr.enqueue_nx(_links(spark, ["http://a.example/1"]), 0)
    fr.store.commit()
    batch = fr.claim(0, lease=1)
    fr.mark_done(batch, 0, revisit_after=5)
    fr.store.commit()
    assert fr.pending(4).count() == 0
    assert fr.pending(5).count() == 1


def test_done_latest_event_wins(spark, fr):
    """A re-fetch pushes the revisit deadline FORWARD (darc/db.py:970-972).

    Regression: min() over done events let the first deadline win
    forever — after one revisit cycle the page became claimable every
    round."""
    fr.enqueue_nx(_links(spark, ["http://a.example/1"]), 0)
    fr.store.commit()
    batch = fr.claim(0, lease=1)
    fr.mark_done(batch, 0, revisit_after=2)
    fr.store.commit()
    assert fr.pending(1).count() == 0
    batch2 = fr.claim(2, lease=1)  # revisit fires at round 2
    assert _urls(batch2) == ["http://a.example/1"]
    fr.mark_done(batch2, 2, revisit_after=5)  # deadline moves to 5
    fr.store.commit()
    assert fr.pending(3).count() == 0  # NOT claimable at 3 (old bug: was)
    assert fr.pending(4).count() == 0
    assert fr.pending(5).count() == 1


def test_per_host_politeness_budget(spark, fr):
    urls = [f"http://hot.example/{i}" for i in range(20)] + [
        "http://cold.example/1"
    ]
    fr.enqueue_nx(_links(spark, urls), 0)
    fr.store.commit()
    batch = fr.claim(0, per_host=3)
    fr.store.commit()
    got = _urls(batch)
    assert len(got) == 4  # 3 from hot + 1 from cold
    # deterministic order: lexicographically smallest urls of the hot host
    assert [u for u in got if "hot" in u] == [
        "http://hot.example/0",
        "http://hot.example/1",
        "http://hot.example/10",
    ]


def test_claim_determinism_across_salt_shards(spark, fr):
    """Salted two-phase top-k == unsalted top-k, any shard count."""
    from darc_spark.operators.politeness import per_host_top_k

    urls = [f"http://hot.example/p{i:03d}" for i in range(50)] + [
        f"http://h{i}.example/solo" for i in range(5)
    ]
    fr.enqueue_nx(_links(spark, urls), 0)
    fr.store.commit()
    p = fr.pending(0)
    unsalted = _urls(per_host_top_k(p, 5, salt_shards=1))
    for shards in (2, 8, 32):
        assert _urls(per_host_top_k(p, 5, salt_shards=shards)) == unsalted


def test_requeue_schedules_later(spark, fr):
    fr.enqueue_nx(_links(spark, ["http://a.example/1"]), 0)
    fr.store.commit()
    batch = fr.claim(0, lease=1)
    fr.requeue(batch, 0, delay=2)
    fr.store.commit()
    assert fr.pending(1).count() == 0  # not_before = 2
    row = fr.pending(2).head()
    assert row["retry_count"] == 1


def test_drop_tombstones_and_allows_readd(spark, fr):
    fr.enqueue_nx(_links(spark, ["http://a.example/bad"]), 0)
    fr.store.commit()
    batch = fr.claim(0, lease=1)
    fr.drop(batch, 0, reason="no-return")
    fr.store.commit()
    assert fr.pending(5).count() == 0
    assert fr.seen().count() == 0  # tombstoned (darc DELETEs the name key)
    # re-extraction later re-enqueues (enqueue_round > drop_round)
    fr.enqueue_nx(_links(spark, ["http://a.example/bad"]), 3)
    fr.store.commit()
    assert _urls(fr.pending(3)) == ["http://a.example/bad"]


def test_prefilter_agrees_with_exact(spark, fr):
    """Filtered and unfiltered enqueue produce identical frontier state."""
    urls1 = [f"http://h{i % 3}.example/x{i}" for i in range(30)]
    fr.enqueue_nx(_links(spark, urls1), 0)
    fr.store.commit()
    overlap = urls1[:15] + [f"http://h9.example/new{i}" for i in range(10)]
    fr.enqueue_nx(_links(spark, overlap), 1)
    fr.store.commit()
    assert fr.pending(1).count() == 40
    assert fr.seen().count() == 40


def test_compact_preserves_state(spark, fr):
    urls = [f"http://a.example/{i}" for i in range(10)]
    fr.enqueue_nx(_links(spark, urls), 0)
    fr.store.commit()
    batch = fr.claim(0, per_host=3, lease=5)
    fr.mark_done(batch.limit(1), 0)
    fr.store.commit()
    before_pending = _urls(fr.pending(1))
    before_seen = fr.seen().count()
    fr.compact(0)
    fr.store.commit()
    assert _urls(fr.pending(1)) == before_pending
    assert fr.seen().count() == before_seen
    # leased rows survived compaction and reappear after lease expiry
    assert fr.pending(5).count() == 9


def test_resume_after_kill(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path / "s"))
    fr = Frontier(store, "requests")
    fr.enqueue_nx(_links(spark, ["http://a.example/1", "http://a.example/2"]), 0)
    store.commit({"round": 0})
    # crash mid-round: staged claim never committed
    fr.claim(1)
    store2 = SnapshotStore(spark, store.root)
    fr2 = Frontier(store2, "requests")
    assert fr2.pending(1).count() == 2  # the uncommitted lease is invisible


def test_membership_check_scale_path_never_collects_payloads():
    """The SCALE path of the filter check (cogroup) must never collect
    payloads or capture them in a closure (round-1 scale bug); the
    dispatcher may only probe octet_length metadata, and the broadcast
    fast path must use a broadcast VARIABLE, not closure capture."""
    import inspect

    src = inspect.getsource(Frontier._check_cogroup)
    assert ".collect(" not in src
    assert "cogroup" in src
    dispatch = inspect.getsource(Frontier._split_by_filter)
    assert "octet_length" in dispatch  # metadata-only strategy probe
    bsrc = inspect.getsource(Frontier._check_broadcast)
    assert ".broadcast(" in bsrc


def test_membership_check_cogroup_path_correct(spark, tmp_path):
    """Forcing the cogroup strategy (broadcast_max_bytes=0) gives the
    same NX semantics as the default broadcast fast path."""
    store = SnapshotStore(spark, str(tmp_path / "store"))
    fr = Frontier(store, "requests", n_filter_buckets=4, broadcast_max_bytes=0)
    urls = [f"http://h{i % 3}.example/x{i}" for i in range(30)]
    fr.enqueue_nx(_links(spark, urls), 0)
    fr.store.commit()
    fr.enqueue_nx(_links(spark, urls[:15] + ["http://new.example/1"]), 1)
    fr.store.commit()
    assert fr.pending(1).count() == 31
    assert fr.seen().count() == 31


def test_filter_saturation_degrades_then_rebuilds(spark, tmp_path):
    """A saturated cuckoo bucket degrades to exact-join-only (payload
    None) without losing NX correctness; compaction rebuilds it at
    auto-scaled capacity."""
    store = SnapshotStore(spark, str(tmp_path / "store"))
    fr = Frontier(
        store, "requests", n_filter_buckets=4, filter_capacity_per_bucket=4
    )
    first = [f"http://a.example/p{i}" for i in range(10)]
    fr.enqueue_nx(_links(spark, first), 0)
    # enqueue-side filter adds are deferred (round-6): direct Frontier
    # drivers flush before commit, like Crawler does once per round
    fr.flush_filter_updates()
    fr.store.commit()
    # second large batch overflows the small per-bucket filters
    second = [f"http://b.example/q{i}" for i in range(500)]
    fr.enqueue_nx(_links(spark, second), 1)
    fr.flush_filter_updates()
    fr.store.commit()
    stats = fr.filter_stats()
    assert stats["filter_saturated"] > 0  # degraded, by design
    # NX correctness unaffected: re-enqueue everything, nothing duplicates
    fr.enqueue_nx(_links(spark, first + second), 2)
    fr.store.commit()
    assert fr.pending(2).count() == 510
    assert fr.seen().count() == 510
    # compaction re-keys the filter at auto-scaled capacity
    fr.compact(2)
    fr.store.commit()
    stats = fr.filter_stats()
    assert stats["filter_saturated"] == 0
    assert stats["filter_keys"] == 510
    # and the rebuilt filter still gives exact NX
    fr.enqueue_nx(_links(spark, second + ["http://c.example/new"]), 3)
    fr.store.commit()
    assert fr.seen().count() == 511
