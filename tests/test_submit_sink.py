"""Submit sink retry + spill/replay contract (darc/submit.py:72,225-246):
a payload that fails all API_RETRY+1 attempts is spilled to the store
and replayed on the next submit round; a transient failure is absorbed
by the in-batch retry loop."""

from __future__ import annotations

import pandas as pd

from darc_spark.operators.submit_sink import SubmitSink
from darc_spark.sources.store import SnapshotStore


# posters are built by factories so the classes are function-local and
# cloudpickle ships them by VALUE (test modules are not importable on
# executor workers)


def switch_poster(ok: bool = False):
    """Accept/reject everything by a flag (pickled per action, so
    flipping it between rounds reaches executors like a real API
    coming back up)."""

    class SwitchPoster:
        def __init__(self) -> None:
            self.ok = ok

        def __call__(self, payloads: pd.Series):
            return [self.ok] * len(payloads)

    return SwitchPoster()


def nth_try_poster(n: int):
    """Fail the first n calls (per executor copy) — a transient blip
    the retry loop should absorb without spilling."""

    class NthTryPoster:
        def __init__(self) -> None:
            self.calls = 0

        def __call__(self, payloads: pd.Series):
            self.calls += 1
            return [self.calls > n] * len(payloads)

    return NthTryPoster()


def _payloads(spark, keys):
    return spark.createDataFrame(
        [(k, f'{{"URL": "{k}"}}') for k in keys], "key string, payload string"
    )


def test_outage_spills_then_replays(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path / "s"))
    poster = switch_poster(ok=False)
    sink = SubmitSink(store, poster, max_retries=2)

    m0 = sink.submit(_payloads(spark, ["a", "b", "c"]), "requests", r=0)
    store.commit({"round": 0})
    assert m0 == {"submitted": 0, "spilled": 3, "total": 3}
    spill = store.read("submit_spill").collect()
    assert {r["key"] for r in spill} == {"a", "b", "c"}
    assert all(r["attempts"] == 3 for r in spill)  # max_retries+1 tries

    # API back up: next round replays the spill ahead of the new batch
    poster.ok = True
    m1 = sink.submit(_payloads(spark, ["d"]), "requests", r=1)
    store.commit({"round": 1})
    assert m1 == {"submitted": 4, "spilled": 0, "total": 4}
    assert store.read("submit_spill").count() == 0


def test_rerendered_payload_supersedes_spilled_copy(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path / "s"))
    poster = switch_poster(ok=False)
    sink = SubmitSink(store, poster, max_retries=0)
    sink.submit(_payloads(spark, ["a"]), "requests", r=0)
    store.commit({"round": 0})

    # round 1: same key re-rendered with new content. A poster that only
    # accepts the v2 payload proves (a) the key is attempted exactly once
    # (total=1 — the spilled v1 copy was superseded, not replayed twice)
    # and (b) the attempted copy was the re-rendered one (submitted=1).
    class V2OnlyPoster:
        def __call__(self, payloads: pd.Series):
            return ['"v": 2' in p for p in payloads]

    sink2 = SubmitSink(store, V2OnlyPoster(), max_retries=0)
    fresh = spark.createDataFrame(
        [("a", '{"URL": "a", "v": 2}')], "key string, payload string"
    )
    m = sink2.submit(fresh, "requests", r=1)
    store.commit({"round": 1})
    assert m == {"submitted": 1, "spilled": 0, "total": 1}
    assert store.read("submit_spill").count() == 0


def test_domains_are_independent(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path / "s"))
    poster = switch_poster(ok=False)
    sink = SubmitSink(store, poster, max_retries=0)
    sink.submit(_payloads(spark, ["a"]), "requests", r=0)
    store.commit({"round": 0})
    poster.ok = True
    sink.submit(_payloads(spark, ["h"]), "new_host", r=1)
    store.commit({"round": 1})
    # requests spill untouched by the new_host submit
    left = store.read("submit_spill").collect()
    assert [(r["domain"], r["key"]) for r in left] == [("requests", "a")]


def test_transient_blip_absorbed_by_retry(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path / "s"))
    sink = SubmitSink(store, nth_try_poster(1), max_retries=2)
    m = sink.submit(
        _payloads(spark, ["a"]).repartition(1), "requests", r=0
    )
    store.commit({"round": 0})
    assert m == {"submitted": 1, "spilled": 0, "total": 1}
    assert store.read("submit_spill").count() == 0


def test_partial_batch_success_keeps_retrying(spark, tmp_path):
    """A batch where only SOME payloads succeed on the first attempt must
    keep retrying the rest (regression: index-aligned partial boolean-mask
    assignment flipped the ok Series to object dtype, ~ok then produced
    -1/-2 integer labels and the retry loop crashed)."""
    store = SnapshotStore(spark, str(tmp_path / "s"))

    class PartialThenAllPoster:
        def __init__(self) -> None:
            self.calls = 0

        def __call__(self, payloads: pd.Series):
            self.calls += 1
            if self.calls == 1:
                return ['"a"' in p for p in payloads]
            return [True] * len(payloads)

    sink = SubmitSink(store, PartialThenAllPoster(), max_retries=2)
    m = sink.submit(
        _payloads(spark, ["a", "b", "c"]).repartition(1), "requests", r=0
    )
    store.commit({"round": 0})
    assert m == {"submitted": 3, "spilled": 0, "total": 3}
    assert store.read("submit_spill").count() == 0


def test_spill_carries_cumulative_retry_history(spark, tmp_path):
    """A permanently-failing payload keeps its ORIGINAL spill round and
    accumulates attempts across replay rounds, so operators can identify
    long-stuck payloads from the spill table."""
    store = SnapshotStore(spark, str(tmp_path / "s"))
    sink = SubmitSink(store, switch_poster(ok=False), max_retries=2)
    sink.submit(_payloads(spark, ["a"]), "requests", r=0)
    store.commit({"round": 0})
    row0 = store.read("submit_spill").head()
    assert (row0["spill_round"], row0["attempts"]) == (0, 3)

    sink.submit(_payloads(spark, []), "requests", r=1)  # replay only
    store.commit({"round": 1})
    row1 = store.read("submit_spill").head()
    assert (row1["spill_round"], row1["attempts"]) == (0, 6)

    # a fresh re-render of the same key still inherits the history
    sink.submit(_payloads(spark, ["a"]), "requests", r=2)
    store.commit({"round": 2})
    row2 = store.read("submit_spill").head()
    assert (row2["spill_round"], row2["attempts"]) == (0, 9)


def test_crawl_loop_submit_integration(spark, tmp_path):
    """Crawler with a poster wired: round 0's API outage spills every
    rendered payload; round 1 (API up) replays them alongside round 1's
    fresh events — nothing lost (darc/submit.py end-to-end contract)."""
    from darc_spark.operators.crawl import Crawler, CrawlConfig
    from darc_spark.sources.synth import SynthWeb

    web = SynthWeb(seed=5, pages_per_host=20, branching=3)
    poster = switch_poster(ok=False)
    crawler = Crawler(
        spark,
        str(tmp_path / "c"),
        web,
        CrawlConfig(
            per_host=4, lease=2, max_retries=0,
            selenium_enabled=False, n_filter_buckets=4,
        ),
        poster=poster,
    )
    crawler.seed(web.seeds())
    m0 = crawler.run_round()
    assert m0["submitted"] == 0
    assert m0["submit_spilled"] > 0
    spilled0 = crawler.store.read("submit_spill").count()
    assert spilled0 == m0["submit_spilled"]
    # new_host payloads must ACTUALLY fire in round 0 (every seed host is
    # first-seen): the spill table holds both domains' keys
    spill_domains = {
        r["domain"]
        for r in crawler.store.read("submit_spill")
        .select("domain")
        .distinct()
        .collect()
    }
    assert "new_host" in spill_domains and "requests" in spill_domains

    poster.ok = True
    m1 = crawler.run_round()
    # round 1 submits its own fresh events PLUS round 0's replayed spill
    assert m1["submit_spilled"] == 0
    assert m1["submitted"] >= spilled0
    assert crawler.store.read("submit_spill").count() == 0
    # strictly more spilled rows than fetched pages in round 0: the
    # difference is exactly the new_host event per first-seen host
    assert m0["submit_spilled"] > m0["fetched_requests"]
