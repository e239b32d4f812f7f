"""Plugin surface (SURVEY §2.9): site hooks, proxy registry, round hooks."""

from __future__ import annotations

import pytest

from darc_spark import register_hooks, register_proxy, register_sites
from darc_spark.operators.crawl import Crawler, CrawlConfig
from darc_spark.registry import HOOKS, PROXY_MAP, SITE_MAP, WorkerBreak
from darc_spark.sources.synth import SynthWeb


@pytest.fixture(autouse=True)
def clean_registry():
    saved_sites, saved_hooks = dict(SITE_MAP), list(HOOKS)
    yield
    SITE_MAP.clear()
    SITE_MAP.update(saved_sites)
    HOOKS.clear()
    HOOKS.extend(saved_hooks)


def test_site_hook_no_return_drops_permanently(spark, tmp_path):
    web = SynthWeb(seed=42, pages_per_host=40, branching=3)

    # defined as a closure so cloudpickle ships it by value (a handler in
    # an installed module would be pickled by reference instead)
    def no_return_site(batch_pdf, pages_pdf):
        out = pages_pdf.copy()
        out["no_return"] = True
        return out

    register_sites(no_return_site, "alpha.example")
    crawler = Crawler(
        spark,
        str(tmp_path / "s"),
        web,
        CrawlConfig(per_host=4, lease=2, max_retries=1, selenium_enabled=False),
    )
    crawler.seed(web.seeds())
    crawler.run(2)
    # every fetched alpha.example page got dropped (tombstoned from seen)
    seen_hosts = {
        r["hostname"] for r in crawler.fr_req.seen().select("hostname").collect()
    }
    fetched_alpha = (
        crawler.store.read("fetches")
        .filter("hostname = 'alpha.example'")
        .count()
    )
    assert fetched_alpha > 0
    dropped = {
        r["name"]
        for r in crawler.store.read("dropped_requests")
        .filter("reason = 'no-return'")
        .select("name")
        .collect()
    }
    assert len(dropped) == fetched_alpha
    # dropped names are out of the seen set
    seen_names = {r["name"] for r in crawler.fr_req.seen().select("name").collect()}
    assert not (dropped & seen_names)


def test_worker_break_hook_stops_loop(spark, tmp_path):
    web = SynthWeb(seed=42, pages_per_host=40, branching=3)
    calls = []

    def stop_after_two(round_index, crawler):
        calls.append(round_index)
        if round_index >= 1:
            raise WorkerBreak

    register_hooks(stop_after_two)
    crawler = Crawler(
        spark,
        str(tmp_path / "s"),
        web,
        CrawlConfig(per_host=4, lease=2, max_retries=1, selenium_enabled=False),
    )
    crawler.seed(web.seeds())
    metrics = crawler.run(10)
    assert len(metrics) == 2  # stopped by the hook, not by the round budget
    assert calls == [0, 1]
    # the interrupted round still committed atomically
    assert crawler.store.latest_meta()["round"] == 1


def test_site_hook_no_return_selenium_stage(spark, tmp_path):
    """no_return pages in the RENDER queue are dropped before extraction
    (loader drop_selenium on LinkNoReturn, darc/crawl.py:303-309)."""
    web = SynthWeb(seed=42, pages_per_host=40, branching=3)
    calls = {"n": 0}

    def no_return_alpha(batch_pdf, pages_pdf):
        out = pages_pdf.copy()
        out["no_return"] = True
        return out

    crawler = Crawler(
        spark,
        str(tmp_path / "s"),
        web,
        CrawlConfig(per_host=4, lease=2, max_retries=1, selenium_enabled=True),
    )
    crawler.seed(web.seeds())
    crawler.run(1)  # round 0: requests only; promotions land in fr_sel
    # hook installed AFTER round 0 so promotion happened normally, but the
    # selenium render of alpha pages in round 1 hits the hook
    register_sites(no_return_alpha, "alpha.example")
    crawler.run(1)
    dropped = crawler.store.read("dropped_selenium").filter(
        "reason = 'no-return'"
    )
    drop_names = {r["name"] for r in dropped.select("name").collect()}
    rendered_alpha = {
        r["name"]
        for r in crawler.store.read("fetches_selenium")
        .filter("hostname = 'alpha.example' AND fetch_round = 1")
        .select("name")
        .collect()
    }
    assert rendered_alpha, "test needs alpha pages in the round-1 render batch"
    assert rendered_alpha <= drop_names
    # dropped render pages are tombstoned out of the selenium seen set
    sel_seen = {r["name"] for r in crawler.fr_sel.seen().select("name").collect()}
    assert not (drop_names & sel_seen)


def test_register_proxy():
    register_proxy("tor2web", {"gateway": "onion.sh"})
    assert PROXY_MAP["tor2web"] == {"gateway": "onion.sh"}


def test_register_signal_graceful_stop(spark, tmp_path):
    """SIGTERM-equivalent (SIGUSR1 for test safety) delivered mid-crawl
    stops AFTER the committed round (darc/signal.py:35-63 parity)."""
    import os
    import signal

    from darc_spark.registry import (
        SIGNAL_REGISTRY,
        graceful_stop_handler,
        register_signal,
    )

    web = SynthWeb(seed=42, pages_per_host=40, branching=3)
    crawler = Crawler(
        spark,
        str(tmp_path / "s"),
        web,
        CrawlConfig(per_host=4, lease=2, max_retries=1, selenium_enabled=False),
    )
    prev = register_signal(signal.SIGUSR1, graceful_stop_handler(crawler))
    # raise the signal from a round hook — i.e. mid-run, driver-side
    def raise_mid_run(round_index, c):
        if round_index == 1:
            os.kill(os.getpid(), signal.SIGUSR1)

    register_hooks(raise_mid_run)
    try:
        crawler.seed(web.seeds())
        metrics = crawler.run(10)
    finally:
        signal.signal(signal.SIGUSR1, prev)
        SIGNAL_REGISTRY.pop(int(signal.SIGUSR1), None)
    assert len(metrics) == 2  # rounds 0 and 1; signal stopped the loop
    assert crawler.store.latest_meta()["round"] == 1  # committed, not torn


def test_register_signal_returns_original_disposition():
    """A second registration for the same signum returns the PRE-registry
    disposition, not the registry's own dispatcher (darc/signal.py:35-63
    signal.signal contract)."""
    import signal

    from darc_spark.registry import (
        SIGNAL_REGISTRY,
        _generic_handler,
        register_signal,
    )

    def h1(signum, frame):
        pass

    def h2(signum, frame):
        pass

    before = signal.getsignal(signal.SIGUSR2)
    try:
        prev1 = register_signal(signal.SIGUSR2, h1)
        prev2 = register_signal(signal.SIGUSR2, h2)
        assert prev1 is before
        assert prev2 is before  # NOT _generic_handler
        assert prev2 is not _generic_handler
        assert SIGNAL_REGISTRY[int(signal.SIGUSR2)] == [h1, h2]
    finally:
        signal.signal(signal.SIGUSR2, before)
        SIGNAL_REGISTRY.pop(int(signal.SIGUSR2), None)
