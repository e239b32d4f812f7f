"""TIME_CACHE hostname-gate force-refetch (darc/db.py:293-318, consumed
at darc/crawl.py:141-166): hosts whose last robots/sitemap/hosts.txt
fetch is older than the lease are re-fetched on next claim, and a
changed robots.txt takes effect after expiry — engine and simulator
agree round-for-round while the policy flips mid-run."""

from __future__ import annotations

from pyspark.sql import functions as F

from darc_spark.operators.crawl import Crawler, CrawlConfig
from darc_spark.sources.synth import SynthWeb
from tests.oracle_crawler import SimCrawler

CFG = CrawlConfig(
    per_host=4,
    lease=2,
    max_retries=0,
    revisit=2,  # fetched pages recycle, so hosts keep being claimed
    time_cache_rounds=2,
    selenium_enabled=False,
    n_filter_buckets=4,
)

DISALLOW_ALL = (200, "User-agent: *\nDisallow: /\n")


def _run_with_flip(crawler, web: SynthWeb, host: str, flip_round: int, rounds: int):
    """Drive round-by-round, flipping the host's robots at flip_round."""
    for r in range(rounds):
        if r == flip_round:
            web.robots_override[host] = DISALLOW_ALL
        crawler.run_round()
    web.robots_override.clear()


def test_time_cache_engine_sim_equivalence(spark, tmp_path):
    web = SynthWeb(seed=7, pages_per_host=20, branching=3)
    host = web.hosts[0]
    rounds, flip = 6, 2

    crawler = Crawler(spark, str(tmp_path / "tc"), web, CFG)
    crawler.seed(web.seeds())
    _run_with_flip(crawler, web, host, flip, rounds)

    sim = SimCrawler(web, CFG)
    sim.seed(web.seeds())
    _run_with_flip(sim, web, host, flip, rounds)

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
    assert engine_fetches == set(sim.fetches)
    engine_seen = {r["name"] for r in crawler.fr_req.seen().select("name").collect()}
    assert engine_seen == sim.fr_req.seen

    # the lease actually re-fetched: ≥2 robots docs for the flipped host,
    # and the refreshed policy is the disallow-all text
    docs = (
        crawler.store.read("robots_docs")
        .filter(F.col("hostname") == host)
        .orderBy("fetch_round")
        .collect()
    )
    assert len(docs) >= 2, "TIME_CACHE never re-fetched robots"
    assert "Disallow: /\n" in docs[-1]["text"]

    # ... and it GATES: after the re-fetch round every fetch on that host
    # is root-only (path "/" bypasses robots per the engine contract)
    refetch_round = docs[-1]["fetch_round"]
    late = [
        f for f in engine_fetches if f[1] == host and f[0] > refetch_round
    ]
    assert all(f[2].rstrip("/").endswith(host) for f in late), late


def _stepper(seconds_per_round: float):
    """Deterministic clock: call k returns k*seconds_per_round (one call
    per round — run_round samples the clock exactly once). Function-local
    closure so cloudpickle ships it by value if it ever reaches a UDF."""
    state = {"k": -1}

    def clock() -> float:
        state["k"] += 1
        return state["k"] * seconds_per_round

    return clock


def test_time_mode_equivalent_to_round_mode(spark, tmp_path):
    """Wall-clock lease ≡ round lease under a fixed seconds-per-round
    clock: time_cache_seconds = k·spr with rounds starting spr apart
    produces EXACTLY the fetch history of time_cache_rounds = k — so a
    deployed 30-day lease (darc docker-compose TIME_CACHE) maps directly
    onto the engine's round-denominated state with no schema change."""
    spr = 300.0
    cfg_time = CrawlConfig(
        per_host=4,
        lease=2,
        max_retries=0,
        revisit=2,
        lease_mode="time",
        time_cache_seconds=2 * spr,
        clock=_stepper(spr),
        selenium_enabled=False,
        n_filter_buckets=4,
    )
    web = SynthWeb(seed=7, pages_per_host=20, branching=3)
    host = web.hosts[0]
    rounds, flip = 6, 2

    timed = Crawler(spark, str(tmp_path / "time"), web, cfg_time)
    timed.seed(web.seeds())
    _run_with_flip(timed, web, host, flip, rounds)

    rounded = Crawler(spark, str(tmp_path / "round"), web, CFG)
    rounded.seed(web.seeds())
    _run_with_flip(rounded, web, host, flip, rounds)

    def fetch_set(c):
        return {
            tuple(r)
            for r in c.store.read("fetches")
            .select(
                "fetch_round", "hostname", "url", "status_code",
                "is_html", "n_links",
            )
            .collect()
        }

    assert fetch_set(timed) == fetch_set(rounded)
    docs_t = timed.store.read("robots_docs").filter(F.col("hostname") == host)
    docs_r = rounded.store.read("robots_docs").filter(F.col("hostname") == host)
    assert sorted(r["fetch_round"] for r in docs_t.collect()) == sorted(
        r["fetch_round"] for r in docs_r.collect()
    )
    assert docs_t.count() >= 2  # the wall-clock lease DID re-fetch


def test_time_mode_lease_survives_resume(spark, tmp_path):
    """The round→timestamp timeline rides in the commit manifests: a
    resumed crawler reloads it, and a lease that expires across the
    restart still triggers the robots re-fetch."""
    spr = 100.0
    web = SynthWeb(seed=7, pages_per_host=20, branching=3)
    host = web.hosts[0]

    def mk_cfg(clock):
        return CrawlConfig(
            per_host=4, lease=2, max_retries=0, revisit=2,
            lease_mode="time", time_cache_seconds=3 * spr, clock=clock,
            selenium_enabled=False, n_filter_buckets=4,
        )

    c1 = Crawler(spark, str(tmp_path / "res"), web, mk_cfg(_stepper(spr)))
    c1.seed(web.seeds())
    c1.run_round()
    c1.run_round()

    # resume in a new instance: timeline reloaded from manifests
    clock2 = _stepper(spr)
    clock2()  # skip k=0
    clock2()  # skip k=1 — next call yields round 2's timestamp
    c2 = Crawler(spark, str(tmp_path / "res"), web, mk_cfg(clock2))
    assert c2.round == 2
    assert c2._round_ts == {0: 0.0, 1: spr}
    c2.run_round()  # round 2 @ t=200: lease (300s) not expired
    c2.run_round()  # round 3 @ t=300: age == window — boundary, fresh
    base_docs = (
        c2.store.read("robots_docs").filter(F.col("hostname") == host).count()
    )
    assert base_docs == 1
    c2.run_round()  # round 4 @ t=400: round 0's fetch is 400s old > 300s
    docs = (
        c2.store.read("robots_docs").filter(F.col("hostname") == host).count()
    )
    assert docs > base_docs, "expired wall-clock lease did not re-fetch"


def test_no_refetch_without_lease(spark, tmp_path):
    """time_cache_rounds=None (default) preserves fetch-once semantics."""
    web = SynthWeb(seed=7, pages_per_host=20, branching=3)
    host = web.hosts[0]
    cfg = CrawlConfig(
        per_host=4,
        lease=2,
        max_retries=0,
        revisit=2,
        selenium_enabled=False,
        n_filter_buckets=4,
    )
    crawler = Crawler(spark, str(tmp_path / "no_tc"), web, cfg)
    crawler.seed(web.seeds())
    _run_with_flip(crawler, web, host, 2, 5)
    docs = (
        crawler.store.read("robots_docs").filter(F.col("hostname") == host).collect()
    )
    assert len(docs) == 1, "robots re-fetched despite no TIME_CACHE lease"


def test_time_mode_unknown_age_rounds_do_not_storm(spark, tmp_path):
    """Manifests from before the wall-clock feature (or with expired
    history) have no "ts": their rounds' fetches have UNKNOWN age and
    must count as fresh — resuming in time mode must not trigger a
    fleet-wide robots refetch storm."""
    import json, os, re

    spr = 100.0
    web = SynthWeb(seed=7, pages_per_host=20, branching=3)
    host = web.hosts[0]

    # run two rounds in ROUND mode (manifests carry ts, strip it after)
    base = CrawlConfig(
        per_host=4, lease=2, max_retries=0, revisit=2,
        selenium_enabled=False, n_filter_buckets=4,
    )
    c1 = Crawler(spark, str(tmp_path / "old"), web, base)
    c1.seed(web.seeds())
    c1.run_round()
    c1.run_round()
    mdir = os.path.join(c1.store.root, "_manifests")
    for fn in os.listdir(mdir):
        if not re.match(r"^v\d{6}\.json$", fn):
            continue
        p = os.path.join(mdir, fn)
        with open(p) as f:
            doc = json.load(f)
        # strip BOTH the per-manifest stamp and the carried-forward
        # history: since commits ride the full round→ts map ("round_ts"),
        # only a pre-history manifest (or one written before the crawl
        # recorded timestamps at all) is genuinely unknown-age
        doc.get("meta", {}).pop("ts", None)
        doc.get("meta", {}).pop("round_ts", None)
        with open(p, "w") as f:
            json.dump(doc, f)

    # resume in TIME mode with a clock far in the future: every past
    # round is unknown-age, so NOTHING may be classified stale
    k = {"v": 0}
    def far_clock():
        k["v"] += 1
        return 1e9 + k["v"] * spr

    cfg = CrawlConfig(
        per_host=4, lease=2, max_retries=0, revisit=2,
        lease_mode="time", time_cache_seconds=3 * spr, clock=far_clock,
        selenium_enabled=False, n_filter_buckets=4,
    )
    c2 = Crawler(spark, str(tmp_path / "old"), web, cfg)
    assert c2._round_ts == {}
    before = c2.store.read("robots_docs").filter(
        F.col("hostname") == host
    ).count()
    c2.run_round()
    after = c2.store.read("robots_docs").filter(
        F.col("hostname") == host
    ).count()
    assert after == before, "unknown-age rounds triggered a refetch storm"


def test_time_mode_history_survives_snapshot_expiry(spark, tmp_path):
    """Every commit carries the full round→ts map forward, so expiring
    old snapshots (whose manifests originally recorded those rounds'
    timestamps) must NOT lose lease history: a host last fetched in an
    expired-away round still counts as stale once its age exceeds the
    window, instead of escaping TIME_CACHE refetch forever."""
    spr = 100.0
    web = SynthWeb(seed=7, pages_per_host=20, branching=3)
    host = web.hosts[0]

    def mk_cfg(clock):
        return CrawlConfig(
            per_host=4, lease=2, max_retries=0, revisit=2,
            lease_mode="time", time_cache_seconds=3 * spr, clock=clock,
            selenium_enabled=False, n_filter_buckets=4,
        )

    c1 = Crawler(spark, str(tmp_path / "exp"), web, mk_cfg(_stepper(spr)))
    c1.seed(web.seeds())
    c1.run_round()  # round 0 @ t=0 — fetches robots for every seed host
    c1.run_round()  # round 1 @ t=100
    # expire everything but the latest snapshot: the manifests that
    # first recorded rounds 0-1's timestamps are gone from disk
    c1.store.expire_snapshots(keep_last=1)

    clock2 = _stepper(spr)
    for _ in range(4):
        clock2()  # next call yields round 4's timestamp (t=400)
    c2 = Crawler(spark, str(tmp_path / "exp"), web, mk_cfg(clock2))
    # the carried-forward history still knows rounds 0 and 1
    assert c2._round_ts[0] == 0.0 and c2._round_ts[1] == spr
    before = c2.store.read("robots_docs").filter(
        F.col("hostname") == host
    ).count()
    c2.run_round()  # @ t=400: round 0's fetch is 400s old > 300s window
    after = c2.store.read("robots_docs").filter(
        F.col("hostname") == host
    ).count()
    assert after > before, (
        "lease history lost to snapshot expiry: stale host never refetched"
    )


def test_round_ts_history_stays_bounded(spark, tmp_path):
    """Round-5 demerit fix: manifests must not grow O(rounds). In time
    mode, rounds whose timestamp aged past the TIME_CACHE window are
    pruned from the carried round_ts map and replaced by the scalar
    stale_floor — a long crawl's latest manifest carries only the
    window's worth of rounds, while pruned rounds stay stale forever
    (the re-fetch behaviour asserted by the sibling tests above)."""
    import json
    import os

    spr = 100.0
    web = SynthWeb(seed=7, pages_per_host=20, branching=3)

    cfg = CrawlConfig(
        per_host=4, lease=2, max_retries=0, revisit=2,
        lease_mode="time", time_cache_seconds=3 * spr,
        clock=_stepper(spr), selenium_enabled=False, n_filter_buckets=4,
    )
    c = Crawler(spark, str(tmp_path / "bounded"), web, cfg)
    c.seed(web.seeds())
    for _ in range(10):
        c.run_round()
    # live entries: only rounds whose age is within the 300 s window
    # (3 rounds' worth + the boundary round), never all 10
    assert len(c._round_ts) <= 5, c._round_ts
    assert c._stale_floor is not None and c._stale_floor >= 5
    mdir = os.path.join(c.store.root, "_manifests")
    latest = sorted(os.listdir(mdir))[-1]
    with open(os.path.join(mdir, latest)) as f:
        meta = json.load(f)["meta"]
    assert len(meta["round_ts"]) <= 5
    assert int(meta["stale_floor"]) == c._stale_floor
    # resume folds the floor back in: a pruned round is still stale
    clock2 = _stepper(spr)
    for _ in range(10):
        clock2()
    c2 = Crawler(spark, str(tmp_path / "bounded"), web, CrawlConfig(
        per_host=4, lease=2, max_retries=0, revisit=2,
        lease_mode="time", time_cache_seconds=3 * spr,
        clock=clock2, selenium_enabled=False, n_filter_buckets=4,
    ))
    c2._round_now = clock2()
    cut = c2._time_cache_cutoff(c2.round)
    assert cut is not None and cut >= c._stale_floor


def test_seed_commit_carries_round_ts_history(spark, tmp_path):
    """Re-seeding an existing crawl also commits a manifest — if THAT
    manifest is the only survivor of expire_snapshots it must still
    carry the round→ts history (the round-commit-only variant of the
    carry loses the timeline exactly when a seed was the last write)."""
    spr = 100.0
    web = SynthWeb(seed=7, pages_per_host=20, branching=3)

    def mk_cfg(clock):
        return CrawlConfig(
            per_host=4, lease=2, max_retries=0, revisit=2,
            lease_mode="time", time_cache_seconds=3 * spr, clock=clock,
            selenium_enabled=False, n_filter_buckets=4,
        )

    c1 = Crawler(spark, str(tmp_path / "seedexp"), web, mk_cfg(_stepper(spr)))
    c1.seed(web.seeds())
    c1.run_round()  # round 0 @ t=0
    c1.run_round()  # round 1 @ t=100
    # re-seed (a mid-crawl CLI seed drop), then expire all older manifests
    c1.seed([web.url(web.hosts[1], 7)])
    c1.store.expire_snapshots(keep_last=1)
    c2 = Crawler(spark, str(tmp_path / "seedexp"), web, mk_cfg(_stepper(spr)))
    assert c2._round_ts[0] == 0.0 and c2._round_ts[1] == spr, (
        "seed commit dropped the round_ts history"
    )
