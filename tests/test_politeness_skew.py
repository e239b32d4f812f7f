"""Hot-host skew: salt escalation must not change claim results."""

from __future__ import annotations

from pyspark.sql import functions as F

from darc_spark.operators.politeness import per_host_top_k


def _frontier(spark):
    # one pathologically hot host (20k pending) + 50 cold hosts
    hot = spark.range(20000).select(
        F.lit("hot.example").alias("hostname"),
        F.concat(F.lit("http://hot.example/p"), F.col("id")).alias("url"),
        F.lit(0).alias("priority"),
        (F.col("id") % 7).alias("enqueue_round"),
    )
    cold = spark.range(200).select(
        F.concat(F.lit("c"), (F.col("id") % 50), F.lit(".example")).alias("hostname"),
        F.concat(F.lit("http://c/"), F.col("id")).alias("url"),
        F.lit(0).alias("priority"),
        F.lit(0).cast("long").alias("enqueue_round"),
    )
    return hot.unionByName(cold)


def test_escalated_salting_identical_results(spark):
    df = _frontier(spark)
    base = {
        (r["hostname"], r["url"])
        for r in per_host_top_k(df, 10, salt_shards=1).collect()
    }
    for kwargs in (
        dict(salt_shards=8),
        dict(salt_shards=8, escalate_above=500),
        dict(salt_shards=4, escalate_above=100, max_shards=64),
    ):
        got = {
            (r["hostname"], r["url"])
            for r in per_host_top_k(df, 10, **kwargs).collect()
        }
        assert got == base, kwargs


def test_budget_enforced_under_skew(spark):
    out = per_host_top_k(_frontier(spark), 10, salt_shards=8, escalate_above=500)
    counts = {r["hostname"]: r["n"] for r in out.groupBy("hostname").agg(F.count("*").alias("n")).collect()}
    assert counts["hot.example"] == 10
    assert all(v <= 10 for v in counts.values())
    assert len(counts) == 51


def test_auto_escalation_from_prior_round_metrics(spark, tmp_path):
    """escalate_above="auto": the threshold is derived per round from the
    PREVIOUS round's host-pending metrics in the commit manifest. A host
    that becomes hot mid-crawl (link graph funnels into hot.example as
    discovery proceeds) must cross the derived threshold with NO config
    change, and claims must equal the static-threshold run exactly
    (escalation is result-identical by construction)."""
    from darc_spark.operators.crawl import Crawler, CrawlConfig
    from darc_spark.sources.synth import SynthWeb

    base = dict(
        per_host=2, lease=2, max_retries=0,
        salt_shards=2, selenium_enabled=False, n_filter_buckets=4,
    )
    # many hosts keep the fleet MEAN low while hot_share funnels ~1/3 of
    # every round's extracted links into hosts[0] — the mid-crawl hot host
    web = SynthWeb(
        seed=13,
        hosts=tuple(
            ["hot.example"] + [f"h{i:02d}.example" for i in range(39)]
        ),
        pages_per_host=400,
        branching=6,
        hot_share=80,
    )

    seeds = [web.url(h, i) for h in web.hosts for i in range(3)]
    auto = Crawler(
        spark, str(tmp_path / "auto"), web,
        CrawlConfig(**base, escalate_above="auto"),
    )
    auto.seed(seeds)
    auto.run(3)

    static = Crawler(
        spark, str(tmp_path / "static"), web,
        CrawlConfig(**base, escalate_above=1 << 16),
    )
    static.seed(seeds)
    static.run(3)

    def fetches(c):
        return {
            tuple(r)
            for r in c.store.read("fetches")
            .select("fetch_round", "hostname", "url", "status_code")
            .collect()
        }

    assert fetches(auto) == fetches(static)

    # the metrics show a round where the hot host EXCEEDED the derived
    # threshold — i.e. auto-escalation actually fired mid-crawl
    mt = {
        (r["round"], r["metric"]): r["value"]
        for r in auto.metrics_table().collect()
    }
    fired = [
        r
        for r in range(3)
        if (r, "host_pending_max") in mt
        and mt[(r, "host_pending_max")] > mt[(r, "escalate_threshold")]
    ]
    assert fired, f"hot host never crossed the derived threshold: {mt}"
    # and the threshold MOVED round-over-round (it is metric-driven)
    thresholds = {mt[(r, "escalate_threshold")] for r in range(3) if (r, "escalate_threshold") in mt}
    assert len(thresholds) > 1, thresholds
