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
