"""Round-6 optimization guards.

* The scan-fanout repartition must be result-transparent and only fire
  on narrow inputs.
* The driver-side literal query norm (math.sqrt over the same
  left-to-right float64 fold) must be BIT-identical to the in-plan
  ``norm`` expression it replaced — every oracle hash depends on exact
  float64 op order.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from darc_spark.functions.partitioning import fanout
from darc_spark.functions.similarity import _dot_py, dot_lit, norm, plane


def test_fanout_widens_narrow_input_and_keeps_rows(spark):
    df = spark.range(0, 1000).coalesce(1)
    out = fanout(df, min_parts=4)
    assert out.rdd.getNumPartitions() >= 4
    assert out.count() == 1000
    assert set(r[0] for r in out.collect()) == set(range(1000))


def test_fanout_is_identity_on_wide_input(spark):
    df = spark.range(0, 100).repartition(8)
    out = fanout(df, min_parts=4)
    assert out is df


def test_fanout_min_bytes_skips_small_input(spark):
    """Size-adaptive serving fanout: below the estimate floor the
    exchange is skipped (serial evaluation is cheaper), above it the
    repartition fires; results identical either way."""
    df = spark.range(0, 1000).coalesce(1)
    small = fanout(df, min_parts=4, min_bytes=1 << 40)  # floor > any est
    assert small is df
    big = fanout(df, min_parts=4, min_bytes=1)  # floor below the est
    assert big is not df
    assert big.rdd.getNumPartitions() >= 4
    assert sorted(r[0] for r in big.collect()) == sorted(
        r[0] for r in small.collect()
    )


def test_literal_query_norm_bitwise_equals_inplan_norm(spark):
    """cosine scorers ship norm(q) as a driver-computed literal; it must
    equal sqrt(aggregate(zip_with(q,q,*),0.0,+)) to the last bit."""
    rng = random.Random(11)
    qs = [[rng.uniform(-1, 1) for _ in range(64)] for _ in range(20)]
    rows = [(i, q) for i, q in enumerate(qs)]
    df = spark.createDataFrame(rows, "id long, q array<double>")
    inplan = {r["id"]: r["n"] for r in df.select("id", norm(F.col("q")).alias("n")).collect()}
    for i, q in enumerate(qs):
        lit = math.sqrt(_dot_py(q, q))
        assert lit == inplan[i], (i, lit, inplan[i])


def test_dot_lit_equals_dot_on_array_literal(spark):
    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, a array<float>")
    p = plane(3, 64)
    from darc_spark.functions.similarity import dot

    arr = F.array(*[F.lit(float(v)) for v in p])
    n = df.count()
    eq = df.filter(dot(F.col("a"), arr) == dot_lit(F.col("a"), p)).count()
    assert eq == n
