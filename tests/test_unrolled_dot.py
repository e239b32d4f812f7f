"""Round-6 optimization guards: the unrolled codegen dot/norm chain must
be BIT-identical to the higher-order-function fold it replaced (every
oracle hash depends on exact float64 op order), and the scan-fanout
repartition must be result-transparent."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from darc_spark.functions.partitioning import fanout
from darc_spark.functions.similarity import (
    dot,
    norm,
    plane,
    udot,
    udot_lit,
    unorm,
)


@pytest.fixture(scope="module")
def vec_df(spark):
    rng = random.Random(17)
    rows = [
        (
            i,
            [rng.uniform(-1, 1) for _ in range(64)],
            [rng.uniform(-1, 1) for _ in range(64)],
        )
        for i in range(300)
    ]
    return spark.createDataFrame(rows, "id long, a array<double>, b array<double>")


def _all_true(df, col):
    n = df.count()
    assert df.filter(col).count() == n


def test_udot_bitwise_equals_hof_dot(vec_df):
    _all_true(vec_df, dot(F.col("a"), F.col("b")) == udot(F.col("a"), F.col("b"), 64))


def test_unorm_bitwise_equals_hof_norm(vec_df):
    _all_true(vec_df, norm(F.col("a")) == unorm(F.col("a"), 64))


def test_udot_lit_bitwise_equals_hof_dot_on_literal(vec_df):
    p = plane(5, 64)
    lit_arr = F.array(*[F.lit(float(v)) for v in p])
    _all_true(vec_df, dot(F.col("a"), lit_arr) == udot_lit(F.col("a"), p))


def test_udot_float32_cast_path(spark):
    rng = random.Random(3)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(64)], [rng.uniform(-1, 1) for _ in range(64)]) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, a array<float>, b array<float>")
    _all_true(df, dot(F.col("a"), F.col("b")) == udot(F.col("a"), F.col("b"), 64))


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
