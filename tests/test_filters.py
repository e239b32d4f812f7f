"""Filter predicate semantics (darc/parse.py:62-155) on Spark columns."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from darc_spark.operators.filters import (
    match_host_drop,
    match_mime_drop,
    match_proxy_drop,
    normalize_content_type,
)


def _eval(spark, col_expr, values, schema="v string"):
    df = spark.createDataFrame([(v,) for v in values], schema)
    return [r["drop"] for r in df.select(col_expr.alias("drop")).collect()]


def test_proxy_script_always_dropped(spark):
    out = _eval(
        spark,
        match_proxy_drop(F.col("v"), white_list=["script"], fallback=False),
        ["script", "tor", "null"],
    )
    assert out == [True, False, False]


def test_proxy_black_over_white(spark):
    out = _eval(
        spark,
        match_proxy_drop(F.col("v"), white_list=["tor"], black_list=["tor"], fallback=False),
        ["tor"],
    )
    assert out == [True]


def test_proxy_fallback(spark):
    out = _eval(
        spark,
        match_proxy_drop(F.col("v"), white_list=["tor"], fallback=True),
        ["tor", "i2p"],
    )
    assert out == [False, True]


def test_host_null_always_dropped(spark):
    out = _eval(spark, match_host_drop(F.col("v")), [None, "ok.example"])
    assert out == [True, False]


def test_host_regex_fullmatch_anchored(spark):
    # fullmatch semantics: pattern must cover the whole hostname
    out = _eval(
        spark,
        match_host_drop(F.col("v"), black_list=[r".*?\.evil\.example"]),
        ["a.evil.example", "evil.example.good.org", "fine.example"],
    )
    assert out == [True, False, False]


def test_host_white_list_wins_over_fallback(spark):
    out = _eval(
        spark,
        match_host_drop(F.col("v"), white_list=[r".*?\.onion"], fallback=True),
        ["x.onion", "clear.example"],
    )
    assert out == [False, True]


def test_mime_lists(spark):
    out = _eval(
        spark,
        match_mime_drop(
            F.col("v"), white_list=[r"text/.*"], black_list=[r"text/xml"], fallback=True
        ),
        ["text/html", "text/xml", "image/png"],
    )
    assert out == [False, True, True]


def test_normalize_content_type(spark):
    out = _eval(
        spark,
        normalize_content_type(F.col("v")).alias("drop"),
        ["Text/HTML; charset=UTF-8", "application/json"],
    )
    assert out == ["text/html", "application/json"]


def test_filters_plan_is_native(spark):
    df = spark.createDataFrame([("tor",)], "v string")
    plan = (
        df.filter(~match_proxy_drop(F.col("v"), black_list=["script"]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan
