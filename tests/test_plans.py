"""Plan-shape contract tests: pushdown, broadcast, Python boundaries."""

from __future__ import annotations

from pyspark.sql import functions as F

from darc_spark.plans import (
    assert_broadcast_join,
    assert_no_python,
    assert_pushed_filters,
    python_eval_count,
)

SF = "/root/testdata/sf0.001"


def test_filter_pushdown_reaches_scan(spark):
    df = spark.read.parquet(f"{SF}/lineitem.parquet").filter(
        F.col("l_quantity") > 40
    ).select("l_orderkey", "l_quantity")
    assert_pushed_filters(df, "GreaterThan(l_quantity,40.0)")


def test_column_pruning(spark):
    df = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_orderkey")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema: struct<l_orderkey:bigint>" in plan


def test_dim_join_broadcasts(spark):
    import __spark_entry__ as e

    assert_broadcast_join(e.q_link_graph_join(spark, SF), expected=1)


def test_text_ops_are_udf_free(spark):
    import __spark_entry__ as e

    for q in (e.q_token_count, e.q_fingerprint, e.q_quality_score,
              e.q_dedup_exact, e.q_dedup_simhash, e.q_hostname_agg,
              e.q_sessionize, e.q_tpch_q1):
        assert_no_python(q(spark, SF))


def test_frontier_claim_udf_free(spark):
    import __spark_entry__ as e

    assert_no_python(e.q_frontier_claim(spark, SF))


def test_classify_single_python_boundary(spark):
    import __spark_entry__ as e

    assert python_eval_count(e.q_link_classify(spark, SF)) == 1


def test_cosine_near_pairs_band_join_ships_ids_only(spark):
    """The banded candidate self-join must not carry embedding payloads
    (the round-2 scale regression): every exchange feeding the band-key
    join carries only (id, band_idx, band_val); embeddings enter the
    plan again only via the by-id re-join for the exact verify."""
    from darc_spark.functions.similarity import cosine_near_pairs

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = cosine_near_pairs(emb, threshold=0.35, n_bits=16, dims=64)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the band join is the one on band_idx/band_val — find its join line
    band_joins = [
        ln for ln in plan.splitlines()
        if "Join" in ln and "band_idx" in ln
    ]
    assert band_joins, plan
    for ln in band_joins:
        assert "embedding" not in ln, ln
    # similarity ops stay JVM-side end to end
    from darc_spark.plans import assert_no_python

    assert_no_python(out)


def test_ann_and_cosine_ops_udf_free(spark):
    import __spark_entry__ as e
    from darc_spark.plans import assert_no_python

    for q in (e.q_cosine_topk, e.q_ann_lsh, e.q_ann_topk,
              e.q_cosine_near_pairs, e.q_phash_hamming):
        assert_no_python(q(spark, SF))
