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


def _executed_files(df, id_col="vec_id"):
    """Files the scan ACTUALLY reads at execution (post partition
    pruning) — ``df.inputFiles()`` lists the relation's files BEFORE
    pruning, so the honest probe is ``input_file_name()`` over the
    executed rows."""
    return {
        r["f"]
        for r in df.select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    }


def test_ivf_index_probe_prunes_partitions(spark, tmp_path):
    """The materialized IVF index is parquet partitioned by cell, and a
    probe (cell IN probed) must prune at the source: the scan's
    PartitionFilters carry the cell predicate and the files read are
    ONLY the probed cells' directories — the design that makes a
    10^10-row index serve a query without touching the other
    n_cells − n_probe partitions."""
    from darc_spark.functions.similarity import (
        ivf_cells,
        ivf_topk_from_index,
        probe_cells,
        read_ann_index,
        write_ivf_index,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cells = ivf_cells(8, 64)
    path = str(tmp_path / "ivf_idx")
    write_ivf_index(emb, path, cells)

    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]
    ]
    idx = read_ann_index(spark, path)
    probed = ivf_topk_from_index(idx, qvec, cells, k=5, n_probe=2)
    probe = set(probe_cells(qvec, cells, 2))

    # 1. the scan plan carries the probe as a PARTITION filter
    plan = probed._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cell" in m.group(1) and " IN " in m.group(1), plan[:2000]

    # 2. execution reads ONLY the probed cells' files: input_file_name
    #    over the full probed pool (filter only — no topk truncation)
    pool = idx.filter(F.col("cell").isin(list(probe)))
    touched = {
        int(mm.group(1))
        for f in _executed_files(pool)
        for mm in [re.search(r"cell=(\d+)", f)]
        if mm
    }
    assert touched == probe, f"read cells {touched}, probed {probe}"
    # and the full index genuinely has more cells to skip
    all_cells = {
        int(mm.group(1))
        for f in spark.read.parquet(path).inputFiles()
        for mm in [re.search(r"cell=(\d+)", f)]
        if mm
    }
    assert len(all_cells) > len(probe)


def test_ivfpq_index_probe_prunes_partitions(spark, tmp_path):
    """Same pruning contract for the (id, codes, cell) IVF-PQ index —
    including the residual variant, whose per-cell LUT when-chain must
    not defeat partition pruning."""
    import re

    from darc_spark.functions.similarity import (
        ivf_cells,
        ivfpq_topk_from_index,
        pq_codebooks,
        probe_cells,
        read_ann_index,
        write_ivfpq_index,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cells = ivf_cells(8, 64)
    books = pq_codebooks(8, 16, 64)
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]
    ]
    probe = set(probe_cells(qvec, cells, 2))
    for residual in (False, True):
        path = str(tmp_path / f"ivfpq_idx_{residual}")
        write_ivfpq_index(emb, path, cells, books, residual=residual)
        idx = read_ann_index(spark, path)
        topk = ivfpq_topk_from_index(
            idx, qvec, cells, books, k=5, n_probe=2, residual=residual
        )
        plan = topk._jdf.queryExecution().executedPlan().toString()
        m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
        assert m and "cell" in m.group(1), (residual, plan[:2000])
        pool = idx.filter(F.col("cell").isin(list(probe)))
        touched = {
            int(mm.group(1))
            for f in _executed_files(pool)
            for mm in [re.search(r"cell=(\d+)", f)]
            if mm
        }
        assert touched == probe, (residual, touched, probe)
        # the index never stores embeddings: codes-only scan
        assert "embedding" not in idx.columns
