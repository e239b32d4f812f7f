"""IVF coarse-quantizer family: the distributed Lloyd trainer matches a
numpy reference under the same deterministic init/tie-breaks, assignment
is JVM-side, and the probed top-k equals brute force restricted to the
probed cells."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from darc_spark.functions.similarity import (
    ivf_assign,
    ivf_build,
    ivf_cells,
    ivf_topk,
)
from darc_spark.plans import assert_no_python

SF = "/root/testdata/sf0.001"


def _np_kmeans(X, ids, k, iters):
    order = np.argsort(ids)
    cells = X[order[:k]].astype(np.float64).copy()
    for _ in range(iters):
        d = ((X[:, None, :].astype(np.float64) - cells[None, :, :]) ** 2).sum(
            axis=2
        )
        assign = d.argmin(axis=1)  # argmin takes the FIRST min — same tie-break
        for c in range(k):
            m = assign == c
            if m.any():
                cells[c] = X[m].astype(np.float64).mean(axis=0)
    return cells


def test_ivf_build_matches_numpy(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").filter(
        F.col("vec_id") < 100
    )
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([list(r["embedding"]) for r in rows], dtype=np.float32)
    got = np.array(ivf_build(emb, k=4, iters=2))
    want = _np_kmeans(X, ids, k=4, iters=2)
    assert np.allclose(got, want, atol=1e-9), np.abs(got - want).max()


def test_ivf_assign_udf_free_and_total(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cells = ivf_cells(8, 64)
    assigned = ivf_assign(emb, cells)
    assert_no_python(assigned)
    rows = assigned.groupBy("cell").count().collect()
    assert sum(r["count"] for r in rows) == emb.count()  # total, no drops
    assert all(0 <= r["cell"] < 8 for r in rows)


def test_ivf_topk_equals_bruteforce_on_probed_cells(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    got = [
        (r["vec_id"], round(r["cosine"], 9))
        for r in ivf_topk(emb, qvec, k=5, n_cells=8, n_probe=2, exclude_id=0).collect()
    ]
    assert len(got) == 5
    # brute force restricted to the same probed cells must agree exactly
    cells = ivf_cells(8, 64)
    assigned = {r["vec_id"]: r["cell"] for r in ivf_assign(emb, cells).collect()}
    qd = []
    for i, c in enumerate(cells):
        n2 = sum(x * x for x in c)
        d = n2 - 2.0 * sum(float(a) * b for a, b in zip(qvec, c))
        qd.append((d, i))
    probe = {i for _, i in sorted(qd)[:2]}
    qn = np.sqrt(sum(v * v for v in qvec))
    brute = []
    for r in emb.collect():
        vid = r["vec_id"]
        if vid == 0 or assigned[vid] not in probe:
            continue
        v = np.array(list(r["embedding"]), dtype=np.float64)
        brute.append((vid, float(v @ np.array(qvec)) / (float(np.linalg.norm(v)) * qn)))
    brute.sort(key=lambda t: (-t[1], t[0]))
    want = [(vid, round(c, 9)) for vid, c in brute[:5]]
    assert [v for v, _ in got] == [v for v, _ in want]


def test_pq_encode_matches_numpy_argmin(spark):
    """Distributed PQ encoding == numpy per-subspace argmin over the
    same seeded codebooks (ties broken by first index on both sides)."""
    from darc_spark.functions.similarity import pq_codebooks, pq_encode

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    m, ksub, dims = 8, 16, 64
    dsub = dims // m
    books = pq_codebooks(m, ksub, dims)
    got = {
        r["vec_id"]: list(r["codes"]) for r in pq_encode(emb, books).collect()
    }
    B = np.array(books)  # (m, ksub, dsub)
    for r in emb.collect():
        v = np.array(list(r["embedding"]), dtype=np.float64)
        want = []
        for j in range(m):
            sub = v[j * dsub : (j + 1) * dsub]
            d = ((B[j] - sub) ** 2).sum(axis=1)
            want.append(int(np.argmin(d)))
        assert got[r["vec_id"]] == want, r["vec_id"]


def test_pq_adc_ranks_injected_near_dup_first(spark):
    """A perturbed copy of the query vector must land at the top of the
    ADC ranking — the compressed codes preserve near-duplicate
    structure (what PQ dedup/retrieval is for)."""
    from pyspark.sql import functions as F

    from darc_spark.functions.similarity import pq_adc_topk

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")
    dup = emb.filter(F.col("vec_id") == 0).select(
        F.lit(999999).cast("long").alias("vec_id"), "embedding"
    )
    qrow = emb.filter("vec_id = 0").head()
    q = [float(x) for x in qrow["embedding"]]
    top = pq_adc_topk(emb.unionByName(dup), q, k=2).collect()
    # the query's own vector and its copy share identical codes → the
    # two smallest ADC distances, tie-broken by id
    assert [r["vec_id"] for r in top] == [0, 999999]
    assert top[0]["adc_dist"] == top[1]["adc_dist"]


def test_pq_build_reduces_distortion_vs_seeded(spark):
    """Trained codebooks (per-subspace distributed Lloyd) must encode
    the corpus with lower total quantization error than the seeded
    random codebooks they replace."""
    from darc_spark.functions.similarity import (
        pq_build,
        pq_codebooks,
        pq_encode,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).limit(200)
    m, ksub, dims = 4, 8, 64
    dsub = dims // m
    rows = {
        r["vec_id"]: np.array(list(r["embedding"]), dtype=np.float64)
        for r in emb.collect()
    }

    def distortion(books):
        B = np.array(books)
        codes = {
            r["vec_id"]: list(r["codes"])
            for r in pq_encode(emb, books).collect()
        }
        tot = 0.0
        for vid, v in rows.items():
            for j in range(m):
                sub = v[j * dsub : (j + 1) * dsub]
                tot += float(((sub - B[j][codes[vid][j]]) ** 2).sum())
        return tot

    seeded = distortion(pq_codebooks(m, ksub, dims))
    trained = distortion(pq_build(emb, m=m, ksub=ksub, dims=dims, iters=2))
    assert trained < seeded * 0.8, (trained, seeded)


def test_ivfpq_subset_of_pq_pool(spark):
    """IVF-PQ results come from the probed pool only, and every
    returned row's ADC distance equals the plain-PQ distance for that
    vector (the composition changes the candidate SET, not the
    metric)."""
    from darc_spark.functions.similarity import ivfpq_topk, pq_adc_topk

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")
    q = [float(x) for x in emb.filter("vec_id = 0").head()["embedding"]]
    full = {
        r["vec_id"]: r["adc_dist"]
        for r in pq_adc_topk(emb, q, k=500, exclude_id=0).collect()
    }
    got = ivfpq_topk(emb, q, k=5, exclude_id=0).collect()
    assert len(got) == 5
    for r in got:
        assert r["adc_dist"] == full[r["vec_id"]]


def test_pq_encode_ksub256_compiles_fast_and_matches_numpy(spark):
    """Standard PQ parameters (m=8, ksub=256 byte codes) must be
    practical: the codebook rides as one nested-array Literal, so plan
    size is O(1) in ksub — the round-4 per-codeword expression trees
    (m·ksub·dsub nodes) made ksub=256 a 16×-bigger plan. Bounds the
    whole build+analyze+execute wall time and value-checks the codes
    against numpy argmin."""
    import time

    from darc_spark.functions.similarity import pq_codebooks, pq_encode

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").filter(
        F.col("vec_id") < 100
    )
    m, ksub, dims = 8, 256, 64
    dsub = dims // m
    books = pq_codebooks(m, ksub, dims)
    t0 = time.time()
    got = {
        r["vec_id"]: list(r["codes"]) for r in pq_encode(emb, books).collect()
    }
    elapsed = time.time() - t0
    assert elapsed < 30.0, f"ksub=256 encode took {elapsed:.1f}s — plan blowup"
    B = np.array(books)
    for r in emb.collect():
        v = np.array(list(r["embedding"]), dtype=np.float64)
        want = []
        for j in range(m):
            sub = v[j * dsub : (j + 1) * dsub]
            want.append(int(np.argmin(((B[j] - sub) ** 2).sum(axis=1))))
        assert got[r["vec_id"]] == want, r["vec_id"]


def test_residual_encoding_beats_raw(spark):
    """The canonical residual IVF-PQ claim: encoding v − centroid[cell]
    (residuals share a tight near-zero distribution) quantizes better
    than encoding raw vectors — measured two ways on the same corpus
    with codebooks TRAINED on each variant's own input:
    (a) total quantization distortion is lower (deterministic), and
    (b) ADC top-k recall vs exact L2 over the probed pool is ≥.

    Requires a TRAINED coarse quantizer (``ivf_build``): residuals are
    only small when centroids are means of real data — against the
    seeded random codebook, ||v − c|| exceeds ||v|| and residual
    encoding is strictly worse (verified while writing this test)."""
    from darc_spark.functions.similarity import (
        ivf_assign,
        ivf_build,
        ivf_residuals,
        ivfpq_topk_from_index,
        pq_build,
        probe_cells,
        write_ivfpq_index,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    m, ksub, dims, n_probe = 8, 16, 64, 2
    dsub = dims // m
    cells = ivf_build(emb, k=8, iters=2)
    assigned = ivf_assign(emb, cells)
    res_df = ivf_residuals(assigned, cells)
    books_raw = pq_build(emb, m=m, ksub=ksub, dims=dims, iters=2)
    books_res = pq_build(
        res_df.select("vec_id", "embedding"), m=m, ksub=ksub, dims=dims,
        iters=2,
    )

    # (a) distortion, computed in numpy from collected rows
    C = np.array(cells)
    rows = {
        r["vec_id"]: (np.array(list(r["embedding"]), dtype=np.float64),
                      r["cell"])
        for r in assigned.collect()
    }

    def distortion(books, residual):
        B = np.array(books)
        tot = 0.0
        for v, cell in rows.values():
            x = v - C[cell] if residual else v
            for j in range(m):
                sub = x[j * dsub : (j + 1) * dsub]
                d = ((B[j] - sub) ** 2).sum(axis=1)
                tot += float(d.min())
        return tot

    d_raw = distortion(books_raw, residual=False)
    d_res = distortion(books_res, residual=True)
    assert d_res < d_raw, (d_res, d_raw)

    # (b) recall@10 vs exact L2 over the probed pool, via the REAL
    # materialized-index path for both variants
    import tempfile

    q = [float(x) for x in emb.filter("vec_id = 0").head()["embedding"]]
    probe = set(probe_cells(q, cells, n_probe))
    pool = {
        vid: v for vid, (v, cell) in rows.items()
        if cell in probe and vid != 0
    }
    qv = np.array(q)
    exact = sorted(
        pool, key=lambda vid: (((pool[vid] - qv) ** 2).sum(), vid)
    )[:10]

    def recall(books, residual):
        path = tempfile.mkdtemp(prefix="ivfpq_recall_")
        write_ivfpq_index(emb, path, cells, books, residual=residual)
        idx = spark.read.parquet(path)
        got = [
            r["vec_id"]
            for r in ivfpq_topk_from_index(
                idx, q, cells, books, k=10, n_probe=n_probe,
                residual=residual, exclude_id=0,
            ).collect()
        ]
        return len(set(got) & set(exact)) / 10.0

    r_res = recall(books_res, residual=True)
    r_raw = recall(books_raw, residual=False)
    assert r_res >= r_raw, (r_res, r_raw)
    # sanity floor only: at m=8, ksub=16 (4-bit codes) recall@10 on this
    # corpus is ~0.3 — the comparative claim above is the test's point
    assert r_res >= 0.2, r_res


# ---------------------------------------------------------------------------
# batched multi-query serving + recall evaluation


def test_probe_cells_batch_matches_driver_probe(spark):
    from darc_spark.functions.similarity import probe_cells, probe_cells_batch

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cells = ivf_cells(8, 64)
    qdf = emb.filter(F.col("vec_id") < 12).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    got = {}
    for r in probe_cells_batch(qdf, cells, 3).collect():
        got.setdefault(r["q_id"], []).append(r["cell"])
    want = {
        r["q_id"]: probe_cells([float(x) for x in r["q_vec"]], cells, 3)
        for r in qdf.collect()
    }
    assert got == want


def test_ivf_topk_batch_equals_per_query_serving(spark, tmp_path):
    from darc_spark.functions.similarity import (
        ivf_topk_batch_from_index,
        ivf_topk_from_index,
        write_ivf_index,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cells = ivf_cells(8, 64)
    path = str(tmp_path / "ivf_idx")
    write_ivf_index(emb, path, cells)
    idx = spark.read.parquet(path)
    qdf = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    batch = {}
    for r in ivf_topk_batch_from_index(
        idx, qdf, cells, k=5, n_probe=2
    ).collect():
        batch.setdefault(r["q_id"], []).append((r["vec_id"], r["cosine"]))
    for qr in qdf.collect():
        q = [float(x) for x in qr["q_vec"]]
        single = [
            (r["vec_id"], r["cosine"])
            for r in ivf_topk_from_index(
                idx, q, cells, k=5, n_probe=2, exclude_id=qr["q_id"]
            ).collect()
        ]
        assert batch[qr["q_id"]] == single, qr["q_id"]


def test_cosine_topk_batch_equals_per_query(spark):
    from darc_spark.functions.similarity import cosine_topk, cosine_topk_batch

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qdf = emb.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    batch = {}
    for r in cosine_topk_batch(emb, qdf, k=7).collect():
        batch.setdefault(r["q_id"], []).append((r["vec_id"], r["cosine"]))
    for qr in qdf.collect():
        q = [float(x) for x in qr["q_vec"]]
        single = [
            (r["vec_id"], r["cosine"])
            for r in cosine_topk(
                emb, q, k=7, exclude_id=qr["q_id"]
            ).collect()
        ]
        assert batch[qr["q_id"]] == single, qr["q_id"]


def test_recall_at_k_counts_and_missing_queries(spark):
    from darc_spark.functions.similarity import recall_at_k

    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20), (2, 21), (3, 30), (3, 31)],
        "q_id long, vec_id long",
    )
    # q1: both hit; q2: one hit; q3: ANN returned nothing relevant
    approx = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20), (2, 99), (3, 98), (3, 97)],
        "q_id long, vec_id long",
    )
    got = {
        r["q_id"]: (r["hits"], r["recall_e6"])
        for r in recall_at_k(exact, approx, 2).collect()
    }
    assert got == {1: (2, 1000000), 2: (1, 500000), 3: (0, 0)}


def test_ivf_batch_pool_is_partition_pruned(spark, tmp_path):
    """The batched probe must read only the union of probed cells —
    the partition filter shows up in the scan, same contract as the
    single-query path asserted in test_plans.py."""
    from darc_spark.functions.similarity import (
        ivf_topk_batch_from_index,
        write_ivf_index,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cells = ivf_cells(8, 64)
    path = str(tmp_path / "ivf_idx")
    write_ivf_index(emb, path, cells)
    idx = spark.read.parquet(path)
    qdf = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    out = ivf_topk_batch_from_index(idx, qdf, cells, k=5, n_probe=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cell" in m.group(1), plan


def test_pq_adc_batch_equals_per_query(spark, tmp_path):
    from darc_spark.functions.similarity import (
        pq_adc_topk_batch_from_codes,
        pq_adc_topk_from_codes,
        pq_codebooks,
        write_pq_codes,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    books = pq_codebooks(4, 16, 64)
    path = str(tmp_path / "codes")
    write_pq_codes(emb, path, books)
    codes = spark.read.parquet(path)
    qdf = emb.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    batch = {}
    for r in pq_adc_topk_batch_from_codes(codes, qdf, books, k=5).collect():
        batch.setdefault(r["q_id"], []).append((r["vec_id"], r["adc_dist"]))
    for qr in qdf.collect():
        q = [float(x) for x in qr["q_vec"]]
        single = [
            (r["vec_id"], r["adc_dist"])
            for r in pq_adc_topk_from_codes(
                codes, q, books, k=5, exclude_id=qr["q_id"]
            ).collect()
        ]
        assert batch[qr["q_id"]] == single, qr["q_id"]


def test_l2_topk_batch_matches_numpy(spark):
    from darc_spark.functions.similarity import l2_topk_batch

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    rows = emb.collect()
    X = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    qdf = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    got = {}
    for r in l2_topk_batch(emb, qdf, k=6).collect():
        got.setdefault(r["q_id"], []).append(r["vec_id"])
    for qid in range(4):
        q = X[qid]
        want = sorted(
            (vid for vid in X if vid != qid),
            key=lambda vid: (((X[vid] - q) ** 2).sum(), vid),
        )[:6]
        assert got[qid] == want, qid


def test_trained_codebooks_beat_seeded_on_recall(spark, tmp_path):
    """The ML-quality claim for the PQ trainer: Lloyd-trained codebooks
    reconstruct the corpus better than the seeded random ones, so
    ADC recall@10 against the exact-L2 ground truth must improve."""
    from darc_spark.functions.similarity import (
        l2_topk_batch,
        pq_adc_topk_batch_from_codes,
        pq_build,
        pq_codebooks,
        recall_at_k,
        write_pq_codes,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qdf = emb.filter(F.col("vec_id") < 12).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    exact = l2_topk_batch(emb, qdf, k=10)

    def mean_recall(books, tag):
        path = str(tmp_path / tag)
        write_pq_codes(emb, path, books)
        codes = spark.read.parquet(path)
        approx = pq_adc_topk_batch_from_codes(codes, qdf, books, k=10)
        rows = recall_at_k(exact, approx, 10).collect()
        return sum(r["hits"] for r in rows) / (10.0 * len(rows))

    seeded = mean_recall(pq_codebooks(8, 16, 64), "seeded")
    trained = mean_recall(pq_build(emb, m=8, ksub=16, iters=2), "trained")
    assert trained > seeded, (trained, seeded)
    assert trained >= 0.3, trained  # sanity floor, not the point


def test_ivfpq_batch_equals_per_query(spark, tmp_path):
    from darc_spark.functions.similarity import (
        ivfpq_topk_batch_from_index,
        ivfpq_topk_from_index,
        pq_codebooks,
        write_ivfpq_index,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cells = ivf_cells(8, 64)
    books = pq_codebooks(8, 16, 64)
    path = str(tmp_path / "ivfpq_idx")
    write_ivfpq_index(emb, path, cells, books, residual=True)
    idx = spark.read.parquet(path)
    qdf = emb.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    batch = {}
    for r in ivfpq_topk_batch_from_index(
        idx, qdf, cells, books, k=5, n_probe=2, residual=True
    ).collect():
        batch.setdefault(r["q_id"], []).append((r["vec_id"], r["adc_dist"]))
    for qr in qdf.collect():
        q = [float(x) for x in qr["q_vec"]]
        single = [
            (r["vec_id"], r["adc_dist"])
            for r in ivfpq_topk_from_index(
                idx, q, cells, books, k=5, n_probe=2, residual=True,
                exclude_id=qr["q_id"],
            ).collect()
        ]
        assert batch[qr["q_id"]] == single, qr["q_id"]


def test_trained_ivfpq_recall_dwarfs_seeded(spark, tmp_path):
    """The recall eval as a tuning instrument: seeded (deterministic
    placeholder) residual IVF-PQ is near-useless on isotropic vectors
    — residuals against random-plane 'centroids' are LARGER than the
    raw vectors — while Lloyd-trained coarse cells + codebooks trained
    on true residuals lift recall@10 by an order of magnitude
    (measured 0.025 → ~0.29 at m=8/ksub=16/n_probe=2 on sf0.01)."""
    from darc_spark.functions.similarity import (
        ivf_residuals,
        ivfpq_topk_batch_from_index,
        l2_topk_batch,
        pq_build,
        pq_codebooks,
        recall_at_k,
        write_ivfpq_index,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qdf = emb.filter(F.col("vec_id") < 12).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    exact = l2_topk_batch(emb, qdf, k=10)

    def mean_recall(cells, books, tag):
        path = str(tmp_path / tag)
        write_ivfpq_index(emb, path, cells, books, residual=True)
        idx = spark.read.parquet(path)
        approx = ivfpq_topk_batch_from_index(
            idx, qdf, cells, books, k=10, n_probe=2, residual=True
        )
        rows = recall_at_k(exact, approx, 10).collect()
        return sum(r["hits"] for r in rows) / (10.0 * len(rows))

    seeded = mean_recall(
        ivf_cells(8, 64), pq_codebooks(8, 16, 64), "seeded"
    )
    tc = ivf_build(emb, k=8, iters=2)
    res = ivf_residuals(ivf_assign(emb, tc), tc)
    tb = pq_build(res, m=8, ksub=16, iters=2)
    trained = mean_recall(tc, tb, "trained")
    assert trained >= 3 * max(seeded, 0.02), (trained, seeded)
