"""Similarity search over embedding columns (``array<float>``).

* :func:`cosine_topk` — brute-force exact top-k: JVM-side
  ``zip_with``/``aggregate`` dot products (no Python), broadcast query
  vector. The O(N) baseline every ANN variant is checked against.
* :func:`lsh_signatures` / :func:`ann_lsh_topk` — random-hyperplane LSH:
  sign-bit signatures against a deterministic plane set; candidates are
  the query's bucket only (prefix-band), then exact cosine re-rank. At
  10^10 rows the bucket join replaces the full scan — the signature
  table is the "index".
* :func:`hamming_near_pairs` — signature-level near-dup pairs via
  ``xor``+``bit_count``, banded by signature prefix to avoid the cross
  join (the embedding analogue of phash near-dup for images).

All expressions are SQL-portable; the plane matrix is generated
deterministically (md5-based) so the DuckDB oracle uses the *same
literal planes*.
"""

from __future__ import annotations

import hashlib
import math
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from darc_spark.functions.partitioning import fanout

# Size floor for the per-query serving fanouts (signature planes, exact
# scoring): vector arithmetic is cheap per byte (~µs/row), so below this
# estimate the serial evaluation beats the fixed cost of an extra
# exchange+AQE stage (measured on a 0.8 MB / 2000-vector corpus: the
# fanned plan is 0.2-1.0 s SLOWER per query). Index BUILDS keep the
# unconditional fanout — they are one-time and their multi-file output
# layout is what parallelizes the serving scans. Parameterized for
# clusters (env), local default 2 MB; at 100-TB scale inputs dwarf any
# threshold and fanout is a no-op regardless.
_SERVE_FANOUT_MIN_BYTES = int(
    os.environ.get("DARC_SPARK_FANOUT_MIN_BYTES", str(2 << 20))
)


def plane(i: int, dims: int) -> list[float]:
    """Deterministic pseudo-random hyperplane ∈ [-1,1)^dims."""
    out = []
    for d in range(dims):
        h = int(hashlib.md5(f"{i}:{d}".encode()).hexdigest()[:15], 16)
        out.append((h % 2000) / 1000.0 - 1.0)
    return out


def dot(a: Column, b: Column) -> Column:
    # Cast elements to double BEFORE multiplying: float32×float32 products
    # summed into a double diverge from per-element-double oracles (DuckDB
    # casts each element to DOUBLE first) at the 1e-6 rounding boundary.
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def dot_lit(a: Column, p: list[float]) -> Column:
    """:func:`dot` against a literal vector.

    Round-6 measurement note (kept so nobody re-tries it): unrolling
    these fixed-width folds into per-term ``get(a,i)*lit`` chains is a
    LOSS on Spark 4 — the HOF ``aggregate``/``zip_with`` form evaluates
    faster (0.46 s vs 1.05 s for a 400 k-row cosine; 2.46 s vs 3.71 s
    for an 8-plane signature), and wide chains (≥ ~1000 terms, or fewer
    under ANSI ``element_at``) exceed the JVM's 64 KB generated-method
    limit inside whole-stage codegen, degrading the WHOLE stage to
    interpreted execution (measured +279 % on cosine_near_pairs). The
    scan :func:`fanout` is what actually parallelizes these
    expressions."""
    return dot(a, F.array(*[F.lit(float(v)) for v in p]))


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    # query norm is a constant: computed driver-side with the same
    # left-to-right float64 fold (and IEEE sqrt) the in-plan expression
    # used — bit-identical literal, zero per-row work
    qn = math.sqrt(_dot_py(query_vec, query_vec))
    dims = len(query_vec)
    scored = fanout(df, min_bytes=_SERVE_FANOUT_MIN_BYTES).select(
        F.col(id_col),
        (
            dot_lit(F.col(vec_col), [float(v) for v in query_vec])
            / (norm(F.col(vec_col)) * F.lit(qn))
        ).alias("cosine"),
    )
    if exclude_id is not None:
        scored = scored.filter(F.col(id_col) != exclude_id)
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def signature(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign-bit LSH signature (bit i = dot(v, plane_i) >= 0).

    Built with shiftleft + bitwise OR, not integer literals + addition:
    bit 63 (1<<63) overflows a signed long literal, and long ADDITION of
    that bit pattern errors under ANSI mode — OR of shifted bits is the
    overflow-free construction for full-width 64-bit signatures."""
    sig: Column = F.lit(0).cast("long")
    one = F.lit(1).cast("long")
    for i, p in enumerate(planes):
        bit = F.when(
            dot_lit(vec_col, p) >= 0, F.shiftleft(one, i)
        ).otherwise(F.lit(0).cast("long"))
        sig = sig.bitwiseOR(bit)
    return sig


def lsh_signatures(
    df: DataFrame,
    n_bits: int = 8,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    planes = [plane(i, dims) for i in range(n_bits)]
    # fanout before the n_bits×dims signature expression: a single-split
    # scan would otherwise compute every plane dot on one core (§2.5);
    # size-gated — below the floor the serial plan is cheaper than the
    # exchange (and every consumer is partitioning-transparent)
    return fanout(df, min_bytes=_SERVE_FANOUT_MIN_BYTES).select(
        F.col(id_col), F.col(vec_col), signature(F.col(vec_col), planes).alias("sig")
    )


def ann_lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 5,
    n_bits: int = 8,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """ANN: exact cosine re-rank restricted to the query's LSH bucket."""
    planes = [plane(i, dims) for i in range(n_bits)]
    sigs = lsh_signatures(df, n_bits, dims, id_col, vec_col)
    qsig = 0
    for i, p in enumerate(planes):
        if sum(a * b for a, b in zip(query_vec, p)) >= 0:
            qsig |= 1 << i
    if qsig >= 1 << 63:  # mirror the signed-long wrap of signature()
        qsig -= 1 << 64
    bucket = sigs.filter(F.col("sig") == qsig)
    qn = math.sqrt(_dot_py(query_vec, query_vec))
    scored = bucket.select(
        F.col(id_col),
        (
            dot_lit(F.col(vec_col), [float(v) for v in query_vec])
            / (norm(F.col(vec_col)) * F.lit(qn))
        ).alias("cosine"),
    )
    if exclude_id is not None:
        scored = scored.filter(F.col(id_col) != exclude_id)
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def cosine_near_pairs(
    df: DataFrame,
    threshold: float = 0.99,
    n_bits: int = 64,
    dims: int = 64,
    band_bits: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-banded.

    Contract: pairs that collide in ≥1 signature band AND have exact
    cosine ≥ ``threshold`` — the standard bucketed near-dup shape
    (candidates from banding, verification exact). Like all LSH, the
    banding is the recall knob: near-identical vectors agree on nearly
    every signature bit, so they collide in nearly every band; the
    DuckDB oracle mirrors the band expression so the contract is
    value-checked, and the unit test measures recall vs brute force.

    Scale: bucket sizes are bounded by rows agreeing on a specific
    ``band_bits``-bit signature slice — never an all-pairs cross join —
    and **band entropy must scale with the corpus**: candidate volume is
    Σ bucket², so the number of distinct (band_idx, band_val) keys has
    to dwarf sqrt(candidate budget). The defaults (64-bit signature, 4
    bands of 16 bits → 65536 buckets per band) are the 10^8-10^10-row
    shape; at the near-dup thresholds this operator exists for (≥0.9
    cosine ⇒ per-bit agreement ≳0.95) a 16-bit band still collides with
    p≈0.45, so 4 bands give ≈90% recall per pair. Narrow bands (e.g.
    4 bits) only make sense for permissive-similarity mining on small
    corpora — they collapse to ~n²/2^band_bits candidates at scale.
    The band self-join carries **ids only** (like
    :func:`hamming_near_pairs`); embeddings are re-joined by id after the
    candidate set is deduplicated, so the candidate shuffle never ships
    vector payloads (×n_bands) and the exact-cosine verify runs once per
    distinct pair.

    .. versionchanged:: round 4
       Defaults changed from ``n_bits=16, band_bits=4`` (near-exact
       collision behavior, small-corpus only) to ``n_bits=64,
       band_bits=16``: callers relying on the old defaults get ≈90%
       per-pair recall at 0.9+ thresholds instead of ≈100%; pass the
       old values explicitly to restore permissive banding.
    """
    n_bands = n_bits // band_bits
    sigs = lsh_signatures(df, n_bits, dims, id_col, vec_col).select(id_col, "sig")
    banded = sigs.select(
        id_col,
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("sig"), b * band_bits).bitwiseAND(
                        F.lit((1 << band_bits) - 1)
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band_idx", "band_val"),
    ).cache()  # feeds both sides of the self-join
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()  # a pair may collide in several bands — verify once
    )
    vecs = df.select(id_col, vec_col)
    va = vecs.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("_vec_a")
    )
    vb = vecs.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vec_b")
    )
    cos = dot(F.col("_vec_a"), F.col("_vec_b")) / (
        norm(F.col("_vec_a")) * norm(F.col("_vec_b"))
    )
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def ivf_cells(n_cells: int, dims: int) -> list[list[float]]:
    """Deterministic seeded codebook for the IVF coarse quantizer.

    A stand-in for a trained codebook (:func:`ivf_build` is the
    trainer): determinism is what the value-checked contract needs —
    the DuckDB oracle embeds the *same literals*. Offset 1000 keeps the
    codewords disjoint from the LSH plane family.
    """
    return [plane(1000 + i, dims) for i in range(n_cells)]


def _codeword_dists(vec: Column, book: list[list[float]]) -> Column:
    """Array of per-codeword comparable distances ||c||² − 2·v·c (the
    ||v||² term is constant under argmin, so it is dropped on BOTH
    sides).

    The codebook and its norms ride as TWO array ``Literal`` nodes and
    the per-codeword arithmetic is a ``zip_with`` lambda, so the plan
    is O(1) in the codebook size — the round-4 per-codeword expression
    trees grew the plan m·ksub·dsub-fold, which capped PQ at ksub=16;
    this shape compiles ksub=256 byte codes as fast as ksub=16. The
    float64 op order (norm literal − 2·left-to-right dot) is unchanged,
    so every existing DuckDB oracle still value-matches."""
    bl = F.lit([[float(v) for v in c] for c in book])
    nl = F.lit([float(sum(x * x for x in c)) for c in book])
    return F.zip_with(
        bl,
        nl,
        lambda c, n2: n2
        - F.lit(2.0)
        * F.aggregate(
            F.zip_with(vec, c, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )


def _argmin_code(vec: Column, book: list[list[float]]) -> Column:
    """Nearest-codeword index (argmin squared-L2, first index wins
    ties) — JVM-side expressions only, no Python."""
    darr = _codeword_dists(vec, book)
    return (F.array_position(darr, F.array_min(darr)) - 1).cast("int")


def ivf_assign(
    df: DataFrame,
    cells: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest codeword (argmin squared-L2,
    first index wins ties) — JVM-side expressions only, no Python."""
    cell = _argmin_code(F.col(vec_col), cells)
    return df.select(F.col(id_col), F.col(vec_col), cell.alias("cell"))


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 5,
    n_cells: int = 8,
    n_probe: int = 2,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """IVF ANN: exact cosine re-rank restricted to the ``n_probe``
    nearest coarse cells of the query.

    The 10^10-scale path: the inverted-file assignment replaces the full
    scan — only the probed cells' vectors are scored. Probe-cell choice
    uses the same float64 left-to-right arithmetic as the assignment
    expressions (and the DuckDB oracle), so the contract is exact.
    """
    cells = ivf_cells(n_cells, dims)
    return ivf_topk_from_index(
        ivf_assign(df, cells, id_col, vec_col),
        query_vec,
        cells,
        k=k,
        n_probe=n_probe,
        id_col=id_col,
        vec_col=vec_col,
        exclude_id=exclude_id,
    )


def probe_cells(
    query_vec: list[float], cells: list[list[float]], n_probe: int
) -> list[int]:
    """The query's ``n_probe`` nearest coarse cells, computed
    driver-side on literals with the SAME float64 left-to-right
    arithmetic as the assignment expressions (and the DuckDB oracle),
    so probe choice is exact on both sides."""
    qd = []
    for i, c in enumerate(cells):
        c_norm2 = sum(x * x for x in c)
        qd.append((c_norm2 - 2.0 * _dot_py(query_vec, c), i))
    return [i for _, i in sorted(qd)[:n_probe]]


def write_ivf_index(
    df: DataFrame,
    path: str,
    cells: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the inverted file: assign once, write parquet
    **partitioned by cell**. This is the index-build step a real
    10^10-row deployment runs offline — serving queries never re-run
    the assignment; they read only the probed cells' partitions
    (:func:`ivf_topk_from_index` + :func:`read_ann_index`), which
    partition pruning turns into a file-level skip of the other
    ``n_cells − n_probe`` directories."""
    ivf_assign(fanout(df), cells, id_col, vec_col).write.partitionBy(
        "cell"
    ).mode("overwrite").parquet(path)


def read_ann_index(spark, path: str) -> DataFrame:
    """Open a materialized ANN index table (written by
    :func:`write_ivf_index` / :func:`write_ivfpq_index`). A plain
    partitioned-parquet read: ``cell`` is a partition column, so a
    probe filter prunes at file-listing time."""
    return spark.read.parquet(path)


def ivf_topk_from_index(
    index_df: DataFrame,
    query_vec: list[float],
    cells: list[list[float]],
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """Exact cosine re-rank over the ``n_probe`` probed cells of a
    PRECOMPUTED assignment table — the serving path. With ``index_df``
    read from a cell-partitioned parquet index the probe filter prunes
    partitions (only probed directories are listed/scanned); with a
    freshly computed assignment it degrades to the one-shot
    :func:`ivf_topk`."""
    probe = probe_cells(query_vec, cells, n_probe)
    pool = index_df.filter(F.col("cell").isin(probe))
    qn = math.sqrt(_dot_py(query_vec, query_vec))
    scored = pool.select(
        F.col(id_col),
        (
            dot_lit(F.col(vec_col), [float(v) for v in query_vec])
            / (norm(F.col(vec_col)) * F.lit(qn))
        ).alias("cosine"),
    )
    if exclude_id is not None:
        scored = scored.filter(F.col(id_col) != exclude_id)
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def _topk_per_query(
    scored: DataFrame,
    k: int,
    q_id_col: str,
    id_col: str,
    score_col: str = "cosine",
    ascending: bool = False,
) -> DataFrame:
    """Top-k rows per query by (score, id ASC) — two-stage.

    Stage 1 prunes to the k best rows per (query, input partition):
    the shuffle key space is Q × P, so a small query batch against a
    huge corpus never funnels the whole score table through Q reducer
    partitions. Stage 2 ranks the surviving ≤ Q·P·k rows globally per
    query. The global top-k is always a subset of the union of
    per-partition top-ks, so the two-stage result is exact.
    """
    from pyspark.sql import Window

    sc = F.col(score_col).asc() if ascending else F.col(score_col).desc()
    local = Window.partitionBy(q_id_col, F.col("_pid")).orderBy(
        sc, F.col(id_col)
    )
    pruned = (
        scored.withColumn("_pid", F.spark_partition_id())
        .withColumn("_lrn", F.row_number().over(local))
        .filter(F.col("_lrn") <= k)
        .drop("_pid", "_lrn")
    )
    final = Window.partitionBy(q_id_col).orderBy(sc, F.col(id_col))
    return (
        pruned.withColumn("_rn", F.row_number().over(final))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def cosine_topk_batch(
    df: DataFrame,
    queries_df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact multi-query cosine top-k: broadcast the (small) query
    batch against the corpus and rank per query.

    Deliberately O(Q·N) — this is the ground-truth side of an ANN
    recall evaluation, run over a SAMPLED query batch, not a serving
    path. Scoring is JVM-side ``zip_with``/``aggregate``, run after a
    :func:`fanout` of the corpus scan so the Q·N score stream
    parallelizes; ranking is the two-stage per-partition prune of
    :func:`_topk_per_query`, so the only full-size intermediate is the
    score stream itself. Returns (q_id, id, cosine) rows, ≤ k per query.
    """
    j = fanout(df).crossJoin(F.broadcast(queries_df))
    scored = j.select(
        F.col(q_id_col),
        F.col(id_col),
        (
            dot(F.col(vec_col), F.col(q_vec_col))
            / (norm(F.col(vec_col)) * norm(F.col(q_vec_col)))
        ).alias("cosine"),
    )
    if exclude_self:
        scored = scored.filter(F.col(id_col) != F.col(q_id_col))
    return _topk_per_query(scored, k, q_id_col, id_col)


def probe_cells_batch(
    queries_df: DataFrame,
    cells: list[list[float]],
    n_probe: int,
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Per-query probe-cell choice, JVM-side: one (q_id, q_vec, cell)
    row per probed cell. Distances use the same ``||c||² − 2·v·c``
    literals and float64 op order as :func:`_codeword_dists`, and the
    (dist, cell) tie-break matches the driver-side
    :func:`probe_cells` and the DuckDB oracle — ``array_sort`` on
    (dist, cell) structs is the lexicographic sort ``sorted()`` does.
    """
    qd = _codeword_dists(F.col(q_vec_col), cells)
    idx = F.sequence(F.lit(0), F.lit(len(cells) - 1))
    pairs = F.zip_with(
        qd, idx, lambda d, i: F.struct(d.alias("d"), i.alias("cell"))
    )
    top = F.slice(F.array_sort(pairs), 1, n_probe)
    return queries_df.select(
        F.col(q_id_col),
        F.col(q_vec_col),
        F.explode(F.transform(top, lambda s: s["cell"])).alias("cell"),
    )


def ivf_topk_batch_from_index(
    index_df: DataFrame,
    queries_df: DataFrame,
    cells: list[list[float]],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    exclude_self: bool = True,
) -> DataFrame:
    """Batched IVF serving over a materialized index: every query in
    the batch probes its ``n_probe`` nearest cells; the index is read
    ONCE filtered to the union of probed cells (a static ``isin`` on
    the partition column → file-level pruning, same as the single-query
    path), then a broadcast join fans each index row out to only the
    queries probing its cell. The probe list collect is bounded
    metadata: ≤ ``len(cells)`` distinct values.
    """
    probes = probe_cells_batch(
        queries_df, cells, n_probe, q_id_col, q_vec_col
    )
    probed = sorted(
        r["cell"] for r in probes.select("cell").distinct().collect()
    )
    pool = index_df.filter(F.col("cell").isin(probed))
    j = pool.join(F.broadcast(probes), "cell")
    scored = j.select(
        F.col(q_id_col),
        F.col(id_col),
        (
            dot(F.col(vec_col), F.col(q_vec_col))
            / (norm(F.col(vec_col)) * norm(F.col(q_vec_col)))
        ).alias("cosine"),
    )
    if exclude_self:
        scored = scored.filter(F.col(id_col) != F.col(q_id_col))
    return _topk_per_query(scored, k, q_id_col, id_col)


def l2_topk_batch(
    df: DataFrame,
    queries_df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact multi-query squared-L2 top-k — the ground truth the PQ/ADC
    family is measured against (ADC approximates squared L2, not
    cosine). Same O(Q·N) broadcast-scan + two-stage-rank shape as
    :func:`cosine_topk_batch` (fanned-out corpus scan); float64
    left-to-right accumulation matches DuckDB's ``list_reduce``.
    Returns (q_id, id, l2) rows."""
    j = fanout(df).crossJoin(F.broadcast(queries_df))
    diff2 = F.aggregate(
        F.zip_with(
            F.col(vec_col),
            F.col(q_vec_col),
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = j.select(F.col(q_id_col), F.col(id_col), diff2.alias("l2"))
    if exclude_self:
        scored = scored.filter(F.col(id_col) != F.col(q_id_col))
    return _topk_per_query(
        scored, k, q_id_col, id_col, score_col="l2", ascending=True
    )


def pq_adc_topk_batch_from_codes(
    codes_df: DataFrame,
    queries_df: DataFrame,
    books: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    exclude_self: bool = True,
) -> DataFrame:
    """Batched ADC serving over a PRECOMPUTED code table: one LUT per
    query (built driver-side from a bounded collect of the query batch
    — Q×m×ksub doubles), shipped as a small broadcast DataFrame; the
    code table is scanned ONCE and every (code row × query) pair costs
    m array lookups + adds, in subspace order (same float64 chain as
    the single-query literal-LUT path, so the oracle value-matches).
    Returns (q_id, id, adc_dist) rows, ≤ k per query."""
    spark = codes_df.sparkSession
    qrows = queries_df.select(q_id_col, q_vec_col).collect()
    lut_rows = [
        (r[q_id_col], adc_lut([float(x) for x in r[q_vec_col]], books))
        for r in qrows
    ]
    luts = spark.createDataFrame(
        lut_rows, f"{q_id_col} long, _lut array<array<double>>"
    )
    j = codes_df.crossJoin(F.broadcast(luts))
    dist: Column | None = None
    for sub in range(len(books)):
        term = F.element_at(
            F.element_at(F.col("_lut"), sub + 1),
            F.col("codes").getItem(sub) + 1,
        )
        dist = term if dist is None else dist + term
    assert dist is not None
    scored = j.select(
        F.col(q_id_col), F.col(id_col), dist.alias("adc_dist")
    )
    if exclude_self:
        scored = scored.filter(F.col(id_col) != F.col(q_id_col))
    return _topk_per_query(
        scored, k, q_id_col, id_col, score_col="adc_dist", ascending=True
    )


def ivfpq_topk_batch_from_index(
    index_df: DataFrame,
    queries_df: DataFrame,
    cells: list[list[float]],
    books: list[list[list[float]]],
    k: int = 10,
    n_probe: int = 2,
    residual: bool = False,
    id_col: str = "vec_id",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    exclude_self: bool = True,
) -> DataFrame:
    """Batched IVF-PQ serving over a materialized ``(id, codes, cell)``
    index: the query batch probes its cells, the index is read ONCE
    filtered to the probed union (partition pruning), and one ADC LUT
    per (query, probed cell) — built driver-side from the bounded
    Q×n_probe probe set, residual LUTs from q − centroid — rides a
    broadcast join keyed on the partition column. Distance is the same
    subspace-ordered lookup-sum chain as the single-query path.
    Returns (q_id, id, adc_dist) rows, ≤ k per query."""
    spark = index_df.sparkSession
    probes = probe_cells_batch(
        queries_df, cells, n_probe, q_id_col, q_vec_col
    )
    prows = probes.collect()  # bounded metadata: Q × n_probe rows
    probed = sorted({r["cell"] for r in prows})
    pool = index_df.filter(F.col("cell").isin(probed))
    lut_rows = []
    for r in prows:
        qv = [float(x) for x in r[q_vec_col]]
        qr = (
            [a - float(b) for a, b in zip(qv, cells[r["cell"]])]
            if residual
            else qv
        )
        lut_rows.append((r[q_id_col], r["cell"], adc_lut(qr, books)))
    luts = spark.createDataFrame(
        lut_rows, f"{q_id_col} long, cell int, _lut array<array<double>>"
    )
    j = pool.join(F.broadcast(luts), "cell")
    dist: Column | None = None
    for sub in range(len(books)):
        term = F.element_at(
            F.element_at(F.col("_lut"), sub + 1),
            F.col("codes").getItem(sub) + 1,
        )
        dist = term if dist is None else dist + term
    assert dist is not None
    scored = j.select(
        F.col(q_id_col), F.col(id_col), dist.alias("adc_dist")
    )
    if exclude_self:
        scored = scored.filter(F.col(id_col) != F.col(q_id_col))
    return _topk_per_query(
        scored, k, q_id_col, id_col, score_col="adc_dist", ascending=True
    )


def recall_at_k(
    exact: DataFrame,
    approx: DataFrame,
    k: int,
    q_id_col: str = "q_id",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-query recall@k of an ANN result against the exact top-k:
    |approx ∩ exact| / k. Pure integer arithmetic (hit counts), so the
    output is oracle-exact; queries whose ANN result misses everything
    still get a row (left join from the exact side's query set).
    Returns (q_id, hits, recall_e6).
    """
    qs = exact.select(q_id_col).distinct()
    hits = (
        exact.join(approx, [q_id_col, id_col], "left_semi")
        .groupBy(q_id_col)
        .agg(F.count("*").alias("hits"))
    )
    h = F.coalesce(F.col("hits"), F.lit(0))
    return qs.join(hits, q_id_col, "left").select(
        F.col(q_id_col),
        h.cast("long").alias("hits"),
        F.floor(h * 1000000 / k + 0.5).cast("long").alias("recall_e6"),
    )


def _dot_py(a: list[float], b: list[float]) -> float:
    """Left-to-right float64 dot — bit-identical to ``F.aggregate`` /
    DuckDB ``list_reduce`` accumulation order."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + float(x) * float(y)
    return acc


def ivf_build(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Distributed Lloyd trainer for the IVF codebook.

    Init = the vectors with the ``k`` smallest ids (deterministic);
    each iteration assigns distributed (argmin expressions) and
    re-averages per (cell, dimension) via ``posexplode`` — a dims-fold
    row blowup, fine for an offline index-build step (the scan per
    iteration is the cost; centroid state is k×dims tiny). Empty cells
    keep their previous centroid. Returns driver-side literals for
    :func:`ivf_topk`.
    """
    seed_rows = (
        df.orderBy(id_col).limit(k).select(id_col, vec_col).collect()
    )
    cells = [[float(x) for x in r[vec_col]] for r in seed_rows]
    for _ in range(iters):
        assigned = ivf_assign(df, cells, id_col, vec_col)
        means = (
            assigned.select(
                "cell", F.posexplode(F.col(vec_col)).alias("pos", "x")
            )
            .groupBy("cell", "pos")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .collect()
        )
        new_cells = [list(c) for c in cells]
        for r in means:
            new_cells[int(r["cell"])][int(r["pos"])] = float(r["m"])
        cells = new_cells
    return cells


def pq_codebooks(m: int, ksub: int, dims: int) -> list[list[list[float]]]:
    """Deterministic seeded product-quantization codebooks:
    ``books[j][c]`` = centroid ``c`` of subspace ``j`` (dsub = dims/m).
    Seeded like :func:`ivf_cells` (offset 2000 keeps the family disjoint
    from LSH planes and IVF cells) so the DuckDB oracle embeds the same
    literals; :func:`pq_build` is the trained replacement.

    Codewords are scaled to the magnitude class of UNIT-NORM embeddings:
    a unit vector's subvector has expected norm 1/√m, while a raw
    ``plane`` draw has norm ≈ √(dsub/3) — without the √(3/dims) scale
    the ||c||² term dominates every argmin, the smallest-norm codeword
    absorbs the whole corpus, and all vectors collapse onto one code
    per subspace (zero-information quantization)."""
    dsub = dims // m
    s = (3.0 / dims) ** 0.5
    return [
        [[s * v for v in plane(2000 + j * ksub + c, dsub)] for c in range(ksub)]
        for j in range(m)
    ]


def pq_encode(
    df: DataFrame,
    books: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantize each vector to ``m`` small codes — the
    10^10-scale MEMORY path: a 64-dim float vector becomes m (=8) byte
    codes, a 32× shrink, and every downstream distance is a lookup.
    Per subspace: slice → argmin ||sub − c||² over the book (same
    comparable-distance expressions as :func:`ivf_assign`, first index
    wins ties) — JVM-side only, no Python."""
    m, dsub = len(books), len(books[0][0])
    codes = []
    for j, book in enumerate(books):
        sub = F.slice(F.col(vec_col), j * dsub + 1, dsub)
        codes.append(_argmin_code(sub, book))
    return df.select(F.col(id_col), F.array(*codes).alias("codes"))


def pq_adc_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 5,
    m: int = 8,
    ksub: int = 16,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    books: list[list[list[float]]] | None = None,
    exclude_id: int | None = None,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes.

    The query builds an m×ksub lookup table of ||q_j − c||² driver-side
    (tiny, ships as literals); each row's distance is then a pure
    literal-array lookup sum — NO per-row vector math, which is what
    makes scanning 10^10 compressed codes feasible. Non-residual PQ
    (codes quantize the raw vector): exactly SQL-mirrorable; the
    IVF-residual variant is the same plan shape plus a broadcast join
    to the coarse centroid. Distance terms accumulate in subspace
    order, matching the oracle's ordered list_reduce."""
    if books is None:
        books = pq_codebooks(m, ksub, dims)
    return pq_adc_topk_from_codes(
        pq_encode(df, books, id_col, vec_col),
        query_vec,
        books,
        k=k,
        id_col=id_col,
        exclude_id=exclude_id,
    )


def adc_lut(
    query_vec: list[float], books: list[list[list[float]]]
) -> list[list[float]]:
    """The query's m×ksub table of ||q_j − c||², driver-side float64
    left-to-right (tiny; ships as one literal)."""
    dsub = len(books[0][0])
    lut: list[list[float]] = []
    for j, book in enumerate(books):
        qj = [float(v) for v in query_vec[j * dsub : (j + 1) * dsub]]
        row = []
        for c in book:
            acc = 0.0
            for a, b in zip(qj, c):
                d = float(a) - float(b)
                acc = acc + d * d
            row.append(acc)
        lut.append(row)
    return lut


def _adc_dist_expr(lut: list[list[float]], codes_col: Column) -> Column:
    """Lookup-sum ADC distance: one nested-array Literal holds the
    whole LUT (plan size O(m), not O(m·ksub)); terms accumulate in
    subspace order, matching the oracle's ordered list_reduce."""
    ll = F.lit([[float(v) for v in row] for row in lut])
    dist: Column | None = None
    for j in range(len(lut)):
        term = F.element_at(
            F.element_at(ll, j + 1), codes_col.getItem(j) + 1
        )
        dist = term if dist is None else dist + term
    assert dist is not None
    return dist


def write_pq_codes(
    df: DataFrame,
    path: str,
    books: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the PQ code table: encode once offline, write
    parquet. The codes are the index — m small ints per vector (32×
    smaller than the embedding) — and serving queries
    (:func:`pq_adc_topk_from_codes`) scan ONLY this table with
    literal-lookup sums: no embedding column is ever read at query
    time, which is the whole point of scanning 10^10 compressed rows."""
    # fanout: encode in parallel AND leave >1 output file so serving
    # scans of the code table parallelize (single-split input otherwise
    # writes one file → every later ADC scan runs on one core)
    pq_encode(fanout(df), books, id_col, vec_col).write.mode(
        "overwrite"
    ).parquet(path)


def pq_adc_topk_from_codes(
    codes_df: DataFrame,
    query_vec: list[float],
    books: list[list[list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    exclude_id: int | None = None,
) -> DataFrame:
    """ADC top-k over a PRECOMPUTED code table (``(id, codes)`` —
    written by :func:`write_pq_codes`, or the ``codes`` column of an
    IVF-PQ index): per-query cost is a codes scan + literal LUT only,
    never a re-encode of the corpus."""
    scored = codes_df.select(
        F.col(id_col),
        _adc_dist_expr(adc_lut(query_vec, books), F.col("codes")).alias(
            "adc_dist"
        ),
    )
    if exclude_id is not None:
        scored = scored.filter(F.col(id_col) != exclude_id)
    return scored.orderBy(F.col("adc_dist").asc(), F.col(id_col)).limit(k)


def ivfpq_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 5,
    n_cells: int = 8,
    n_probe: int = 2,
    m: int = 8,
    ksub: int = 16,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """IVF-PQ: the canonical 10^10-scale ANN index — coarse inverted-file
    pruning (scan only the ``n_probe`` nearest cells) composed with the
    PQ compressed-code ADC scan (32× smaller rows, lookup-only
    distances). Non-residual codes (see :func:`pq_adc_topk`); both
    component contracts are independently oracle-checked and the
    composition has its own oracle."""
    cells = ivf_cells(n_cells, dims)
    books = pq_codebooks(m, ksub, dims)
    assigned = ivf_assign(df, cells, id_col, vec_col)
    # build the (id, codes, cell) shape inline and delegate to the
    # from-index probe — one code path for fresh and materialized runs
    dsub = dims // m
    codes = [
        _argmin_code(F.slice(F.col(vec_col), j * dsub + 1, dsub), book)
        for j, book in enumerate(books)
    ]
    index_df = assigned.select(
        F.col(id_col), F.array(*codes).alias("codes"), F.col("cell")
    )
    return ivfpq_topk_from_index(
        index_df,
        query_vec,
        cells,
        books,
        k=k,
        n_probe=n_probe,
        id_col=id_col,
        exclude_id=exclude_id,
    )


def ivf_residuals(
    df_with_cell: DataFrame,
    cells: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Replace ``vec_col`` with the residual v − centroid[cell] (the
    canonical IVF-PQ encode input: residuals concentrate near 0, so a
    shared codebook quantizes them far better than raw vectors). One
    nested-array Literal holds the centroids; per-row lookup + zip_with
    subtraction, float64."""
    cl = F.lit([[float(v) for v in c] for c in cells])
    cent = F.element_at(cl, F.col("cell") + 1)
    res = F.zip_with(
        F.col(vec_col), cent, lambda x, y: x.cast("double") - y
    )
    return df_with_cell.withColumn(vec_col, res)


def write_ivfpq_index(
    df: DataFrame,
    path: str,
    cells: list[list[float]],
    books: list[list[list[float]]],
    residual: bool = False,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF-PQ index: coarse-assign + PQ-encode once,
    write ``(id, codes, cell)`` parquet **partitioned by cell**. The
    serving read (:func:`ivfpq_topk_from_index`) probe-filters on the
    partition column — only the probed cells' files are listed — and
    scans codes only (no embeddings in the index at all: the table is
    ~32× smaller than the corpus). ``residual=True`` encodes
    v − centroid[cell] (the canonical index; recall beats raw-vector
    codes because residuals share a tight distribution)."""
    assigned = ivf_assign(fanout(df), cells, id_col, vec_col)
    enc_in = (
        ivf_residuals(assigned, cells, vec_col) if residual else assigned
    )
    dsub = len(books[0][0])
    codes = [
        _argmin_code(F.slice(F.col(vec_col), j * dsub + 1, dsub), book)
        for j, book in enumerate(books)
    ]
    enc_in.select(
        F.col(id_col), F.array(*codes).alias("codes"), F.col("cell")
    ).write.partitionBy("cell").mode("overwrite").parquet(path)


def ivfpq_topk_from_index(
    index_df: DataFrame,
    query_vec: list[float],
    cells: list[list[float]],
    books: list[list[list[float]]],
    k: int = 5,
    n_probe: int = 2,
    residual: bool = False,
    id_col: str = "vec_id",
    exclude_id: int | None = None,
) -> DataFrame:
    """ADC top-k over a PRECOMPUTED ``(id, codes, cell)`` IVF-PQ index
    — the serving path: probe-filter (partition-pruned when the index
    is a cell-partitioned parquet table) then literal-LUT lookup sums.
    ``residual=True`` matches an index built with residual encoding:
    each probed cell gets its own LUT built from q − centroid[cell]
    (n_probe tiny tables, selected by a when-chain on the partition
    column)."""
    probe = probe_cells(query_vec, cells, n_probe)
    pool = index_df.filter(F.col("cell").isin(probe))
    if residual:
        dist: Column | None = None
        expr = None
        for p in probe:
            qr = [
                float(a) - float(b)
                for a, b in zip(query_vec, cells[p])
            ]
            term = _adc_dist_expr(adc_lut(qr, books), F.col("codes"))
            expr = (
                F.when(F.col("cell") == p, term)
                if expr is None
                else expr.when(F.col("cell") == p, term)
            )
        dist = expr
    else:
        dist = _adc_dist_expr(adc_lut(query_vec, books), F.col("codes"))
    scored = pool.select(F.col(id_col), dist.alias("adc_dist"))
    if exclude_id is not None:
        scored = scored.filter(F.col(id_col) != exclude_id)
    return scored.orderBy(F.col("adc_dist").asc(), F.col(id_col)).limit(k)


def pq_build(
    df: DataFrame,
    m: int = 8,
    ksub: int = 16,
    dims: int = 64,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Train PQ codebooks: an independent distributed Lloyd run
    (:func:`ivf_build`) per subspace slice — m sequential offline
    index-build jobs, each scanning only its dims/m slice. Returns
    driver-side literals shaped like :func:`pq_codebooks`."""
    dsub = dims // m
    return [
        ivf_build(
            df.select(
                F.col(id_col),
                F.slice(F.col(vec_col), j * dsub + 1, dsub).alias(vec_col),
            ),
            k=ksub,
            iters=iters,
            id_col=id_col,
            vec_col=vec_col,
        )
        for j in range(m)
    ]


def hamming_near_pairs(
    df: DataFrame,
    n_bits: int = 16,
    dims: int = 64,
    max_hamming: int = 3,
    band_bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Signature near-dup pairs via **multi-band** LSH.

    The signature splits into ``n_bits / band_bits`` disjoint bands;
    candidates must agree on at least one ``(band_index, band_value)``
    key, then the exact ≤ ``max_hamming`` predicate decides. With the
    defaults (4 bands, max_hamming 3 < 4 bands) recall is EXACT by
    pigeonhole — any pair within hamming 3 differs in at most 3 bands,
    so it collides in ≥ 1 — which the all-pairs DuckDB oracle asserts.

    Scale: a single band key (round-1 shape: ``sig % 16``) gives only
    2^band_bits buckets — ~quadratic within each at 10^10 rows. Here a
    bucket is ``(band_index, value)`` — 4 × 2^band_bits keys — and,
    more importantly, each bucket's population is rows agreeing on a
    *specific* 4-bit slice, the standard bounded-bucket banding; AQE
    skew-join splits residual hot buckets.
    """
    sigs = lsh_signatures(df, n_bits, dims, id_col, vec_col).select(id_col, "sig")
    return hamming_pairs_from_sigs(
        sigs,
        n_bits=n_bits,
        band_bits=band_bits,
        max_hamming=max_hamming,
        id_col=id_col,
    )


def hamming_pairs_from_sigs(
    sigs: DataFrame,
    n_bits: int = 16,
    band_bits: int = 4,
    max_hamming: int = 3,
    id_col: str = "vec_id",
    sig_col: str = "sig",
) -> DataFrame:
    """Banded hamming near-dup pairs over a PRECOMPUTED signature
    column — e.g. the image table's perceptual ``phash`` (64-bit
    average hash): (id, sig) in, (id_a, id_b, hamming ≤ max) out. The
    pigeonhole recall guarantee and bucket-bound scale shape are those
    of :func:`hamming_near_pairs` (which delegates here after deriving
    LSH signatures from embeddings). Arithmetic shiftright + mask keeps
    band values correct for full-width signed 64-bit signatures."""
    n_bands = n_bits // band_bits
    sigs = sigs.select(F.col(id_col), F.col(sig_col).alias("sig"))
    banded = sigs.select(
        id_col,
        "sig",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("sig"), b * band_bits).bitwiseAND(
                        F.lit((1 << band_bits) - 1)
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band_idx", "band_val"),
    ).cache()  # feeds both sides of the self-join
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(
                F.col("a.sig").bitwiseXOR(F.col("b.sig"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()  # a pair may collide in several bands
    )
