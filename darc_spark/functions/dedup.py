"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Each is a composition of built-in DataFrame ops (explode / groupBy /
self-join) — no Python UDFs — with exactly-matching ANSI-SQL oracles in
``__spark_entry__``. Scale notes per operator:

* exact        — one hash-aggregate on md5(text); shuffle on the digest
                 (uniform, no skew).
* minhash LSH  — shingle→minhash per band → candidates join per
                 (band, signature): the classic shuffle-once banding; a
                 hot signature (boilerplate dup cluster) is bounded by
                 the cluster size itself, and AQE skew-join splits it.
* simhash      — explode tokens → one groupBy(doc) with B conditional
                 sums (map-side partial agg) → near-dup by signature.
* n-gram jaccard — candidate pairs restricted to shared-shingle pairs
                 (anti cross-join); verification is exact set overlap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from darc_spark.functions.partitioning import fanout
from darc_spark.functions.text import h64, tokens

SHINGLE_K = 3


def shingles(col, k: int = SHINGLE_K):
    """k-word shingles, [] for short docs. SQL-portable.

    Built with ``zip_with`` over shifted slices rather than
    ``transform(sequence, i -> element_at(toks, i+j))`` — Catalyst
    re-inlines the tokenizer into lambda bodies, so the element_at form
    re-splits the whole document once per shingle (O(tokens²) per row,
    measured 10× slower). The slice form evaluates the tokenizer O(k)
    times per row.
    """
    toks = tokens(col)
    n = F.size(toks)
    length = F.greatest(n - (k - 1), F.lit(0))
    sh = F.slice(toks, 1, length)
    for j in range(1, k):
        nxt = F.slice(tokens(col), F.lit(j + 1), length)
        sh = F.zip_with(sh, nxt, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.when(n >= k, sh).otherwise(F.array().cast("array<string>"))


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact duplicate groups by content digest; keeps min id as canonical."""
    return (
        df.select(F.md5(F.col(text_col)).alias("digest"), F.col(id_col))
        .groupBy("digest")
        .agg(
            F.count("*").alias("n_copies"),
            F.min(id_col).alias("canonical_id"),
        )
        .filter(F.col("n_copies") > 1)
    )


def minhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bands: int = 4
) -> DataFrame:
    """(id, band, min over shingles of h64(band||'#'||shingle)) rows."""
    # fanout before shingling: bands×shingles md5 hashing is the heavy
    # per-row work, and a single-split scan would run it on one core.
    # NO size(sh)>0 pre-filter: explode drops empty arrays itself, and a
    # deterministic filter on the shingle expression would be pushed
    # back through the repartition into the serial scan (with the whole
    # shingle expression inlined into the pushed predicate).
    sh = fanout(df).select(
        F.col(id_col), shingles(F.col(text_col)).alias("sh")
    )
    exploded = sh.select(id_col, F.explode("sh").alias("shingle"))
    # ONE shuffle: all band-minima in a single hash aggregate (map-side
    # partial min), then stack wide→long without another shuffle
    agged = exploded.groupBy(id_col).agg(
        *[
            F.min(h64(F.concat(F.lit(f"{b}#"), F.col("shingle")))).alias(f"mh{b}")
            for b in range(bands)
        ]
    )
    stack_args = ", ".join(f"{b}, mh{b}" for b in range(bands))
    return agged.selectExpr(
        id_col, f"stack({bands}, {stack_args}) as (band, minhash)"
    )


def minhash_lsh_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bands: int = 4
) -> DataFrame:
    """Candidate near-dup pairs: docs colliding in ≥1 LSH band."""
    # cache: the signature table (docs×bands rows, tiny next to the
    # corpus) feeds both sides of the self-join — compute it once
    sigs = minhash_signatures(df, id_col, text_col, bands).cache()
    a = sigs.alias("a")
    b = sigs.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.minhash") == F.col("b.minhash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .agg(F.count("*").alias("n_bands"))
    )


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 64
) -> DataFrame:
    """SimHash over token multiset: bit b set iff Σ±1 over tokens ≥ 0.

    Default width is 64: a 16-bit signature has only 65,536 buckets, so
    at 10^10 docs every bucket collides and "same signature" stops
    meaning "near-duplicate". The signature is assembled with
    shiftleft+bitwiseOR (not a sum of python-int literals) so bit 63 is
    exact on the signed long.
    """
    toks = fanout(df).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    hashed = toks.withColumn("th", h64(F.col("tok")))
    sums = hashed.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("th"), b).bitwiseAND(F.lit(1)) == 1, 1)
                .otherwise(-1)
            ).alias(f"s{b}")
            for b in range(bits)
        ]
    )
    sig = None
    for b in range(bits):
        term = F.when(
            F.col(f"s{b}") >= 0, F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(F.lit(0).cast("long"))
        sig = term if sig is None else sig.bitwiseOR(term)
    return sums.select(F.col(id_col), sig.cast("long").alias("simhash"))


def simhash_dup_groups(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 64
) -> DataFrame:
    """Docs sharing an identical SimHash signature (near-dup buckets)."""
    return (
        simhash(df, id_col, text_col, bits)
        .groupBy("simhash")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("canonical_id"))
        .filter(F.col("n_docs") > 1)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.3,
    max_shingle_df: int | None = 100,
) -> DataFrame:
    """Exact n-gram Jaccard over shared-shingle candidate pairs.

    ``max_shingle_df`` drops shingles whose document frequency exceeds
    the cap BEFORE the self-join (one extra groupBy). Without it, one
    boilerplate shingle ("all rights reserved …") shared by 10^6 docs
    makes the candidate join quadratic per shingle group (~10^12 rows);
    with it, every join group is ≤ cap² — the standard DataSketches-
    style bound. Jaccard is then computed over the *surviving* shingle
    space (both intersection and sizes), i.e. similarity over
    non-boilerplate content — the semantic the dedup literature uses.
    """
    sh = (
        fanout(df)
        .select(F.col(id_col), F.explode(shingles(F.col(text_col))).alias("shingle"))
        .distinct()
    )
    if max_shingle_df is not None:
        dfreq = sh.groupBy("shingle").agg(F.count("*").alias("_df"))
        sh = (
            sh.join(dfreq.filter(F.col("_df") <= max_shingle_df), "shingle")
            .drop("_df")
        )
    sh = sh.cache()  # feeds sizes + both join sides
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iters: int = 25,
) -> DataFrame:
    """Connected components over a near-dup pair graph → cluster labels.

    The "cluster then keep one canonical copy" step of a training-data
    dedup pipeline: pairs from any candidate generator (MinHash bands,
    simhash, cosine) become clusters, labeled by their minimum member
    id. Iterative min-label propagation on DataFrames (the classic
    MapReduce-CC shape): each round every node takes the min of its own
    label and its neighbors' labels, until a fixpoint — iterations are
    O(diameter), and near-dup clusters are shallow, so this converges in
    a few rounds even at 10^10 docs. Per-iteration cost is one join +
    one aggregation, both on the node id (uniform shuffle); the
    convergence probe is a single count aggregate.

    Returns (node, component) for every node appearing in ``pairs``.
    """
    # localCheckpoint (eager) truncates lineage each iteration — the
    # standard guard for iterative DataFrame algorithms, where nesting
    # every round's plan inside the next blows up driver-side planning.
    # Checkpointed frames are bounded at the cluster's parallelism: the
    # both-directions union otherwise materializes 2× the shuffle
    # partition count, and every loop iteration then maps near-empty
    # tasks over it (pure stage overhead at small edge counts; at scale
    # defaultParallelism tracks the cluster).
    loop_parts = pairs.sparkSession.sparkContext.defaultParallelism
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(
            pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
        .distinct()
        .repartition(loop_parts, F.col("src"))
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    changed = -1  # -1 = loop never ran (max_iters <= 0 with edges present)
    for _ in range(max_iters):
        # every node's candidate label = min over incoming neighbor labels
        nbr = (
            edges.join(labels, edges.src == labels.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        stepped = labels.join(nbr, "node", "left").select(
            "node",
            F.least(
                F.col("label"), F.coalesce("nbr_label", F.col("label"))
            ).alias("label"),
            F.col("label").alias("_prev"),
        )
        # pointer jumping (path compression): follow label→label-of-label,
        # so convergence is O(log diameter) instead of O(diameter) —
        # long chain-shaped near-dup clusters would otherwise need one
        # iteration per hop
        hop = stepped.select(
            F.col("node").alias("_ln"), F.col("label").alias("_ll")
        )
        # carry the pre-iteration label through the checkpoint so the
        # convergence probe is a filter+count over the MATERIALIZED
        # frame — the old shape re-joined old and new labels, adding a
        # shuffle join job per iteration for the same answer
        new_labels = (
            stepped.join(hop, stepped.label == hop._ln, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("_ll", F.col("label"))
                ).alias("label"),
                F.col("_prev"),
            )
            .localCheckpoint()
        )
        changed = new_labels.filter(F.col("label") != F.col("_prev")).count()
        labels = new_labels.drop("_prev")
        if changed == 0:
            break
    else:
        # pointer jumping converges in ~log2(diameter) rounds, so hitting
        # max_iters with changes outstanding means the labels are WRONG
        # (partial clusters) — fail loudly rather than let keep_canonical
        # emit a silently-corrupt corpus
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} "
            f"iterations ({changed} labels still changing)"
        )
    return labels.select(F.col("node"), F.col("label").alias("component"))


def keep_canonical(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> DataFrame:
    """Materialize the deduplicated corpus: cluster the near-dup pair
    graph and keep each component's canonical member (minimum id) plus
    every unpaired document — the final "emit the training set" step.
    One anti-join against the non-canonical members; docs payloads never
    enter the clustering shuffles."""
    comp = connected_components(pairs, a_col=a_col, b_col=b_col)
    drop = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return docs.join(drop, id_col, "left_anti")
