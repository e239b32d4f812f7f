"""Caption-image alignment filtering (CLIP-score-style pair cleaning).

A web-scale image+caption corpus — the input shape this engine crawls
into its frontier/store tables — is cleaned for training by scoring
each pair's caption embedding against its image embedding and dropping
pairs whose cosine falls below a threshold (the LAION-style CLIP-score
filter: see Schuhmann et al., LAION-400M/5B, arXiv:2111.02114 /
2210.08402 — a public method). The embedding towers themselves are
external ML models with no runtime in this sandbox, so the text tower
is stood in by a deterministic hash projection (:func:`caption_embedding`)
— every Spark-side property of the real op is preserved and measured:

* the derived embedding is a PER-ROW pure Catalyst expression
  (``transform`` over a ``sequence``): no shuffle, no Python, runs
  inside whole-stage codegen next to the scan;
* the pair join is a key join on the id (image embeddings live in the
  embeddings table keyed like the caption row);
* the score is the JVM-side float64 ``dot/(norm*norm)`` chain shared
  with the similarity module, so the DuckDB oracle value-matches;
* the threshold is a plain comparison Catalyst can push around —
  filtering 10^10 pairs adds zero driver-side state.

Swapping the hash projection for a real text tower keeps the plan
identical: the embedding column instead arrives from a batch-inference
``mapInPandas`` (the same boundary ``multimodal.py`` uses for decode).

Reference analogue: darc keeps/drops fetched documents by MIME and
hostname rules (darc/parse.py:77-119, darc/submit.py savers); this is
the training-data variant — keep/drop by semantic pair coherence.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from darc_spark.functions.partitioning import fanout
from darc_spark.functions.similarity import dot, norm
from darc_spark.functions.text import h64


def caption_embedding(text: Column | str, dims: int) -> Column:
    """Deterministic text-tower stand-in: dimension ``j`` of the
    embedding is ``(h64(text || '#' || j) % 2001 - 1000) / 1000`` —
    uniform in [-1, 1], reproducible bit-for-bit in DuckDB (same
    md5-prefix hash as :func:`darc_spark.functions.text.h64`, same
    non-negative modulus). A pure per-row expression: no shuffle, no
    Python boundary, whole-stage-codegen resident."""
    c = F.col(text) if isinstance(text, str) else text
    return F.transform(
        F.sequence(F.lit(0), F.lit(dims - 1)),
        lambda j: (
            (h64(F.concat(c, F.lit("#"), j.cast("string"))) % F.lit(2001))
            - F.lit(1000)
        )
        / F.lit(1000.0),
    )


def align_score(cap_vec: Column, img_vec: Column, dims: int = 64) -> Column:
    """Cosine between the caption and image embeddings — the same
    float64 left-to-right ``dot/(norm*norm)`` chain as the similarity
    module, so engine and oracle agree to the last ulp. (``dims`` kept
    for API stability; the HOF fold reads the array width itself.)"""
    return dot(cap_vec, img_vec) / (norm(cap_vec) * norm(img_vec))


def align_pairs(
    captions: DataFrame,
    images: DataFrame,
    dims: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    img_id_col: str = "vec_id",
    img_vec_col: str = "embedding",
) -> DataFrame:
    """Score every caption-image pair: join captions to their image
    embeddings by id and attach ``align`` (cosine). One key join —
    at 10^10 pairs both sides shuffle-hash on the id (or co-locate if
    the tables are bucketed the same way); the caption embedding is
    derived in-line, never materialized."""
    # fanout before the per-dimension hash projection: dims md5 digests
    # per caption is the dominant cost of this query, and a single-split
    # documents scan would compute all of them on one core (§2.5)
    cap = fanout(captions).select(
        F.col(id_col),
        F.col(text_col),
        caption_embedding(text_col, dims).alias("_cap_vec"),
    )
    img = images.select(
        F.col(img_id_col).alias(id_col), F.col(img_vec_col).alias("_img_vec")
    )
    return (
        cap.join(img, id_col)
        .withColumn(
            "align", align_score(F.col("_cap_vec"), F.col("_img_vec"), dims)
        )
        .drop("_cap_vec", "_img_vec")
    )


def align_filter(
    captions: DataFrame,
    images: DataFrame,
    dims: int,
    threshold: float,
    **kwargs: str,
) -> DataFrame:
    """The CLIP-score keep gate: pairs with ``align >= threshold``.
    The comparison is a plain Catalyst predicate on top of
    :func:`align_pairs` — at scale it prunes the training corpus in
    the same pass that scores it (no second scan)."""
    return align_pairs(captions, images, dims, **kwargs).filter(
        F.col("align") >= F.lit(float(threshold))
    )
