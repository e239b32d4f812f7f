"""End-to-end corpus-cleaning pipeline — the composite a training-data
run actually executes, as one declarative DataFrame plan.

quality filter → language filter → exact dedup → near-dup
keep-canonical, composed from the individually-oracle-checked stages
(``text.quality_score``/``lang_id``, ``dedup.minhash_lsh_pairs`` +
``dedup.keep_canonical``). Reference analogue: darc archives every
fetched document (``darc/save.py``); this is the downstream curation a
consumer of that archive runs before training.

Scale shape: every stage is a Catalyst expression or an already-audited
shuffle — the quality/language filters push down to the scan, exact
dedup is one hash-partition on the content digest, the near-dup block
reuses the single-shuffle MinHash signatures and the pointer-jumping
connected components. No Python in the plan; text payloads enter
exactly two shuffles (digest partition, shingle explode→agg).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from darc_spark.functions.dedup import keep_canonical, minhash_lsh_pairs
from darc_spark.functions.partitioning import fanout
from darc_spark.functions.text import lang_pred as lang_pred_rule
from darc_spark.functions.text import quality_score


def clean_corpus(
    docs: DataFrame,
    quality_min: float = 0.5,
    lang_pred: str = "en",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The cleaned corpus: rows of ``docs`` that pass the quality bar,
    are language-identified as ``lang_pred``, and survive exact and
    near-duplicate dedup (each duplicate group keeps its minimum id).

    Returns the surviving rows with ``docs``'s columns.
    """
    # fanout + checkpoint before scoring: the quality/LID expressions
    # (the tokenizer regex alone is ~1 ms/row on multi-KB documents) are
    # the pipeline's per-row cost. A bare fanout is NOT enough — the
    # quality filter is a deterministic predicate, so Catalyst pushes it
    # back through the repartition into the (single-split) scan and the
    # whole filter runs on one core again; the checkpoint is the barrier
    # that keeps the expensive predicate on the fanned-out side (§2.5).
    scored = quality_score(fanout(docs, barrier=True), text_col)
    kept = scored.filter(
        (F.col("quality") >= F.lit(quality_min))
        & (lang_pred_rule(F.col("stop_ratio")) == F.lit(lang_pred))
    ).select(*docs.columns)
    # exact dedup: one shuffle on the content digest, min id survives
    w = Window.partitionBy(F.md5(F.col(text_col)))
    uniq = (
        kept.withColumn("_min_id", F.min(id_col).over(w))
        .filter(F.col(id_col) == F.col("_min_id"))
        .drop("_min_id")
        # materialize once: the kept set feeds BOTH the MinHash
        # signature build and the final keep_canonical anti-join —
        # without the cut-point the whole filter+window pipeline
        # re-executes per consumer (cache, not checkpoint: plan-identity
        # stable, so repeat runs of the same query reuse it like the
        # signature cache below)
        .cache()
    )
    pairs = minhash_lsh_pairs(uniq, id_col=id_col, text_col=text_col)
    return keep_canonical(uniq, pairs, id_col=id_col)
