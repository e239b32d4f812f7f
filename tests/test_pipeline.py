"""End-to-end corpus-cleaning pipeline (functions/pipeline.py):
each stage must do its job on a corpus crafted to hit every branch."""

from __future__ import annotations

from darc_spark.functions.pipeline import clean_corpus

BASE = (
    "the quick brown fox jumps over the lazy dog and runs on to the "
    "hills with a friend in tow for fun today " * 3
)


def test_clean_corpus_stages(spark):
    rows = [
        (1, BASE, "en"),
        # exact duplicate (same bytes) → digest dedup keeps min id 1
        (2, BASE, "en"),
        # same TOKEN stream, different bytes (case+punct) → identical
        # shingle set → collides in every MinHash band → near-dup of 1
        (3, BASE.upper() + "!!!", "en"),
        # too short → quality < 0.5
        (4, "short", "en"),
        # long but stopword-free → lang-ID 'other'
        (5, "zzz qqq xxx vvv www uuu ttt sss " * 30, "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    kept = {r["doc_id"] for r in clean_corpus(docs).collect()}
    assert kept == {1}


def test_clean_corpus_keeps_distinct_documents(spark):
    """Documents with genuinely different content all survive (a shared
    template with one varying token is a TRUE near-dup and would be
    collapsed — the first test covers that)."""
    themes = [
        "the river is wide and the bridge over it was built in stone by masons",
        "a garden of tulips and roses grows on the hill for all to see in spring",
        "the engine room hums with turbines and the crew works on deck all night",
        "maps of the old empire hang in the library with notes on every margin",
        "a recipe for bread needs flour and salt and time in the warm oven",
    ]
    rows = [(i, (t + " ") * 4, "en") for i, t in enumerate(themes)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    kept = {r["doc_id"] for r in clean_corpus(docs).collect()}
    assert kept == {0, 1, 2, 3, 4}


def test_clean_corpus_plan_stays_jvm_side(spark):
    """The filter/dedup plan is pure Catalyst — no Python evals."""
    from darc_spark.plans import assert_no_python

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = clean_corpus(docs.select("doc_id", "text", "lang"))
    assert_no_python(out)
