"""Text-analysis operators for the training-data pipeline.

Language-ID heuristic, quality scoring, token counting, document
fingerprinting — all pure Catalyst expressions (no Python UDFs), so
they run inside whole-stage codegen and push down through the scan.
Every helper has an exactly-matching ANSI-SQL form used by the DuckDB
oracles in ``__spark_entry__``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A tiny closed-class stopword list per language; the lang-id heuristic
# scores languages by stopword hits (classic n-gram/function-word LID).
STOPWORDS_EN = ("the", "a", "of", "to", "and", "in", "is", "for", "on", "with")


def h64(col: Column | str) -> Column:
    """Deterministic 60-bit hash expressible identically in DuckDB:
    Spark  : conv(substr(md5(x),1,15),16,10)::long
    DuckDB : CAST('0x'||substr(md5(x),1,15) AS BIGINT)
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def tokens(col: Column | str) -> Column:
    """Lower, strip non-alnum, whitespace-split. SQL-portable."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(F.regexp_replace(F.lower(c), "[^a-z0-9 ]", " ")), " +")


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace words + a BPE-ish char/4 estimate."""
    toks = tokens(text_col)
    return df.withColumn("n_words", F.size(toks)).withColumn(
        "n_tokens_bpe", F.ceil(F.length(F.col(text_col)) / F.lit(4.0)).cast("long")
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation-ratio / stopword-ratio quality features.

    score = 0.4·len_norm + 0.3·(1-punct_ratio) + 0.3·stop_ratio, the
    standard cheap pre-filter shape for web-scraped training text.
    """
    toks = tokens(text_col)
    text = F.col(text_col)
    n_chars = F.length(text)
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(*STOPWORDS_EN))
    )
    # raw doubles throughout: round() half-policies differ across engines,
    # so comparisons scale with floor(x*1e6+0.5) instead (exact on doubles)
    return (
        df.withColumn("n_chars", n_chars)
        .withColumn("punct_ratio", n_punct / F.greatest(n_chars, F.lit(1)))
        .withColumn(
            "stop_ratio", stop_hits / F.greatest(F.size(toks), F.lit(1))
        )
        .withColumn("len_norm", F.least(n_chars / F.lit(500.0), F.lit(1.0)))
        .withColumn(
            "quality",
            0.4 * F.col("len_norm")
            + 0.3 * (1 - F.col("punct_ratio"))
            + 0.3 * F.col("stop_ratio"),
        )
    )


def lang_pred(stop_ratio: Column) -> Column:
    """The LID decision rule, owned here so every consumer (lang_id,
    pipeline.clean_corpus) shares one threshold and label set."""
    return F.when(stop_ratio >= 0.08, "en").otherwise("other")


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-ratio language ID: 'en' when English function words make
    up ≥8% of tokens, else 'other' (heuristic LID; a full n-gram model is
    the same plan shape with a bigger marker table)."""
    scored = quality_score(df, text_col)
    return scored.withColumn(
        "lang_pred", lang_pred(F.col("stop_ratio"))
    ).select(*df.columns, "stop_ratio", "lang_pred")


def fingerprint(df: DataFrame, text_col: str = "text", k: int = 8) -> DataFrame:
    """Document fingerprint: hash of the first k normalized tokens —
    the cheap rolling-hash prefix fingerprint for bulk near-dup triage."""
    toks = tokens(text_col)
    prefix = F.concat_ws(" ", F.slice(toks, 1, k))
    return df.withColumn("fingerprint", h64(prefix))
