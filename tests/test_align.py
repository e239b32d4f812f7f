"""Caption-image alignment filter (CLIP-score-style pair cleaning)."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from darc_spark.functions.align import align_filter, align_pairs, caption_embedding
from darc_spark.plans import assert_no_python

SF = "/root/testdata/sf0.001"


def _cap_py(text: str, dims: int) -> list[float]:
    out = []
    for j in range(dims):
        h = int(hashlib.md5(f"{text}#{j}".encode()).hexdigest()[:15], 16)
        out.append((h % 2001 - 1000) / 1000.0)
    return out


def test_caption_embedding_matches_driver_hash(spark):
    df = spark.createDataFrame(
        [(1, "a grey cat"), (2, "blue bicycle at dusk")], "id long, text string"
    ).select("id", "text", caption_embedding("text", 8).alias("cap"))
    for r in df.collect():
        assert list(r["cap"]) == _cap_py(r["text"], 8)


def test_align_pairs_cosine_and_filter_subset(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    pairs = align_pairs(docs, emb, dims=64)
    rows = {r["doc_id"]: r for r in pairs.collect()}
    assert rows, "join produced pairs"
    # spot-check the cosine against a driver-side recompute
    probe = emb.filter(F.col("vec_id").isin(list(rows)[:3])).collect()
    texts = {
        r["doc_id"]: r["text"]
        for r in docs.filter(F.col("doc_id").isin(list(rows)[:3])).collect()
    }
    for e in probe:
        cap = _cap_py(texts[e["vec_id"]], 64)
        img = [float(x) for x in e["embedding"]]
        dot = s_c = s_i = 0.0
        for c, i in zip(cap, img):
            dot += c * i
            s_c += c * c
            s_i += i * i
        want = dot / (math.sqrt(s_c) * math.sqrt(s_i))
        assert abs(rows[e["vec_id"]]["align"] - want) < 1e-12
    kept = align_filter(docs, emb, dims=64, threshold=0.05)
    kept_ids = {r["doc_id"] for r in kept.collect()}
    assert kept_ids == {i for i, r in rows.items() if r["align"] >= 0.05}
    assert 0 < len(kept_ids) < len(rows), "threshold splits the corpus"


def test_align_plan_is_pure_catalyst(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    assert_no_python(align_filter(docs, emb, dims=64, threshold=0.05))
