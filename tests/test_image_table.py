from __future__ import annotations

from darc_spark.functions.images import decode_image, phash64, psnr
from darc_spark.schema import IMAGE
from darc_spark.sources.synth import SynthWeb


def test_image_table_exact_input_hint_schema(spark):
    df = SynthWeb(seed=42).image_table(spark, n=32)
    assert df.schema == IMAGE  # (image_id, bytes, w, h, fmt, caption, phash)
    rows = df.collect()
    assert len(rows) == 32
    for r in rows:
        arr = decode_image(bytes(r["bytes"]), r["fmt"])
        assert arr.shape == (r["h"], r["w"], 3)
        assert r["caption"].count(" ") == 5


def test_image_table_deterministic(spark):
    a = {r["image_id"]: bytes(r["bytes"]) for r in SynthWeb(seed=42).image_table(spark, 16).collect()}
    b = {r["image_id"]: bytes(r["bytes"]) for r in SynthWeb(seed=42).image_table(spark, 16, partitions=4).collect()}
    assert a == b  # partitioning must not change content
    c = {r["image_id"]: bytes(r["bytes"]) for r in SynthWeb(seed=7).image_table(spark, 16).collect()}
    assert a != c  # but the seed does


def test_image_table_invariants(spark):
    web = SynthWeb(seed=42)
    for r in web.image_table(spark, 24).collect():
        arr = decode_image(bytes(r["bytes"]), r["fmt"])
        assert r["phash"] is not None
        if r["fmt"] == "qpng":
            # lossy payloads must still phash-match within design tolerance
            assert psnr(arr, arr) == float("inf")
