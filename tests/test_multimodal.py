from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from darc_spark.functions.images import encode_lossy, encode_png, phash64
from darc_spark.functions.multimodal import (
    audio_feature_row,
    audio_features,
    fake_decode_audio,
    image_features,
    resize_images,
    sample_frames,
)


def _image_df(spark, n=12):
    rows = []
    for i in range(n):
        rng = np.random.default_rng(100 + i)
        arr = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        fmt = "qpng" if i % 2 else "png"
        data = encode_lossy(arr) if i % 2 else encode_png(arr)
        rows.append((f"img{i:03d}", bytearray(data), fmt, arr))
    df = spark.createDataFrame(
        [(r[0], r[1], r[2]) for r in rows], "image_id string, bytes binary, fmt string"
    )
    return df, rows


def test_image_features(spark):
    df, rows = _image_df(spark)
    out = {r["image_id"]: r for r in image_features(df).collect()}
    assert len(out) == len(rows)
    for iid, data, fmt, arr in rows:
        r = out[iid]
        assert r["decode_error"] is None
        assert (r["dec_w"], r["dec_h"]) == (16, 16)
        if fmt == "png":
            assert abs(r["mean_r"] - arr[:, :, 0].mean()) < 1e-9
            assert r["phash"] == phash64(arr)


def test_image_features_bad_payload_never_throws(spark):
    from darc_spark.functions.jpeg import encode_jpeg
    from darc_spark.functions.images import smooth_pixels

    import numpy as np

    good_jpeg = encode_jpeg(smooth_pixels(np.random.default_rng(4), 16))
    df = spark.createDataFrame(
        [("bad1", bytearray(b"not a png"), "png"), ("bad2", None, "png"),
         ("badj", bytearray(b"\xff\xd8\xff"), "jpeg"),
         ("okj", bytearray(good_jpeg), "jpeg")],
        "image_id string, bytes binary, fmt string",
    )
    rows = {r["image_id"]: r for r in image_features(df).collect()}
    assert rows["bad1"]["decode_error"] is not None
    assert rows["bad2"]["decode_error"] is not None
    # real decoder (no PIL in this container): truncated JPEG → error
    # row, valid JPEG → decoded features — never a thrown task
    assert rows["badj"]["decode_error"] is not None
    assert rows["okj"]["decode_error"] is None
    assert (rows["okj"]["dec_w"], rows["okj"]["dec_h"]) == (16, 16)


def test_resize_images(spark):
    df, _ = _image_df(spark, n=6)
    out = resize_images(df, side=8).collect()
    assert all(r["w"] == 8 and r["h"] == 8 and r["fmt"] == "png" for r in out)
    from darc_spark.functions.images import decode_png

    for r in out:
        assert decode_png(bytes(r["bytes"])).shape == (8, 8, 3)


def test_sample_frames_deterministic(spark):
    df = spark.createDataFrame(
        [("vid0", bytearray(b"payload-A" * 5)), ("vid1", bytearray(b"payload-B" * 5))],
        "media_id string, bytes binary",
    )
    a = sample_frames(df, n_frames=3).collect()
    b = sample_frames(df, n_frames=3).collect()
    key = lambda r: (r["media_id"], r["frame_index"])
    assert sorted([(key(r), bytes(r["frame_bytes"])) for r in a]) == sorted(
        [(key(r), bytes(r["frame_bytes"])) for r in b]
    )
    assert len(a) == 6


def test_audio_features_deterministic_and_matches_pure(spark):
    """Distributed audio features == driver-side pure computation (the
    same contract the oracle export relies on), and null payloads take
    the never-throw decode_error path."""
    payloads = [("aud0", b"clip-A" * 7), ("aud1", b"clip-B" * 9), ("bad", None)]
    df = spark.createDataFrame(
        [(m, bytearray(p) if p is not None else None) for m, p in payloads],
        "media_id string, bytes binary",
    )
    got = {r["media_id"]: r for r in audio_features(df).collect()}
    for mid, p in payloads:
        want = audio_feature_row(mid, p)
        r = got[mid]
        for k, v in want.items():
            if isinstance(v, float):
                assert abs(r[k] - v) < 1e-12, (mid, k)
            else:
                assert r[k] == v, (mid, k)
    assert got["bad"]["decode_error"] is not None
    assert got["aud0"]["n_samples"] == 4096
    assert 0.0 < got["aud0"]["rms"] < 1.0
    # decode is a pure function of the payload
    w1, w2 = fake_decode_audio(b"clip-A" * 7), fake_decode_audio(b"clip-A" * 7)
    assert (w1 == w2).all()
