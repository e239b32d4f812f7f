from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from darc_spark.functions.images import encode_lossy, encode_png, phash64
from darc_spark.functions.multimodal import (
    audio_feature_row,
    audio_features,
    image_features,
    resize_images,
    sample_frames,
)
from darc_spark.functions.wav import decode_wav, encode_wav, tone_wave


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


def _mjpeg(seed: int, n_frames: int, sep: bytes = b"") -> bytes:
    from darc_spark.functions.images import smooth_pixels
    from darc_spark.functions.jpeg import encode_jpeg

    frames = [
        encode_jpeg(smooth_pixels(np.random.default_rng(seed + f), 24))
        for f in range(n_frames)
    ]
    return sep + sep.join(frames)


def test_sample_frames_real_mjpeg(spark):
    """Real MJPEG sampling: evenly spaced frame picks decode to PNGs
    that match a driver-side split+decode of the same stream; a torn
    payload yields a single frame_index −1 error row."""
    from darc_spark.functions.images import decode_jpeg, decode_png
    from darc_spark.functions.video import sample_frame_indices, split_mjpeg

    sep = b"\r\n--b\r\nContent-Type: image/jpeg\r\n\r\n"
    p0 = _mjpeg(10, 5, sep)   # multipart-style boundaries between frames
    p1 = _mjpeg(40, 2)        # fewer frames than n_frames → 2 rows
    torn = _mjpeg(70, 1)[:40]
    df = spark.createDataFrame(
        [("vid0", bytearray(p0)), ("vid1", bytearray(p1)),
         ("torn", bytearray(torn))],
        "media_id string, bytes binary",
    )
    rows = sample_frames(df, n_frames=3).collect()
    by_media: dict[str, dict[int, bytes | None]] = {}
    for r in rows:
        by_media.setdefault(r["media_id"], {})[r["frame_index"]] = (
            bytes(r["frame_bytes"]) if r["frame_bytes"] is not None else None
        )
    assert set(by_media["vid0"]) == set(sample_frame_indices(5, 3))
    assert set(by_media["vid1"]) == {0, 1}
    assert by_media["torn"] == {-1: None}
    # pixel-exact vs a driver-side decode of the same split
    frames0 = split_mjpeg(p0)
    for idx, png in by_media["vid0"].items():
        assert (decode_png(png) == decode_jpeg(frames0[idx])).all()
    # deterministic across runs
    again = sample_frames(df, n_frames=3).collect()
    assert sorted(
        (r["media_id"], r["frame_index"], bytes(r["frame_bytes"] or b""))
        for r in again
    ) == sorted(
        (r["media_id"], r["frame_index"], bytes(r["frame_bytes"] or b""))
        for r in rows
    )


def test_audio_features_real_wav_matches_pure(spark):
    """Distributed audio features over REAL WAV payloads == driver-side
    pure computation (the contract the oracle export relies on); null
    and corrupt payloads take the never-throw decode_error path."""
    wav_a = encode_wav(tone_wave(1, 4096, 16000), 16000)
    stereo = np.stack([tone_wave(2, 3000, 8000)] * 2, axis=1)
    wav_b = encode_wav(stereo, 8000)
    payloads = [
        ("aud0", wav_a),
        ("aud1", wav_b),
        ("corrupt", wav_a[:30]),
        ("bad", None),
    ]
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
    assert got["corrupt"]["decode_error"] is not None
    assert got["aud0"]["n_samples"] == 4096
    assert got["aud0"]["sample_rate"] == 16000
    assert got["aud1"]["n_samples"] == 3000
    assert abs(got["aud1"]["duration_ms"] - 375.0) < 1e-9
    assert 0.0 < got["aud0"]["rms"] < 1.0
    # the waveform really is what we encoded: RMS matches numpy exactly
    w64 = tone_wave(1, 4096, 16000).astype(np.float64) / 32768.0
    assert abs(got["aud0"]["rms"] - float(np.sqrt(np.mean(w64 * w64)))) < 1e-12
