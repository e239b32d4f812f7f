"""Multimodal column operators: decode / features / resize / frame-sample.

Images, audio and video ride through the engine as opaque ``binary``
columns plus typed metadata (input_hint schema) — same shape as darc's
document/screenshot blobs (``darc/model/web/requests.py:50``,
``darc/model/web/selenium.py:40``). The Spark-side plumbing here —
schemas, Arrow batch shapes, ``mapInPandas`` signatures, partitioning —
is real and tested; codec backends resolve at runtime:

* png/qpng  → the pure-stdlib codec (:mod:`darc_spark.functions.images`)
* jpeg      → PIL fast path when importable, else the from-spec
  pure-Python baseline codec (:mod:`darc_spark.functions.jpeg`, with
  an optional ctypes-compiled scan decoder) — real decode either way
* audio     → real RIFF/WAVE PCM parse (:mod:`darc_spark.functions.wav`)
* video     → real MJPEG frame split + JPEG decode and animated GIF89a
  (:mod:`darc_spark.functions.video`, :mod:`darc_spark.functions.gif`);
  container formats needing a media library (mp4/h264…) are out of
  scope in this dependency-free build and would slot in behind the
  same operators.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from darc_spark.functions.images import decode_image, encode_png, phash64

IMAGE_FEATURES = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("dec_w", T.IntegerType(), True),
        T.StructField("dec_h", T.IntegerType(), True),
        T.StructField("mean_r", T.DoubleType(), True),
        T.StructField("mean_g", T.DoubleType(), True),
        T.StructField("mean_b", T.DoubleType(), True),
        T.StructField("brightness", T.DoubleType(), True),
        T.StructField("phash", T.LongType(), True),
        T.StructField("decode_error", T.StringType(), True),
    ]
)


def image_feature_row(iid: object, data: object, fmt: object) -> dict:
    """Pure per-image feature computation (shared by the distributed
    operator below and the driver-side oracle export, which enumerates
    the seeded payloads directly — the value check then covers the
    Arrow binary transfer and mapInPandas plumbing)."""
    row = {
        "image_id": iid,
        "dec_w": None,
        "dec_h": None,
        "mean_r": None,
        "mean_g": None,
        "mean_b": None,
        "brightness": None,
        "phash": None,
        "decode_error": None,
    }
    try:
        arr = decode_image(bytes(data), fmt)
        means = arr.reshape(-1, 3).mean(axis=0)
        row.update(
            dec_w=int(arr.shape[1]),
            dec_h=int(arr.shape[0]),
            mean_r=float(means[0]),
            mean_g=float(means[1]),
            mean_b=float(means[2]),
            brightness=float(means.mean()),
        )
    except Exception as exc:  # noqa: BLE001 - never-throw contract
        row["decode_error"] = f"{type(exc).__name__}: {exc}"
    else:
        row["phash"] = phash64(arr)
    return row


def image_features(df: DataFrame, id_col: str = "image_id") -> DataFrame:
    """Decode + feature-extract per image, Arrow-batched.

    Input: (image_id, bytes, fmt). Bad payloads yield a ``decode_error``
    row instead of failing the task (never-throw, like the reference's
    tolerant parsers).
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                image_feature_row(iid, data, fmt)
                for iid, data, fmt in zip(pdf[id_col], pdf["bytes"], pdf["fmt"])
            ]
            out = pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURES.fields])
            out["phash"] = pd.array(
                [r["phash"] for r in rows], dtype="Int64"
            )
            yield out

    return df.select(id_col, "bytes", "fmt").mapInPandas(fn, IMAGE_FEATURES)


RESIZED = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("fmt", T.StringType(), True),
    ]
)


def resize_images(df: DataFrame, side: int = 8, id_col: str = "image_id") -> DataFrame:
    """Nearest-neighbor resize to side×side, re-encoded PNG (thumbnail
    stage of an image training pipeline)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for iid, data, fmt in zip(pdf[id_col], pdf["bytes"], pdf["fmt"]):
                try:
                    arr = decode_image(bytes(data), fmt)
                    ys = (np.arange(side) * arr.shape[0]) // side
                    xs = (np.arange(side) * arr.shape[1]) // side
                    small = arr[ys][:, xs]
                    rows.append(
                        {
                            "image_id": iid,
                            "bytes": encode_png(small),
                            "w": side,
                            "h": side,
                            "fmt": "png",
                        }
                    )
                except Exception:  # noqa: BLE001
                    rows.append(
                        {"image_id": iid, "bytes": None, "w": None, "h": None, "fmt": None}
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED.fields])

    return df.select(id_col, "bytes", "fmt").mapInPandas(fn, RESIZED)


FRAMES = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("frame_bytes", T.BinaryType(), True),
    ]
)


def frame_sample_rows(mid: object, payload: bytes | None, n_frames: int) -> list[dict]:
    """Pure per-payload frame sampling (shared by the distributed
    operator and the driver-side oracle enumeration): split the MJPEG
    stream, decode evenly spaced frames with the real JPEG codec,
    re-encode PNG. A malformed payload yields ONE error-marked row
    (frame_index −1, null bytes) — never a thrown task."""
    from darc_spark.functions.video import frame_pixels

    try:
        if payload is None:
            raise ValueError("null payload")
        return [
            {
                "media_id": mid,
                "frame_index": int(i),
                "frame_bytes": encode_png(px),
            }
            for i, px in frame_pixels(bytes(payload), n_frames)
        ]
    except Exception:  # noqa: BLE001 - never-throw contract
        return [{"media_id": mid, "frame_index": -1, "frame_bytes": None}]


def sample_frames(
    df: DataFrame, n_frames: int = 3, id_col: str = "media_id", bytes_col: str = "bytes"
) -> DataFrame:
    """Video frame sampling over MJPEG payloads — REAL decode: exact
    SOI/EOI frame split (:func:`darc_spark.functions.video.split_mjpeg`),
    evenly spaced picks, per-frame JPEG decode (PIL fast path or the
    from-spec codec), PNG re-encode. One media row → ≤ n_frames frame
    rows; frame bytes never shuffle (mapInPandas, Arrow-batched). A
    deployment needing mp4/h264 swaps the decoder behind this same
    contract."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf[id_col], pdf[bytes_col]):
                rows.extend(frame_sample_rows(mid, data, n_frames))
            yield pd.DataFrame(rows, columns=[f.name for f in FRAMES.fields])

    return df.select(F.col(id_col), F.col(bytes_col)).mapInPandas(fn, FRAMES)


AUDIO_FEATURES = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("n_samples", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.DoubleType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("peak", T.DoubleType(), True),
        T.StructField("zero_crossings", T.IntegerType(), True),
        T.StructField("decode_error", T.StringType(), True),
    ]
)

def audio_feature_row(mid: object, data: object) -> dict:
    """Pure per-clip feature computation (shared by the distributed
    operator and the driver-side oracle export): REAL RIFF/WAVE PCM
    parse (:func:`darc_spark.functions.wav.decode_wav`), then the
    standard audio-pipeline feature set — RMS energy, peak,
    zero-crossing count — over the channel-mixed float64 waveform
    (int16 normalized by 1/32768)."""
    from darc_spark.functions.wav import decode_wav

    row = {
        "media_id": mid,
        "n_samples": None,
        "sample_rate": None,
        "duration_ms": None,
        "rms": None,
        "peak": None,
        "zero_crossings": None,
        "decode_error": None,
    }
    try:
        if data is None:
            raise ValueError("null payload")
        samples, sr = decode_wav(bytes(data))
        wave64 = samples.astype(np.float64).mean(axis=1) / 32768.0
        row.update(
            n_samples=int(wave64.shape[0]),
            sample_rate=int(sr),
            duration_ms=float(wave64.shape[0] * 1000.0 / sr),
            rms=float(np.sqrt(np.mean(wave64 * wave64))),
            peak=float(np.max(np.abs(wave64))),
            zero_crossings=int(np.count_nonzero(np.diff(np.signbit(wave64)))),
        )
    except Exception as exc:  # noqa: BLE001 - never-throw contract
        row["decode_error"] = f"{type(exc).__name__}: {exc}"
    return row


def audio_features(
    df: DataFrame, id_col: str = "media_id", bytes_col: str = "bytes"
) -> DataFrame:
    """Audio decode + feature-extract, Arrow-batched (mapInPandas) —
    the audio analogue of :func:`image_features`: opaque binary column
    in, per-clip scalar features out, payload never shuffled. The
    decoder is the real pure-stdlib RIFF/WAVE PCM parser
    (:mod:`darc_spark.functions.wav`); malformed payloads become
    decode_error rows (never a thrown task), and the whole pipeline is
    value-checked against a driver-side enumeration of the same
    payloads."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                audio_feature_row(mid, data)
                for mid, data in zip(pdf[id_col], pdf[bytes_col])
            ]
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_FEATURES.fields])

    return df.select(
        F.col(id_col).alias("media_id"), F.col(bytes_col).alias("bytes")
    ).mapInPandas(fn, AUDIO_FEATURES)
