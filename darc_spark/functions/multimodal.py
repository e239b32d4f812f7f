"""Multimodal column operators: decode / features / resize / frame-sample.

Images, audio and video ride through the engine as opaque ``binary``
columns plus typed metadata (input_hint schema) — same shape as darc's
document/screenshot blobs (``darc/model/web/requests.py:50``,
``darc/model/web/selenium.py:40``). The Spark-side plumbing here —
schemas, Arrow batch shapes, ``mapInPandas`` signatures, partitioning —
is real and tested; codec backends resolve at runtime:

* png/qpng  → the pure-stdlib codec (:mod:`darc_spark.functions.images`)
* jpeg      → PIL if importable, else ``NotImplementedError`` (STUB —
  this container has no image libraries)
* audio/video → clearly-marked deterministic fakes (seeded from the
  payload digest) so pipelines exercise the full distributed path.
"""

from __future__ import annotations

import hashlib
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
    except NotImplementedError as exc:
        row["decode_error"] = f"stub: {exc}"
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


def fake_decode_frame(payload: bytes, index: int) -> bytes:
    """DETERMINISTIC FAKE frame decode (module-level so the oracle
    export can enumerate it driver-side): seed from sha256(payload)."""
    seed = int.from_bytes(
        hashlib.sha256(payload + index.to_bytes(4, "little")).digest()[:8], "little"
    )
    rng = np.random.default_rng(seed)
    return encode_png(rng.integers(0, 256, (8, 8, 3), dtype=np.uint8))


def sample_frames(
    df: DataFrame, n_frames: int = 3, id_col: str = "media_id", bytes_col: str = "bytes"
) -> DataFrame:
    """Video frame sampling — DETERMINISTIC FAKE decoder.

    No video library ships in this container; a real deployment swaps
    :func:`fake_decode_frame` for pyav/ffmpeg. The fake derives each
    frame seed from sha256(payload) so results are stable and testable;
    the distributed shape (one media row → n frame rows, binary out) is
    the real contract.
    """
    _fake_decode_frame = fake_decode_frame

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf[id_col], pdf[bytes_col]):
                payload = bytes(data) if data is not None else b""
                for i in range(n_frames):
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_index": i,
                            "frame_bytes": _fake_decode_frame(payload, i),
                        }
                    )
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

_AUDIO_SR = 16000


def fake_decode_audio(payload: bytes, n_samples: int = 4096) -> "np.ndarray":
    """DETERMINISTIC FAKE audio decode — no audio library ships in this
    container; a real deployment swaps this for soundfile/librosa. The
    fake derives a float32 waveform in [-1, 1) from sha256(payload), so
    results are stable and the oracle can enumerate them driver-side
    (module-level for exactly that reason, like :func:`fake_decode_frame`)."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    return (rng.random(n_samples, dtype=np.float32) * 2.0 - 1.0).astype(np.float32)


def audio_feature_row(mid: object, data: object) -> dict:
    """Pure per-clip feature computation (shared by the distributed
    operator and the driver-side oracle export). Feature shapes are the
    standard audio-pipeline set (RMS energy, peak, zero-crossing count)
    over the decoded waveform."""
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
        wave = fake_decode_audio(bytes(data))
        wave64 = wave.astype(np.float64)
        row.update(
            n_samples=int(wave.shape[0]),
            sample_rate=_AUDIO_SR,
            duration_ms=float(wave.shape[0] * 1000.0 / _AUDIO_SR),
            rms=float(np.sqrt(np.mean(wave64 * wave64))),
            peak=float(np.max(np.abs(wave64))),
            zero_crossings=int(np.count_nonzero(np.diff(np.signbit(wave64)))),
        )
    except NotImplementedError as exc:
        row["decode_error"] = f"stub: {exc}"
    except Exception as exc:  # noqa: BLE001 - never-throw contract
        row["decode_error"] = f"{type(exc).__name__}: {exc}"
    return row


def audio_features(
    df: DataFrame, id_col: str = "media_id", bytes_col: str = "bytes"
) -> DataFrame:
    """Audio decode + feature-extract, Arrow-batched (mapInPandas) —
    the audio analogue of :func:`image_features`: opaque binary column
    in, per-clip scalar features out, payload never shuffled. The
    decoder is the clearly-marked deterministic fake above; the
    distributed contract (schema, batch shape, never-throw rows) is
    real and value-checked."""

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
