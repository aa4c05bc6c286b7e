"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a metadata struct; decode /
feature-extract / resize / frame-sample are `mapInPandas` stages operating on
Arrow batches. The decode step itself is STUBBED (no image/audio libs in
this container, by design): `decode_stub_features` produces deterministic
fake features from the payload bytes so the Spark-side plumbing -- schema,
batch shape, partitioning, UDF signatures -- is real and tested end-to-end.
A production deployment swaps `_decode_payload_batch` for a real decoder
(PIL/torchaudio/ffmpeg) without touching the plan.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),          # image | audio | video
    StructField("payload", BinaryType()),        # opaque encoded bytes
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("duration_ms", IntegerType()),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("n_bytes", LongType()),
    StructField("feature", ArrayType(FloatType())),  # 16-dim stub embedding
])

FEATURE_DIM = 16


def _decode_payload_batch(payload: pd.Series) -> np.ndarray:
    """STUB decoder: deterministic 16-dim feature from payload bytes.

    Replace with a real decoder in production. Raises NotImplementedError
    for kinds a real decoder would need codec support for -- callers see the
    real control flow. Here: byte-histogram moments, vectorized.
    """
    feats = np.zeros((len(payload), FEATURE_DIM), dtype=np.float32)
    for i, buf in enumerate(payload):  # bounded by batch; bytes ops are C-speed
        if buf is None or len(buf) == 0:
            continue
        a = np.frombuffer(buf, dtype=np.uint8)
        hist = np.bincount(a >> 4, minlength=16).astype(np.float32)
        feats[i] = hist / max(len(a), 1)
    return feats


def extract_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over media rows (Arrow-batched)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = _decode_payload_batch(pdf["payload"])
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                "feature": list(feats),
            })

    return df.mapInPandas(fn, schema=FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling STUB: emits (media_id, frame_ts_ms) rows for the
    sampling grid; the actual frame decode is NotImplemented by design."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vids = pdf[pdf["kind"] == "video"]
            rows = []
            for mid, dur in zip(vids["media_id"], vids["duration_ms"]):
                ts = np.arange(0, max(int(dur or 0), 0), every_ms, dtype=np.int64)
                rows.append(pd.DataFrame({"media_id": mid, "frame_ts_ms": ts}))
            yield (pd.concat(rows, ignore_index=True) if rows
                   else pd.DataFrame({"media_id": pd.Series([], dtype="int64"),
                                      "frame_ts_ms": pd.Series([], dtype="int64")}))

    return df.mapInPandas(fn, schema=StructType([
        StructField("media_id", LongType()), StructField("frame_ts_ms", LongType())]))


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(((i * 7 + j * 13) % 251) for j in range(128 + (i % 5) * 64))
        rows.append((i, kind, payload, 640 if kind == "image" else None,
                     480 if kind == "image" else None,
                     5000 if kind != "image" else None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
