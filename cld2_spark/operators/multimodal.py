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


def _decode_payload_batch(payload: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """STUB decoder: deterministic 16-dim feature from payload bytes,
    computed for the WHOLE Arrow batch in one pass (concatenated buffer +
    segment bincount -- the same shape a real vectorized decoder hands to
    its codec). Replace with a real decoder (PIL/torchaudio/ffmpeg) in
    production without touching the plan. Returns (features, n_bytes)."""
    bufs = [b if b is not None else b"" for b in payload]
    n = len(bufs)
    lens = np.fromiter((len(b) for b in bufs), count=n, dtype=np.int64)
    total = int(lens.sum())
    if total == 0:
        return np.zeros((n, FEATURE_DIM), dtype=np.float32), lens
    cat = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    rid = np.repeat(np.arange(n, dtype=np.int64), lens)
    counts = np.bincount(rid * FEATURE_DIM + (cat >> 4),
                         minlength=n * FEATURE_DIM)
    feats = (counts.reshape(n, FEATURE_DIM).astype(np.float32)
             / np.maximum(lens, 1)[:, None].astype(np.float32))
    return feats, lens


def extract_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over media rows (Arrow-batched)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, lens = _decode_payload_batch(pdf["payload"])
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": lens,
                "feature": list(feats),
            })

    return df.mapInPandas(fn, schema=FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling STUB: emits (media_id, frame_ts_ms) rows for the
    sampling grid; the actual frame decode is NotImplemented by design."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vids = pdf[pdf["kind"] == "video"]
            mids = vids["media_id"].to_numpy(dtype=np.int64)
            durs = vids["duration_ms"].fillna(0).to_numpy(dtype=np.int64)
            n_frames = np.maximum(-(-durs // every_ms), 0)
            rid = np.repeat(np.arange(len(mids)), n_frames)
            # frame index within each video: position minus its video's start
            starts = np.zeros(len(mids), dtype=np.int64)
            np.cumsum(n_frames[:-1], out=starts[1:])
            fidx = np.arange(int(n_frames.sum()), dtype=np.int64) - starts[rid]
            yield pd.DataFrame({"media_id": mids[rid] if len(rid) else
                                pd.Series([], dtype="int64"),
                                "frame_ts_ms": fidx * every_ms})

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
