"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the DECODE step is stubbed
(deterministic fake features / NotImplementedError for real codecs), but
the Spark-side plumbing is real and tested: schema contracts, Arrow
batch shapes, mapInPandas signatures, and partition-preserving feature
extraction — the parts that must be right at 100 TB.

Design notes for scale:
- binary payloads ride in their own column so column pruning keeps them
  out of every query that doesn't touch them (parquet ReadSchema);
- decode/feature-extract is mapInPandas (Arrow-batched), one Python
  worker pass, no shuffle;
- derived features land in narrow typed columns so downstream operators
  (dedup, ANN) never re-read the blobs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = ("doc_id long, media_type string, payload binary, "
                "width int, height int, sample_rate int")

FEATURE_SCHEMA = ("doc_id long, media_type string, n_bytes long, "
                  "byte_mean double, byte_entropy double, feat array<float>")
STATS_SCHEMA = ("doc_id long, media_type string, n_bytes long, "
                "byte_mean double, byte_entropy double")


def attach_fake_media(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Testing helper: deterministic binary payload derived from the text
    column (stands in for an image/audio blob column)."""
    return (df
            .withColumn("media_type", F.when(F.col("doc_id") % 2 == 0, "image/png")
                        .otherwise("audio/wav"))
            .withColumn("payload", F.encode(F.col(text_col), "UTF-8"))
            .withColumn("width", (F.col("doc_id") % 64 + 1).cast("int"))
            .withColumn("height", (F.col("doc_id") % 48 + 1).cast("int"))
            .withColumn("sample_rate", F.lit(16000).cast("int")))


def decode_media(payload: bytes, media_type: str) -> np.ndarray:
    """REAL decode would go through PIL/librosa here; neither ships in
    this container."""
    raise NotImplementedError(
        "media decoding requires PIL/librosa, not available in this "
        "environment; use fake_features for the pipeline plumbing")


def fake_features(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in feature vector: byte-histogram moments."""
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    if arr.size == 0:
        return np.zeros(dim, dtype=np.float32)
    out = np.array([arr.mean(), arr.std(), arr.min(), arr.max(),
                    np.percentile(arr, 25), np.percentile(arr, 50),
                    np.percentile(arr, 75), float(arr.size % 251)],
                   dtype=np.float32)
    return out[:dim]


def extract_features(df: DataFrame, with_feat: bool = True) -> DataFrame:
    """mapInPandas feature extraction over the binary column: Arrow
    batches in, narrow typed features out. The blob column is dropped on
    output so downstream scans never touch it again.

    ``with_feat=False`` skips the per-payload feature vector (byte
    percentiles — the expensive part) when only the scalar stats are
    needed; the Arrow plumbing is identical."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            feats = []
            n_bytes = np.zeros(n, dtype=np.int64)
            byte_mean = np.zeros(n)
            byte_entropy = np.zeros(n)
            for i, payload in enumerate(pdf["payload"]):
                b = bytes(payload)
                arr = np.frombuffer(b, dtype=np.uint8)
                n_bytes[i] = arr.size
                byte_mean[i] = float(arr.mean()) if arr.size else 0.0
                if arr.size:
                    counts = np.bincount(arr, minlength=256).astype(np.float64)
                    p = counts[counts > 0] / arr.size
                    byte_entropy[i] = float(-(p * np.log2(p)).sum())
                if with_feat:
                    feats.append(fake_features(b).tolist())
            out = {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": n_bytes,
                "byte_mean": np.round(byte_mean, 6),
                "byte_entropy": np.round(byte_entropy, 6),
            }
            if with_feat:
                out["feat"] = feats
            yield pd.DataFrame(out)

    return df.mapInPandas(
        op, schema=FEATURE_SCHEMA if with_feat else STATS_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video-frame sampling plumbing: explodes a (stubbed) frame-index
    plan per media row — the real decoder would seek those offsets."""
    n_frames = (F.col("width") * F.col("height") % 100 + 1).cast("int")
    return (df
            .withColumn("frame_idx",
                        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))))
            .select("doc_id", "media_type", "frame_idx"))
