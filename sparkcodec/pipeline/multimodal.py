"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side plumbing is real and tested -- schemas, Arrow batch shapes,
partitioning, mapInPandas signatures.  The actual media decode is STUBBED
(the container ships no image/audio libraries): ``decode_image`` and
friends produce a deterministic fake derived from the payload bytes, and
raise ``NotImplementedError`` when ``strict=True``.  Swapping in a real
decoder (PIL / torchaudio / pyav) changes only the marked function body.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_DDL = (
    "media_id LONG, kind STRING, payload BINARY, width INT, height INT, "
    "sample_rate INT, n_frames INT"
)


def synth_media_table(spark, docs: DataFrame, kind: str = "image") -> DataFrame:
    """Deterministic fake media table: payload bytes derived from document
    text (stands in for real image/audio blobs; schema is the real one)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        (F.pmod(F.xxhash64("doc_id"), F.lit(512)) + 32).cast("int").alias("width"),
        (F.pmod(F.xxhash64("doc_id", F.lit(1)), F.lit(512)) + 32).cast("int").alias("height"),
        F.lit(16000).cast("int").alias("sample_rate"),
        (F.pmod(F.xxhash64("doc_id", F.lit(2)), F.lit(240)) + 1).cast("int").alias("n_frames"),
    )


def _stub_decode(payload: bytes, out_elems: int, strict: bool) -> np.ndarray:
    """STUB: a real implementation would decode the media container here.
    Deterministic fake: repeatable bytes -> float features in [0, 1)."""
    if strict:
        raise NotImplementedError(
            "media decoding requires an image/audio library not present in "
            "this container; wire PIL/pyav here")
    raw = np.frombuffer(payload or b"\x00", dtype="u1")
    reps = int(np.ceil(out_elems / max(len(raw), 1)))
    tiled = np.tile(raw, reps)[:out_elems].astype(np.float32)
    return tiled / 256.0


def extract_image_features(media: DataFrame, feat_dim: int = 64,
                           strict: bool = False) -> DataFrame:
    """payload -> fixed-dim float feature vector (Arrow-batched kernel).
    Real shape: (batch, feat_dim) float32; decode step stubbed."""

    def feats(it):
        for pdf in it:
            mats = [
                _stub_decode(p, feat_dim, strict) for p in pdf["payload"]
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"].to_numpy(),
                "features": [m.tolist() for m in mats],
            })

    return media.filter(F.col("kind") == "image").select("media_id", "payload") \
        .mapInPandas(feats, "media_id long, features array<float>")


def resize_images(media: DataFrame, target_w: int = 224, target_h: int = 224,
                  strict: bool = False) -> DataFrame:
    """Declarative resize: new payload + updated typed metadata.  The pixel
    resample is stubbed (payload passes through); the metadata contract and
    batch plumbing are real."""

    def rs(it):
        for pdf in it:
            if strict:
                raise NotImplementedError("real resample needs an image lib")
            yield pd.DataFrame({
                "media_id": pdf["media_id"].to_numpy(),
                "payload": pdf["payload"],
                "width": np.full(len(pdf), target_w, dtype=np.int32),
                "height": np.full(len(pdf), target_h, dtype=np.int32),
            })

    return media.filter(F.col("kind") == "image") \
        .select("media_id", "payload", "width", "height") \
        .mapInPandas(rs, "media_id long, payload binary, width int, height int")


def sample_frames(media: DataFrame, every_n: int = 10,
                  strict: bool = False) -> DataFrame:
    """Frame sampling for video rows: one output row per kept frame index
    (explode is JVM-side; the frame extraction itself is stubbed)."""
    frames = media.filter(F.col("kind") == "video").select(
        "media_id", "payload", "n_frames",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n)))
        .alias("frame_idx"),
    )

    def fr(it):
        for pdf in it:
            feats = [
                _stub_decode(p, 16, strict) for p in pdf["payload"]
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"].to_numpy(),
                "frame_idx": pdf["frame_idx"].to_numpy(),
                "frame_feat": [f.tolist() for f in feats],
            })

    return frames.mapInPandas(fr, "media_id long, frame_idx int, frame_feat array<float>")
