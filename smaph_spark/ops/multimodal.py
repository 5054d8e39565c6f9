"""Multimodal plumbing: opaque binary columns + typed metadata.

The container has no image/audio libraries, so the decode step is a
clearly-marked stub (deterministic fake features / NotImplementedError
for real decode) — but the Spark-side plumbing is real and tested:
binary column handling, mapInPandas batch iteration, fixed output
schema, partition-preserving shape.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from smaph_spark.plans.star_queries import load, register

#: output schema of the feature extractor (fixed-name discipline)
FEATURE_SCHEMA = (
    "doc_id long, n_bytes int, fake_width int, fake_height int, "
    "feat_mean double, decoder string"
)


def decode_image(payload: bytes) -> np.ndarray:
    """Real decode would use PIL/cv2 — not available in this container.

    STUB: deterministic fake 'decode' for plumbing tests; a deployment
    swaps this single function for a real decoder.
    """
    raise NotImplementedError(
        "image decoding requires PIL/cv2 (not installed); "
        "use fake_decode_meta for plumbing tests"
    )


def fake_decode_meta(payload: bytes) -> tuple[int, int, float]:
    """Deterministic stand-in: derive (width, height, feat_mean) from a
    sha256 of the payload so tests are reproducible."""
    h = hashlib.sha256(payload).digest()
    width = 16 + h[0] % 240
    height = 16 + h[1] % 240
    feat_mean = round(int.from_bytes(h[2:6], "big") / 0xFFFFFFFF, 6)
    return width, height, feat_mean


def extract_features(binary_df: DataFrame) -> DataFrame:
    """binary_df(doc_id long, payload binary) -> FEATURE_SCHEMA rows.

    mapInPandas: one Arrow batch in, one out — the real-decoder swap
    point. Batches stay columnar; no per-row Python outside the batch
    loop body.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [fake_decode_meta(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "fake_width": [m[0] for m in metas],
                    "fake_height": [m[1] for m in metas],
                    "feat_mean": [m[2] for m in metas],
                    "decoder": "stub-sha256",
                }
            )

    return binary_df.mapInPandas(op, schema=FEATURE_SCHEMA)


@register(
    "mm01_binary_meta",
    """
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           length(text) AS n_chars_actual
    FROM documents
    """,
    survey_ref="multimodal: opaque binary column + typed metadata (JVM-side)",
)
def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.length(F.encode("text", "UTF-8")).alias("n_bytes"),
        F.length("text").alias("n_chars_actual"),
    )


@register(
    "mm02_feature_extract",
    None,  # stub decoder — rows-only check
    survey_ref="multimodal decode/feature-extract via mapInPandas (stubbed decoder)",
)
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    binary = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return extract_features(binary)


# ---------------------------------------------------------------------------
# resize + frame-sample plumbing (mm03): the pixel work is stubbed (no
# PIL/cv2/ffmpeg in this container) but the Spark-side contract is real
# — batch shape, deterministic sampling, fixed schemas, exploded frames
# ---------------------------------------------------------------------------

RESIZE_SCHEMA = (
    "doc_id long, target_w int, target_h int, scale_x double, "
    "scale_y double, resizer string"
)

FRAME_SCHEMA = (
    "doc_id long, frame_idx int, frame_offset_bytes long, "
    "frame_sha string, sampler string"
)


def resize_images(
    binary_df: DataFrame, target_w: int = 224, target_h: int = 224
) -> DataFrame:
    """binary(doc_id, payload) -> per-image resize metadata.

    Real implementation resamples pixels (PIL.Image.resize); the stub
    computes the scale factors from the fake-decoded dimensions, which
    is exactly the metadata a downstream batch-training pipeline
    partitions on. Single swap point: replace fake_decode_meta."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [fake_decode_meta(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "target_w": target_w,
                    "target_h": target_h,
                    "scale_x": [round(target_w / m[0], 6) for m in metas],
                    "scale_y": [round(target_h / m[1], 6) for m in metas],
                    "resizer": "stub-meta",
                }
            )

    return binary_df.mapInPandas(op, schema=RESIZE_SCHEMA)


def sample_frames(
    binary_df: DataFrame, n_frames: int = 4, chunk: int = 256
) -> DataFrame:
    """binary(doc_id, payload) -> one row per sampled 'frame'.

    Treats the payload as a fake video: fixed-size byte chunks stand in
    for frames; sampling picks n_frames chunk offsets evenly (the
    deterministic uniform-stride sampler a real ffmpeg-backed version
    would use with PTS timestamps). Output explodes rows — the shape a
    frame-level training pipeline consumes."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_offset_bytes": [],
                   "frame_sha": [], "sampler": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_chunks = max(1, len(payload) // chunk)
                take = min(n_frames, n_chunks)
                for i in range(take):
                    off = (i * n_chunks // take) * chunk
                    frame = bytes(payload[off : off + chunk])
                    out["doc_id"].append(int(doc_id))
                    out["frame_idx"].append(i)
                    out["frame_offset_bytes"].append(off)
                    out["frame_sha"].append(
                        hashlib.sha256(frame).hexdigest()[:16]
                    )
                    out["sampler"].append("stub-stride")
            yield pd.DataFrame(out)

    return binary_df.mapInPandas(op, schema=FRAME_SCHEMA)


@register(
    "mm03_frame_samples",
    None,  # stubbed frame decode — rows-only check
    survey_ref="multimodal frame-sample via mapInPandas (uniform stride, "
               "exploded frame rows; stubbed byte-chunk frames)",
)
def mm_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    binary = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return sample_frames(binary)
