"""Multimodal inventory — m* entries (rows-only driver check).

No DuckDB oracle: the decode path is a Pandas UDF over binary blobs,
deliberately outside SQL's reach. The driver records the weaker
rows-only check; full behavioral assertions live in
tests/test_llmops.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..multimodal import decode_media, extract_features, sample_frames, synthetic_media


def m1_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode of 200 deterministic fake blobs → per-size
    feature aggregation (stable schema + row count for the driver)."""
    media = synthetic_media(spark, 200)
    decoded = decode_media(media)
    return (
        decoded.groupBy("width", "height", "channels")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.round(F.avg("mean_byte"), 6).alias("avg_mean_byte"),
        )
    )


def m2_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling: blobs → every-2nd fixed-size frame →
    per-media frame counts."""
    media = synthetic_media(spark, 100, kind="video")
    frames = sample_frames(media, frame_bytes=64, every_n=2)
    return frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n_frames"))


def m3_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction (byte histogram + entropy via numpy over
    Arrow batches) → per-channel-count feature summary."""
    media = synthetic_media(spark, 200)
    feats = extract_features(media, bins=16)
    return feats.agg(
        F.count(F.lit(1)).alias("n_media"),
        F.round(F.avg("byte_entropy"), 6).alias("avg_entropy"),
        F.round(F.avg("n_bytes"), 6).alias("avg_bytes"),
        F.round(F.avg(F.element_at("hist", 1)), 6).alias("avg_hist_bin1"),
    )


QUERIES = {
    "m1_media_decode": m1_media_decode,
    "m2_frame_sample": m2_frame_sample,
    "m3_media_features": m3_media_features,
}

ORACLES: dict[str, str] = {}
