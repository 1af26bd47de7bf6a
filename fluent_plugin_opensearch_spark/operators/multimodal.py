"""Multimodal column plumbing (task brief): image/audio/video as opaque
``binary`` columns with typed metadata structs, processed by Arrow-
batched ``mapInPandas`` stages.

The container has no image/audio libraries, so the DECODE step is a
deterministic fake behind ``_decode_stub`` (clearly marked); everything
Spark-side — schema, partitioning, UDF signature, batch shape — is real
and tested (tests/test_multimodal.py). Swapping the stub for PIL/ffmpeg
changes no plan shape.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: output schema of the feature-extract stage
FEATURE_SCHEMA = (
    "asset_id bigint, media_type string, width int, height int, "
    "n_frames int, feature array<float>"
)


def synth_assets(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake multimodal table: (asset_id, media_type,
    payload binary, meta struct). Payload bytes are a seeded function of
    the id — stands in for real encoded media."""
    df = spark.range(n).select(
        F.col("id").alias("asset_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode(F.concat(F.lit("PAYLOAD:"), F.sha2(F.col("id").cast("string"), 256)), "utf-8").alias("payload"),
        F.struct(
            (F.col("id") % 640 + 16).cast("int").alias("width"),
            (F.col("id") % 480 + 16).cast("int").alias("height"),
            (F.col("id") % 30 + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )
    return df


def _decode_stub(payload: bytes) -> np.ndarray:
    """STUB — deterministic fake decode. A real deployment replaces
    this with PIL.Image.open / soundfile / pyav frame sampling; the
    rest of the operator is production-shaped."""
    rng = np.frombuffer(payload[:32].ljust(32, b"\0"), dtype=np.uint8)
    return (rng.astype(np.float32) / 255.0)[:16]


def extract_features(df: DataFrame, batch_rows: int = 1024) -> DataFrame:
    """Feature-extract via ``mapInPandas``: Arrow batches in, Arrow
    batches out; per-batch vectorized numpy, never per-row Python at
    the driver. Partitioning of the input is preserved (narrow op)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode_stub(p).tolist() for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "width": pdf["meta"].map(lambda m: m["width"]).astype("int32"),
                    "height": pdf["meta"].map(lambda m: m["height"]).astype("int32"),
                    "n_frames": pdf["meta"].map(lambda m: m["n_frames"]).astype("int32"),
                    "feature": feats,
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_nth: int = 5) -> DataFrame:
    """Frame-sampling plumbing: explode a frame-index sequence from the
    metadata (pure built-ins), leaving decode of each sampled frame to
    the (stubbed) decode stage. Demonstrates the fan-out schema."""
    idx = F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_nth))
    return df.select("asset_id", "media_type", F.explode(idx).alias("frame_idx"))
