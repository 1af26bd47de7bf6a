"""Zero-extra-pass metrics via ``df.observe`` (SURVEY.md §2.5 A2):
the error-handler's stats counters re-expressed as Observation
aggregates collected DURING the sink write — no second scan of the
batch, which at 100 TB is the difference between 1× and 2× IO."""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def count_min_sketch_col(
    col: str, eps: float = 0.001, confidence: float = 0.99, seed: int = 42
):
    """The ``count_min_sketch`` aggregate column (binary, map-side
    partial, MERGEABLE across batches/partitions) — ship it to a
    monitoring store and merge across micro-batches; size is
    O(depth×width) regardless of input cardinality."""
    return F.count_min_sketch(F.col(col), F.lit(eps), F.lit(confidence), F.lit(seed))


def heavy_hitter_sketch(
    df: DataFrame,
    col: str = "conv_id",
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
):
    """Count-min sketch over a key column — the monitoring primitive
    for "which conversations/sinks are hot RIGHT NOW" without a
    groupBy shuffle: one pass, map-side combine, a few MB at any
    cardinality. Returns the deserialized JVM sketch
    (``.estimateCount(value)``, ``.mergeInPlace(other)``)."""
    row = df.agg(count_min_sketch_col(col, eps, confidence, seed).alias("sk")).head()
    jvm = df.sparkSession._jvm
    return jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bytes(row["sk"]))


def approx_sink_profile(df: DataFrame, rsd: float = 0.02) -> DataFrame:
    """Cheap per-batch sink profile for dashboards: approximate
    distinct conversations and an approximate p95 turn gap per sink,
    one map-side-combined aggregation (HLL + quantile sketch — both
    mergeable, both O(sketch) per partition, no exact-distinct
    shuffle explosion)."""
    return df.groupBy("_index").agg(
        F.count(F.lit(1)).alias("rows"),
        F.approx_count_distinct("conv_id", rsd).alias("approx_convs"),
        F.percentile_approx("turn_idx", 0.95, 10_000).alias("approx_p95_turn"),
    )


def observe_pipeline_stats(df: DataFrame, name: str = "pipeline_stats") -> tuple[DataFrame, Observation]:
    """Attach the A1/A2-style counters to the batch plan. After the
    batch is materialized (written), ``observation.get`` returns:
    rows, parse_errors, null_records, distinct-sink lower bound."""
    obs = Observation(name)
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.when(~F.col("parse_ok"), 1).otherwise(0)).alias("parse_errors"),
        F.sum(F.when(F.col("malformed_record"), 1).otherwise(0)).alias("null_records"),
        F.approx_count_distinct("_index").alias("approx_sinks"),
    )
    return observed, obs
