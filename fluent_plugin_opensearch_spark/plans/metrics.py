"""Zero-extra-pass metrics via ``df.observe`` (SURVEY.md §2.5 A2):
the error-handler's stats counters re-expressed as Observation
aggregates collected DURING the sink write — no second scan of the
batch, which at 100 TB is the difference between 1× and 2× IO."""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def heavy_hitter_sketch(
    df: DataFrame,
    col: str = "conv_id",
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
):
    """Count-min sketch over a key column (`df.stat.countMinSketch`,
    JVM-side, one pass, mergeable across partitions) — the monitoring
    primitive for "which conversations/sinks are hot RIGHT NOW"
    without a groupBy shuffle. Width/depth derive from eps/confidence;
    at 10^12 rows the sketch stays a few MB regardless of cardinality.
    Returns the sketch object (``.estimateCount(value)``)."""
    return df.stat.countMinSketch(col, eps=eps, confidence=confidence, seed=seed)


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
