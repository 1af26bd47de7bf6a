"""Sequence/session operators over the (conv_id, turn_idx) ordering
invariant (SURVEY.md §2.7 O4). The reference has no windowed analytics,
but the graft's transcript model makes these the bread-and-butter
aggregate queries a log pipeline serves; all are single-shuffle window
plans partitioned on conv_id (salt-compatible)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(df: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Split conversations into sessions at inactivity gaps: a new
    session starts when the inter-turn gap exceeds ``gap_minutes``.
    session_no = running count of gap-breaks (cumulative sum over the
    turn order) — one window, no UDF, deterministic."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    is_break = F.when(gap > gap_minutes * 60 * 1_000_000, 1).otherwise(0)
    return df.withColumn(
        "session_no",
        F.sum(is_break).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("int"),
    )


def session_stats(df: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-session aggregates: turns, span, roles seen."""
    s = sessionize(df, gap_minutes)
    return s.groupBy("conv_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_turns"),
        (F.unix_micros(F.max("ts").cast("timestamp")) - F.unix_micros(F.min("ts").cast("timestamp"))).alias(
            "span_us"
        ),
        F.countDistinct("role").alias("n_roles"),
    )


def top_k_per_day(df: DataFrame, k: int = 3) -> DataFrame:
    """Heavy hitters: the k most active conversations per UTC day
    (rank by turn count, deterministic tie-break by conv_id). One
    partial-agg shuffle + one window shuffle — the standard top-k plan;
    at scale the pre-aggregation keeps the window input at
    |days × convs-with-traffic|, never raw rows."""
    day = F.date_format("ts", "yyyy-MM-dd").alias("day")
    counts = df.groupBy(day, "conv_id").agg(F.count(F.lit(1)).alias("n_turns"))
    w = Window.partitionBy("day").orderBy(F.desc("n_turns"), F.col("conv_id"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("day", "conv_id", "n_turns", "rank")
    )
