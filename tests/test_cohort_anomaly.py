"""Cohort retention and integer-exact k-sigma anomaly tests."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F

from fluent_plugin_opensearch_spark.operators.sessions import (
    cohort_retention,
    hourly_anomalies,
)
from fluent_plugin_opensearch_spark.sources.transcripts import load_transcripts

from .conftest import SF_SMOKE

TS = dt.datetime


def test_cohort_retention_hand_built(spark):
    rows = [
        # conv A: first active Jan 1, returns Jan 3 (offsets 0, 2)
        ("A", 0, TS(2024, 1, 1, 9)),
        ("A", 1, TS(2024, 1, 1, 10)),  # same day — one distinct day
        ("A", 2, TS(2024, 1, 3, 9)),
        # conv B: single day Jan 2 (offset 0 only)
        ("B", 0, TS(2024, 1, 2, 5)),
        # conv C: same cohort day as A, offsets 0 and 1
        ("C", 0, TS(2024, 1, 1, 23)),
        ("C", 1, TS(2024, 1, 2, 1)),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, ts timestamp_ntz")
    got = {
        (r["cohort_day"], r["offset_days"]): r["n_convs"]
        for r in cohort_retention(df).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 1,
        ("2024-01-01", 2): 1,
        ("2024-01-02", 0): 1,
    }


def test_cohort_offset_zero_totals(spark):
    """Every conversation appears exactly once at offset 0 (its cohort
    day is by definition an active day)."""
    t = load_transcripts(spark, SF_SMOKE)
    ret = cohort_retention(t)
    n0 = (
        ret.where(F.col("offset_days") == 0).agg(F.sum("n_convs")).collect()[0][0]
    )
    assert n0 == t.select("conv_id").distinct().count()


def _py_sigma_flags(counts: dict, k: int) -> set:
    cnt = len(counts)
    s1 = sum(counts.values())
    s2 = sum(n * n for n in counts.values())
    out = set()
    for key, n in counts.items():
        dev = n * cnt - s1
        if dev > 0 and dev * dev > k * k * (cnt * s2 - s1 * s1):
            out.add(key)
    return out


def test_hourly_anomalies_planted_spike(spark):
    """A 10× spike hour is the only flagged row; a flat series flags
    nothing (dev <= 0 everywhere or boundary not exceeded)."""
    rows = []
    for h in range(24):
        per_hour = 100 if h != 7 else 1000
        for i in range(per_hour):
            rows.append((f"c{h}_{i}", 0, TS(2024, 1, 1, h, i % 60, i // 60)))
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, ts timestamp_ntz")
    got = [(r["day"], r["hour"], r["n_turns"]) for r in hourly_anomalies(df).collect()]
    assert got == [("2024-01-01", 7, 1000)]

    flat = spark.createDataFrame(
        [(f"c{h}_{i}", 0, TS(2024, 1, 1, h, i)) for h in range(24) for i in range(5)],
        "conv_id string, turn_idx int, ts timestamp_ntz",
    )
    assert hourly_anomalies(flat).count() == 0


def test_hourly_anomalies_property_random(spark):
    """Random hourly series: Spark's decimal-exact criterion matches an
    independent Python big-int evaluation of the same inequality."""
    rng = random.Random(7)
    rows = []
    counts = {}
    for h in range(48):
        day, hour = f"2024-01-{1 + h // 24:02d}", h % 24
        n = rng.randint(1, 40) + (400 if rng.random() < 0.05 else 0)
        counts[(day, hour)] = n
        for i in range(n):
            rows.append(
                (f"c{h}_{i}", 0, TS(2024, 1, 1 + h // 24, hour, i % 60, i // 60))
            )
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, ts timestamp_ntz")
    for k in (2, 3):
        got = {
            (r["day"], r["hour"]) for r in hourly_anomalies(df, k=k).collect()
        }
        assert got == _py_sigma_flags(counts, k), f"k={k}"


def test_hourly_anomalies_plan_shape(spark):
    """Stats ride a broadcast (nested-loop over ONE row); the only
    shuffle is the hourly-rollup aggregate — no sort-merge join."""
    t = load_transcripts(spark, SF_SMOKE)
    plan = (
        hourly_anomalies(t)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
