"""Interval (range-containment) join and CUSUM changepoint tests.

The interval join is checked on a hand-built edge matrix (half-open
boundary, overlap multi-match, sub-grain window, no-match) and for its
plan shape (equi-join on the bucket, never a nested-loop range join).
The CUSUM fold is property-tested against an independent pure-Python
big-int evaluation of the same recurrence.
"""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F

from fluent_plugin_opensearch_spark.operators.enrich import (
    interval_join,
    maintenance_windows,
)
from fluent_plugin_opensearch_spark.operators.sessions import cusum_anomalies
from fluent_plugin_opensearch_spark.sources.transcripts import load_transcripts

from .conftest import SF_SMOKE

TS = dt.datetime


def _facts(spark, rows):
    return spark.createDataFrame(rows, "fact_id string, ts timestamp_ntz")


def _ivs(spark, rows):
    return spark.createDataFrame(
        rows, "window_id string, starts timestamp_ntz, ends timestamp_ntz"
    )


def test_interval_join_edge_matrix(spark):
    ivs = _ivs(
        spark,
        [
            ("w1", TS(2024, 1, 1, 0), TS(2024, 1, 1, 12)),
            ("w2", TS(2024, 1, 1, 10), TS(2024, 1, 2, 0)),  # overlaps w1 10:00-12:00
            ("w3", TS(2024, 1, 5, 3, 15), TS(2024, 1, 5, 3, 45)),  # sub-hour
            ("w4", TS(2024, 6, 1), TS(2024, 6, 2)),  # matches nothing
        ],
    )
    facts = _facts(
        spark,
        [
            ("a", TS(2024, 1, 1, 0, 0)),  # == w1.starts → inclusive
            ("b", TS(2024, 1, 1, 11, 30)),  # in w1 ∩ w2 → two rows
            ("c", TS(2024, 1, 1, 12, 0)),  # == w1.ends → EXCLUDED from w1, in w2
            ("d", TS(2024, 1, 5, 3, 20)),  # inside the sub-hour window
            ("e", TS(2024, 1, 5, 3, 50)),  # same bucket, after w3.ends
            ("f", None),  # NULL ts never matches
            ("g", TS(2025, 1, 1)),  # no interval
        ],
    )
    got = sorted(
        (r["fact_id"], r["window_id"])
        for r in interval_join(facts, ivs).collect()
    )
    assert got == [("a", "w1"), ("b", "w1"), ("b", "w2"), ("c", "w2"), ("d", "w3")]


def test_interval_join_day_grain_agrees(spark):
    """Grain only changes the bucketing, never the result set."""
    t = load_transcripts(spark, SF_SMOKE)
    ivs = maintenance_windows(spark)
    key = lambda df: sorted(  # noqa: E731
        (r["conv_id"], r["turn_idx"], r["window_id"]) for r in df.collect()
    )
    assert key(interval_join(t, ivs, grain="hour")) == key(
        interval_join(t, ivs, grain="day")
    )


def test_interval_join_plan_is_equi_join(spark):
    """The join must be an equi-join on the bucket (hash-partitionable /
    broadcastable) — never BroadcastNestedLoopJoin / CartesianProduct,
    which is what a raw range predicate would produce."""
    t = load_transcripts(spark, SF_SMOKE)
    plan = (
        interval_join(t, maintenance_windows(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def _py_cusum_flags(counts: dict, h: int, slack_pct: int) -> set:
    """Independent big-int evaluation of the documented recurrence."""
    cnt = len(counts)
    s1 = sum(counts.values())
    s2 = sum(n * n for n in counts.values())
    rhs = 10_000 * h * h * (cnt * s2 - s1 * s1)
    out = set()
    by_day: dict = {}
    for (day, hour), n in counts.items():
        by_day.setdefault(day, []).append((hour, n))
    for day, series in by_day.items():
        s = 0
        for hour, n in sorted(series):
            s = max(0, s + 100 * (cnt * n - s1) - slack_pct * s1)
            if s > 0 and s * s > rhs:
                out.add((day, hour))
    return out


def test_cusum_planted_drift(spark):
    """A sustained +2σ-ish drift (hours 12-23 at 130 vs baseline 100)
    accumulates past the band even though NO single hour is a 4-sigma
    spike; the flat prefix stays unflagged."""
    rows = []
    counts = {}
    for h in range(24):
        n = 100 if h < 12 else 130
        counts[("2024-01-01", h)] = n
        for i in range(n):
            rows.append((f"c{h}_{i}", TS(2024, 1, 1, h, i % 60, i // 60)))
    df = spark.createDataFrame(rows, "conv_id string, ts timestamp_ntz")
    got = {(r["day"], r["hour"]) for r in cusum_anomalies(df).collect()}
    expected = _py_cusum_flags(counts, h=4, slack_pct=5)
    assert got == expected
    assert expected, "the planted drift must flag at least one hour"
    assert min(hh for _, hh in expected) >= 12, "flat prefix must stay clean"


def test_cusum_flat_series_clean(spark):
    flat = spark.createDataFrame(
        [(f"c{h}_{i}", TS(2024, 1, 1, h, i)) for h in range(24) for i in range(5)],
        "conv_id string, ts timestamp_ntz",
    )
    assert cusum_anomalies(flat).count() == 0


def test_cusum_property_random(spark):
    """Random multi-day series across (h, slack) settings: Spark's
    decimal-exact fold matches the independent Python big-int path."""
    rng = random.Random(11)
    rows = []
    counts = {}
    for hh in range(72):
        day, hour = f"2024-01-{1 + hh // 24:02d}", hh % 24
        n = rng.randint(5, 40) + (120 if rng.random() < 0.1 else 0)
        counts[(day, hour)] = n
        for i in range(n):
            rows.append((f"c{hh}_{i}", TS(2024, 1, 1 + hh // 24, hour, i % 60, i // 60)))
    df = spark.createDataFrame(rows, "conv_id string, ts timestamp_ntz")
    for h, slack in ((2, 0), (3, 5), (4, 10)):
        got = {
            (r["day"], r["hour"])
            for r in cusum_anomalies(df, h=h, slack_pct=slack).collect()
        }
        assert got == _py_cusum_flags(counts, h, slack), f"h={h} slack={slack}"


def test_cusum_plan_shape(spark):
    """Stats ride a broadcast over the per-day fold; the rollup
    aggregate is the only wide exchange — no sort-merge join, no
    Python."""
    t = load_transcripts(spark, SF_SMOKE)
    plan = cusum_anomalies(t)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row stats frame
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan
