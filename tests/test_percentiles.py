"""Exact nearest-rank length-percentile tests.

The operator is checked on a hand-built fixture (known order
statistics, null-text exclusion), property-tested against an
independent pure-Python nearest-rank evaluation on random multi-day
data, and plan-pinned: the windows must run over the (day, len)
rollup, never raw rows, with no Python in the plan.
"""

from __future__ import annotations

import datetime as dt
import math
import random

from fluent_plugin_opensearch_spark.operators.sessions import length_percentiles
from fluent_plugin_opensearch_spark.sources.transcripts import load_transcripts

from .conftest import SF_SMOKE

TS = dt.datetime


def _frame(spark, rows):
    return spark.createDataFrame(rows, "ts timestamp_ntz, text string")


def _py_percentiles(lens_by_day: dict, pcts=(50, 95, 99)) -> set:
    out = set()
    for day, lens in lens_by_day.items():
        s = sorted(lens)
        n = len(s)
        for p in pcts:
            out.add((day, p, s[math.ceil(p * n / 100) - 1]))
    return out


def test_hand_fixture(spark):
    # day 1: lengths 1..10 → p50 = rank 5 → 5, p95 = rank ceil(9.5)=10
    # → 10, p99 = rank 10 → 10. Null text must be excluded.
    rows = [(TS(2024, 1, 1, 0, i), "x" * (i + 1)) for i in range(10)]
    rows.append((TS(2024, 1, 1, 5), None))
    # day 2: a single row → every percentile is that row's length
    rows.append((TS(2024, 1, 2, 0), "abc"))
    got = {
        (r["day"], r["pct"], r["len_pct"])
        for r in length_percentiles(_frame(spark, rows)).collect()
    }
    assert got == {
        ("2024-01-01", 50, 5),
        ("2024-01-01", 95, 10),
        ("2024-01-01", 99, 10),
        ("2024-01-02", 50, 3),
        ("2024-01-02", 95, 3),
        ("2024-01-02", 99, 3),
    }


def test_property_random(spark):
    """Random lengths with heavy ties across 3 days, several pct sets:
    Spark's rollup-walk matches the independent sorted-list rank."""
    rng = random.Random(7)
    rows, lens_by_day = [], {}
    for d in range(1, 4):
        day = f"2024-02-{d:02d}"
        for i in range(rng.randint(30, 200)):
            ln = rng.choice([1, 2, 3, 5, 8, 13, 21, 34, 55, 89])
            lens_by_day.setdefault(day, []).append(ln)
            rows.append((TS(2024, 2, d, i % 24, i % 60, i // 60), "y" * ln))
    df = _frame(spark, rows)
    for pcts in ((50, 95, 99), (1, 25, 50, 75, 100), (10,)):
        got = {
            (r["day"], r["pct"], r["len_pct"])
            for r in length_percentiles(df, pcts=pcts).collect()
        }
        assert got == _py_percentiles(lens_by_day, pcts), f"pcts={pcts}"


def test_one_row_per_day_pct(spark):
    """Ties at the target rank must still yield exactly one row per
    (day, pct) — the rank falls inside exactly one rollup run."""
    rows = [(TS(2024, 3, 1, 0, i % 60, i // 60), "z" * 4) for i in range(100)]
    rows += [(TS(2024, 3, 1, 1, i), "z" * 9) for i in range(7)]
    out = length_percentiles(_frame(spark, rows)).collect()
    assert len(out) == 3
    assert {(r["pct"], r["len_pct"]) for r in out} == {(50, 4), (95, 9), (99, 9)}


def test_plan_shape(spark):
    """Windows run over the (day, len) rollup: plan is one hash
    aggregate + one day-partitioned window stage — ≤2 exchanges, no
    Python, no sort-merge join."""
    t = load_transcripts(spark, SF_SMOKE)
    plan = (
        length_percentiles(t)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange") <= 2
    assert "HashAggregate" in plan
