"""Multiwindow SLO error-budget burn-rate tests.

Checked on a planted scenario whose long window lands EXACTLY on the
budget boundary (strict > must not fire), property-tested against an
independent pure-Python wall-clock-window evaluation on random gappy
series (the RANGE-frame semantics: a traffic gap shrinks the long
window; a ROWS frame would wrongly reach back across it), and
plan-pinned (no Python, windows over the hourly rollup).
"""

from __future__ import annotations

import datetime as dt
import random

from fluent_plugin_opensearch_spark.operators.sessions import slo_burn_alerts
from fluent_plugin_opensearch_spark.sources.transcripts import load_transcripts

from .conftest import SF_SMOKE

TS = dt.datetime

EPOCH = dt.date(1970, 1, 1)


def _rows_for(day: dt.date, hour: int, n: int, n_err: int):
    out = []
    for i in range(n):
        lvl = "ERROR" if i < n_err else "INFO"
        out.append(
            (
                f"c{day}{hour}_{i}",
                TS(day.year, day.month, day.day, hour, i % 60, i // 60),
                f"[{lvl}] req={i} took=3ms m",
            )
        )
    return out


def _frame(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, ts timestamp_ntz, text string"
    )


def _py_burn(hours: dict, budget_ppm: int, factor: int, long_hours: int) -> set:
    """Independent wall-clock-window big-int evaluation."""
    thr = factor * budget_ppm
    out = set()
    for (day, hour, idx), (n, e) in hours.items():
        n_l = sum(
            nn
            for (_, _, i2), (nn, _) in hours.items()
            if idx - long_hours < i2 <= idx
        )
        e_l = sum(
            ee
            for (_, _, i2), (_, ee) in hours.items()
            if idx - long_hours < i2 <= idx
        )
        if e * 1_000_000 > thr * n and e_l * 1_000_000 > thr * n_l:
            out.add((day, hour))
    return out


def test_boundary_exactness(spark):
    """Hour 6's long window is EXACTLY 10% error — strict > must not
    fire; hours 7-8 exceed on both windows and must."""
    day = dt.date(2024, 1, 1)
    rows = []
    for h in range(6):
        rows += _rows_for(day, h, 100, 2)
    for h in (6, 7, 8):
        rows += _rows_for(day, h, 100, 50)
    rows.append(("bad", TS(2024, 1, 1, 3), "not grok"))  # excluded by parse
    rows.append(("nul", TS(2024, 1, 1, 4), None))
    got = {
        (r["day"], r["hour"])
        for r in slo_burn_alerts(
            _frame(spark, rows), budget_ppm=20_000, factor=5, long_hours=6
        ).collect()
    }
    assert got == {("2024-01-01", 7), ("2024-01-01", 8)}


def test_gap_uses_wall_clock_window(spark):
    """A >long_hours traffic gap must reset the long window (RANGE
    frame over the hour index): the spike after the gap is judged
    against itself only, not against rows from before the gap."""
    day = dt.date(2024, 1, 2)
    # hour 0: huge clean block; hours 1-17 silent; hour 18: 20% errors
    rows = _rows_for(day, 0, 200, 0) + _rows_for(day, 18, 50, 10)
    got = {
        (r["day"], r["hour"])
        for r in slo_burn_alerts(
            _frame(spark, rows), budget_ppm=20_000, factor=5, long_hours=6
        ).collect()
    }
    # long window at hour 18 sees only hour 18 (20% > 10%) → fires.
    # a ROWS-frame bug would average in hour 0 (10/250 = 4%) → silent.
    assert got == {("2024-01-02", 18)}


def test_property_random(spark):
    """Random gappy multi-day series across (budget, factor, long)
    settings: the decimal-exact plan matches the independent Python
    wall-clock evaluation, including across midnight."""
    rng = random.Random(23)
    rows, hours = [], {}
    for hh in range(72):
        if rng.random() < 0.4:
            continue  # gap
        day = dt.date(2024, 3, 1) + dt.timedelta(days=hh // 24)
        n = rng.randint(10, 60)
        e = rng.choice([0, 1, rng.randint(0, n // 3)])
        idx = (day - EPOCH).days * 24 + hh % 24
        hours[(day.isoformat(), hh % 24, idx)] = (n, e)
        rows += _rows_for(day, hh % 24, n, e)
    df = _frame(spark, rows)
    for budget, factor, long_hours in ((20_000, 5, 6), (10_000, 6, 3), (50_000, 2, 12)):
        got = {
            (r["day"], r["hour"])
            for r in slo_burn_alerts(
                df, budget_ppm=budget, factor=factor, long_hours=long_hours
            ).collect()
        }
        want = _py_burn(hours, budget, factor, long_hours)
        assert got == want, f"budget={budget} factor={factor} long={long_hours}"


def test_plan_shape(spark):
    t = load_transcripts(spark, SF_SMOKE)
    plan = slo_burn_alerts(t)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "SortMergeJoin" not in plan
