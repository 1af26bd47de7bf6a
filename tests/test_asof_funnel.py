"""As-of join (broadcast + window paths) and ordered-funnel tests.

The as-of edge matrix a versioned-dimension join must honor:
boundary-inclusive match, no-version-yet → NULL, all-versions-later →
NULL, NULL key → NULL, NULL event time → NULL, latest-of-several wins.
The funnel fold is property-tested against an independent pure-Python
greedy matcher (the tests/test_property.py pattern that caught two
real r2 bugs).
"""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from fluent_plugin_opensearch_spark.operators.enrich import (
    asof_enrich,
    asof_join,
    tool_policy,
)
from fluent_plugin_opensearch_spark.operators.sessions import (
    funnel_report,
    funnel_stages,
)
from fluent_plugin_opensearch_spark.sources.transcripts import load_transcripts

from .conftest import SF_SMOKE

TS = dt.datetime


def _versions(spark):
    rows = [
        ("a", TS(2024, 1, 10), "v1", 1),
        ("a", TS(2024, 1, 20), "v2", 2),
        ("b", TS(2024, 6, 1), "late", 1),
    ]
    return spark.createDataFrame(
        rows, "k string, valid_from timestamp_ntz, policy string, rev int"
    )


def _facts(spark):
    rows = [
        ("f_before", "a", TS(2024, 1, 5)),  # before first version -> NULL
        ("f_boundary", "a", TS(2024, 1, 10)),  # ts == valid_from -> inclusive v1
        ("f_mid", "a", TS(2024, 1, 15)),  # between versions -> v1
        ("f_latest", "a", TS(2024, 3, 1)),  # after last -> v2
        ("f_late_dim", "b", TS(2024, 1, 15)),  # all versions later -> NULL
        ("f_nokey", None, TS(2024, 1, 15)),  # NULL key -> NULL
        ("f_nots", "a", None),  # NULL event time -> NULL
        ("f_unknown", "zz", TS(2024, 1, 15)),  # key absent from dim -> NULL
    ]
    return spark.createDataFrame(rows, "name string, k string, ts timestamp_ntz")


EXPECTED = {
    "f_before": (None, None),
    "f_boundary": ("v1", 1),
    "f_mid": ("v1", 1),
    "f_latest": ("v2", 2),
    "f_late_dim": (None, None),
    "f_nokey": (None, None),
    "f_nots": (None, None),
    "f_unknown": (None, None),
}


@pytest.mark.parametrize("impl", [asof_enrich, asof_join])
def test_asof_edge_matrix(spark, impl):
    out = impl(_facts(spark), _versions(spark), on="k", ts_col="ts")
    got = {r["name"]: (r["policy"], r["rev"]) for r in out.collect()}
    assert got == EXPECTED


def test_asof_paths_agree_on_transcripts(spark):
    t = load_transcripts(spark, SF_SMOKE)
    pol = tool_policy(spark)
    agg = lambda d: sorted(  # noqa: E731
        map(
            tuple,
            d.groupBy("tool", "policy", "policy_rev")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect(),
        ),
        key=str,
    )
    assert agg(asof_enrich(t, pol, on="tool", ts_col="ts")) == agg(
        asof_join(t, pol, on="tool", ts_col="ts")
    )


def test_asof_broadcast_plan_shape(spark):
    """The broadcast path must not shuffle the fact side: broadcast
    hash join only, no sort-merge join."""
    t = load_transcripts(spark, SF_SMOKE)
    plan = (
        asof_enrich(t, tool_policy(spark), on="tool", ts_col="ts")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_asof_join_null_keys_bypass_window(spark):
    """NULL-key facts (most of transcripts.tool) must not enter the
    window exchange — they are unioned back after it."""
    facts = _facts(spark)
    out = asof_join(facts, _versions(spark), on="k", ts_col="ts")
    assert out.count() == facts.count()  # nothing dropped or duplicated
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Union" in plan


def _py_funnel(seq: list[str], steps: tuple[str, ...]) -> int:
    stage = 0
    for label in seq:
        if stage < len(steps) and label == steps[stage]:
            stage += 1
    return stage


def test_funnel_property_random(spark):
    """Random sequences: Spark fold == independent Python greedy
    matcher, including labels outside the step set and stage 0."""
    rng = random.Random(42)
    steps = ("u", "a", "s", "t")
    labels = ["u", "a", "s", "t", "x", "y"]
    rows, expected = [], {}
    for g in range(60):
        gid = f"g{g:02d}"
        seq = [rng.choice(labels) for _ in range(rng.randint(0, 12))]
        for i, label in enumerate(seq):
            rows.append((gid, i, label))
        expected[gid] = _py_funnel(seq, steps)
    expected = {g: s for g, s in expected.items() if any(r[0] == g for r in rows)}
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string")
    got = {
        r["conv_id"]: r["stage"]
        for r in funnel_stages(df, steps).collect()
    }
    assert got == expected


def test_funnel_report_totals(spark):
    """n_reached is a proper survival curve: monotone non-increasing
    in stage, and n_reached at the minimum stage equals total groups."""
    t = load_transcripts(spark, SF_SMOKE).where(F.col("turn_idx") < 6)
    rows = sorted(
        map(tuple, funnel_report(t, ("user", "assistant", "system", "tool")).collect())
    )
    total = t.select("conv_id").distinct().count()
    reached = [r[2] for r in rows]  # ascending stage order
    assert rows[0][2] == total  # n_reached at the minimum stage = everyone
    assert all(reached[i] >= reached[i + 1] for i in range(len(reached) - 1))
    assert sum(r[1] for r in rows) == total


def test_funnel_duplicate_steps_rejected(spark):
    t = load_transcripts(spark, SF_SMOKE)
    with pytest.raises(ValueError):
        funnel_stages(t, ("user", "user"))


@pytest.mark.parametrize("impl", [asof_enrich, asof_join])
def test_asof_null_payload_not_skipped(spark, impl):
    """A legitimately-NULL payload field in the in-force version must
    be returned as NULL — not skipped in favor of an older version's
    value, and never stitched together from two different revisions."""
    vers = spark.createDataFrame(
        [
            ("a", TS(2024, 1, 10), "allow", 1),
            ("a", TS(2024, 1, 20), None, 2),  # rev 2 revokes the policy
        ],
        "k string, valid_from timestamp_ntz, policy string, rev int",
    )
    facts = spark.createDataFrame(
        [("f1", "a", TS(2024, 1, 15)), ("f2", "a", TS(2024, 2, 1))],
        "name string, k string, ts timestamp_ntz",
    )
    got = {r["name"]: (r["policy"], r["rev"]) for r in impl(facts, vers, on="k", ts_col="ts").collect()}
    assert got == {"f1": ("allow", 1), "f2": (None, 2)}


def test_funnel_tied_positions_do_not_double_advance(spark):
    """Rows tied at the same order_col value cannot advance two
    stages: the contract is strictly increasing positions (the
    chained-min formulation the oracle computes)."""
    rows = [
        ("c_tie", 5, "user"),
        ("c_tie", 5, "assistant"),  # tied with the stage-1 match -> no advance
        ("c_ok", 5, "user"),
        ("c_ok", 6, "assistant"),
        ("c_rev", 5, "assistant"),  # wrong order, then proper later match
        ("c_rev", 6, "user"),
        ("c_rev", 7, "assistant"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string")
    got = {
        r["conv_id"]: r["stage"]
        for r in funnel_stages(df, ("user", "assistant")).collect()
    }
    assert got == {"c_tie": 1, "c_ok": 2, "c_rev": 2}


def _py_funnel_strict(items: list, steps: tuple) -> int:
    """Strict-position reference: matches sorted by (pos, step_idx),
    stage advances only at a position strictly beyond the last match —
    the chained-min formulation."""
    sidx = {s: i for i, s in enumerate(steps)}
    stage, last = 0, None
    for p, si in sorted((p, sidx[l]) for p, l in items if l in sidx):
        if si == stage and (last is None or p > last):
            stage += 1
            last = p
    return stage


def test_funnel_property_random_with_ties(spark):
    """Random sequences with REPEATED order positions: Spark fold ==
    the strict-position Python reference (ties can never advance two
    stages at one position)."""
    rng = random.Random(20260819)
    steps = ("u", "a", "s")
    labels = ["u", "a", "s", "x"]
    rows, expected = [], {}
    for g in range(80):
        gid = f"t{g:02d}"
        items = [
            (rng.randint(0, 5), rng.choice(labels))
            for _ in range(rng.randint(1, 10))
        ]
        for p, label in items:
            rows.append((gid, p, label))
        expected[gid] = _py_funnel_strict(items, steps)
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string")
    got = {r["conv_id"]: r["stage"] for r in funnel_stages(df, steps).collect()}
    assert got == expected
