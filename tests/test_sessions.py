"""Sessionization equivalence: the skew-safe blocked variant must be
row-identical to the plain window version, including breaks that land
exactly on block boundaries."""

from __future__ import annotations

from pyspark.sql import functions as F

from fluent_plugin_opensearch_spark import load_transcripts
from fluent_plugin_opensearch_spark.operators.sessions import sessionize, sessionize_blocked

from .conftest import SF_SMOKE


def _collect_sessions(df):
    return {
        (r["conv_id"], r["turn_idx"]): r["session_no"]
        for r in df.select("conv_id", "turn_idx", "session_no").collect()
    }


def test_blocked_equals_plain_on_real_data(spark):
    t = load_transcripts(spark, SF_SMOKE)
    plain = _collect_sessions(sessionize(t, gap_minutes=30))
    blocked = _collect_sessions(sessionize_blocked(t, gap_minutes=30, block_size=7))
    assert blocked == plain


def test_blocked_boundary_breaks(spark):
    """Gaps exactly at block boundaries: turn b*k-1 → b*k with a break,
    and consecutive blocks without a break."""
    rows = []
    ts0 = 1_700_000_000_000_000  # µs
    t = ts0
    for i in range(20):
        # break before turns 5 (block boundary at block_size=5) and 12
        if i in (5, 12):
            t += 3600 * 1_000_000
        else:
            t += 60 * 1_000_000
        rows.append(("c1", i, t))
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, raw_us bigint").withColumn(
        "ts", F.timestamp_micros(F.col("raw_us"))
    )
    plain = _collect_sessions(sessionize(df, gap_minutes=30))
    blocked = _collect_sessions(sessionize_blocked(df, gap_minutes=30, block_size=5))
    assert blocked == plain
    assert plain[("c1", 19)] == 2  # two breaks → session 2


def test_blocked_splits_hot_conversation(spark):
    """The hot conv's phase-1 window runs across multiple partitions
    (the whole point): more than one block per conv."""
    df = spark.createDataFrame(
        [("hot", i, 1_700_000_000_000_000 + i * 1_000_000) for i in range(1000)],
        "conv_id string, turn_idx int, raw_us bigint",
    ).withColumn("ts", F.timestamp_micros(F.col("raw_us")))
    out = sessionize_blocked(df, gap_minutes=30, block_size=100)
    assert out.count() == 1000
    # 10 blocks → phase-1 parallelism 10 for this single conversation
    n_blocks = df.withColumn("b", (F.col("turn_idx") / 100).cast("int")).select("b").distinct().count()
    assert n_blocks == 10


def test_blocked_equals_plain_random(spark):
    """Randomized equivalence: seeded random gap patterns (some past
    the 30-min threshold) across several convs must produce identical
    sessions for every block size, including block_size=1."""
    import random

    rng = random.Random(3)
    rows = []
    for c in range(6):
        t = 1_700_000_000_000_000 + rng.randrange(10**6)
        for i in range(rng.randrange(5, 60)):
            t += rng.choice([30, 60, 1900, 3600]) * 1_000_000
            rows.append((f"c{c}", i, t))
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, raw_us bigint").withColumn(
        "ts", F.timestamp_micros(F.col("raw_us"))
    )
    plain = _collect_sessions(sessionize(df, gap_minutes=30))
    for bs in (1, 3, 7, 1000):
        assert _collect_sessions(sessionize_blocked(df, gap_minutes=30, block_size=bs)) == plain, bs


def test_render_conversations_planted(spark):
    """Rendered document = role-prefixed lines in turn order; sha and
    line counts match an independent hashlib computation; null-text
    turns are skipped."""
    import hashlib

    from fluent_plugin_opensearch_spark.operators.sessions import render_conversations

    rows = [
        ("c1", 1, "assistant", "world"),
        ("c1", 0, "user", "hello"),
        ("c1", 2, "tool", None),
        ("c2", 0, "system", "boot"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string")
    got = {r["conv_id"]: (r["n_lines"], r["render_sha"]) for r in render_conversations(df).collect()}
    c1 = "user: hello\nassistant: world"
    c2 = "system: boot"
    assert got == {
        "c1": (2, hashlib.sha256(c1.encode()).hexdigest()),
        "c2": (1, hashlib.sha256(c2.encode()).hexdigest()),
    }
