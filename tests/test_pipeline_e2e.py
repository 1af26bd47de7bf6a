"""End-to-end: read transcripts → build → fan-out write → per-sink
counts (SURVEY.md §7 Phase 0 — exercises S1, P3, R2, R6, A1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fluent_plugin_opensearch_spark import (
    PipelineConfig,
    SinkCatalog,
    build,
    load_transcripts,
    run_batch,
    split_streams,
)
from fluent_plugin_opensearch_spark.plans.pipeline import CheckpointManifest

from .conftest import SF_SMOKE

CFG = PipelineConfig(logstash_format=True, logstash_prefix="logs")


def test_build_schema(spark):
    t = load_transcripts(spark, SF_SMOKE)
    out = build(t, CFG, spark)
    cols = set(out.columns)
    for c in ["conv_id", "turn_idx", "role", "text", "tool", "@timestamp",
              "_index", "_id", "level", "req_id", "duration_ms",
              "role_class", "tool_family", "parse_ok"]:
        assert c in cols, c


def test_per_sink_counts_match_duckdb(spark):
    """Per-sink routed-row counts — the graft's headline correctness
    metric (A1) — vs an independent DuckDB computation."""
    import duckdb

    t = load_transcripts(spark, SF_SMOKE)
    good, _ = split_streams(build(t, CFG, spark), CFG)
    got = {
        r["_index"]: r["routed_rows"]
        for r in good.groupBy("_index").agg(F.count(F.lit(1)).alias("routed_rows")).collect()
    }

    from fluent_plugin_opensearch_spark.sources.transcripts import ORACLE_PREFIX

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF_SMOKE}/events.parquet'")
    want = dict(
        con.sql(
            ORACLE_PREFIX
            + """
      SELECT lower(concat('logs-', strftime(ts, '%Y.%m.%d'))) AS idx, count(*)
      FROM transcripts
      WHERE text IS NOT NULL AND regexp_matches(text, '^\\[(\\w+)\\] req=(\\d+) took=(\\d+)ms ')
      GROUP BY 1
    """
        ).fetchall()
    )
    assert got == want
    assert sum(got.values()) > 0


def test_run_batch_and_resume(spark, tmp_path):
    cat = SinkCatalog(str(tmp_path / "warehouse"))
    manifest = CheckpointManifest(str(tmp_path / "manifest.json"))
    t = load_transcripts(spark, SF_SMOKE)

    m1 = run_batch(spark, t, CFG, cat, batch_id="b1", manifest=manifest)
    assert m1["routed_rows"] > 0
    assert m1["dlq_rows"] > 0  # malformed + null rows exist by construction

    # resume: identical batch id is skipped (idempotent re-run)
    m2 = run_batch(spark, t, CFG, cat, batch_id="b1", manifest=manifest)
    assert m2.get("skipped") is True

    # sink row count equals routed_rows; dlq table holds the dlq rows
    sink = spark.read.parquet(cat.path("sink"))
    assert sink.count() == m1["routed_rows"]
    dlq = spark.read.parquet(cat.path("dlq"))
    assert dlq.count() == m1["dlq_rows"]
    # per-turn ordering invariant: texts equal after (conv_id, turn_idx) sort
    src = t.filter(F.col("text").isNotNull()).orderBy("conv_id", "turn_idx")
    n_src = src.count()
    assert sink.count() + dlq.filter(F.col("dlq_reason") != "null_record").count() == n_src
