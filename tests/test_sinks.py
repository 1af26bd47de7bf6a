"""Write-operation semantics (W1/W2) and fan-out sink behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from fluent_plugin_opensearch_spark import PipelineConfig, SinkCatalog, merge_write
from fluent_plugin_opensearch_spark.sinks.writer import append_to_sink

SCHEMA = "_id string, _index string, v int"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_create_is_insert_if_absent(spark, tmp_path):
    """create: duplicate _id dropped + counted, not an error (W2)."""
    cat = SinkCatalog(str(tmp_path))
    cfg = PipelineConfig(write_operation="create", id_key="_id")
    s1 = merge_write(spark, _df(spark, [("a", "i1", 1), ("b", "i1", 1)]), cat, cfg)
    assert s1 == {"input": 2, "written": 2, "duplicates": 0}
    s2 = merge_write(spark, _df(spark, [("a", "i1", 2), ("c", "i1", 2)]), cat, cfg)
    assert s2 == {"input": 2, "written": 1, "duplicates": 1}
    rows = {r["_id"]: r["v"] for r in spark.read.parquet(cat.path("sink")).collect()}
    assert rows == {"a": 1, "b": 1, "c": 2}  # 'a' kept original (not replaced)


def test_index_replaces(spark, tmp_path):
    cat = SinkCatalog(str(tmp_path))
    cfg = PipelineConfig(write_operation="index", id_key="_id")
    merge_write(spark, _df(spark, [("a", "i1", 1), ("b", "i1", 1)]), cat, cfg)
    merge_write(spark, _df(spark, [("a", "i1", 9)]), cat, cfg)
    rows = {r["_id"]: r["v"] for r in spark.read.parquet(cat.path("sink")).collect()}
    assert rows == {"a": 9, "b": 1}


def test_update_only_touches_existing(spark, tmp_path):
    cat = SinkCatalog(str(tmp_path))
    merge_write(spark, _df(spark, [("a", "i1", 1)]), cat, PipelineConfig(write_operation="index"))
    cfg = PipelineConfig(write_operation="update", id_key="_id")
    s = merge_write(spark, _df(spark, [("a", "i1", 5), ("zz", "i1", 5)]), cat, cfg)
    assert s["written"] == 1  # 'zz' did not exist → skipped
    rows = {r["_id"]: r["v"] for r in spark.read.parquet(cat.path("sink")).collect()}
    assert rows == {"a": 5}


def test_upsert_merges(spark, tmp_path):
    cat = SinkCatalog(str(tmp_path))
    merge_write(spark, _df(spark, [("a", "i1", 1)]), cat, PipelineConfig(write_operation="index"))
    cfg = PipelineConfig(write_operation="upsert", id_key="_id")
    merge_write(spark, _df(spark, [("a", "i1", 7), ("b", "i1", 7)]), cat, cfg)
    rows = {r["_id"]: r["v"] for r in spark.read.parquet(cat.path("sink")).collect()}
    assert rows == {"a": 7, "b": 7}


def test_missing_id_dropped_for_create(spark, tmp_path):
    """create/update/upsert drop records without _id
    (out_opensearch.rb:895-903)."""
    cat = SinkCatalog(str(tmp_path))
    cfg = PipelineConfig(write_operation="create", id_key="_id")
    s = merge_write(spark, _df(spark, [(None, "i1", 1), ("a", "i1", 1)]), cat, cfg)
    assert s["written"] == 1
    assert spark.read.parquet(cat.path("sink")).count() == 1


def test_partitioned_fanout_layout(spark, tmp_path):
    """R6: one write, per-_index directories (the per-sink grouping)."""
    import os

    cat = SinkCatalog(str(tmp_path))
    df = _df(spark, [("a", "logs-2024.01.01", 1), ("b", "logs-2024.01.02", 1), ("c", "logs-2024.01.01", 1)])
    append_to_sink(df, cat, "sink")
    dirs = sorted(d for d in os.listdir(cat.path("sink")) if d.startswith("_index="))
    assert dirs == ["_index=logs-2024.01.01", "_index=logs-2024.01.02"]
    back = spark.read.parquet(cat.path("sink"))
    assert back.filter(F.col("_index") == "logs-2024.01.01").count() == 2
