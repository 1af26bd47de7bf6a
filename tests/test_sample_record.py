"""FIXTURES.md §3 — the reference's canonical sample_record
(test_out_opensearch.rb:78-86) run through meta extraction, tag
injection, key removal, and nested accessors."""

from __future__ import annotations

from pyspark.sql import functions as F

from fluent_plugin_opensearch_spark import PipelineConfig
from fluent_plugin_opensearch_spark.operators.transforms import (
    extract_meta,
    include_tag,
    missing_id_filter,
    remove_keys,
)

SAMPLE = [(26, "42", "parent", "routing", "test.tag", "2024-03-05 10:00:00")]
SCHEMA = "age int, request_id string, parent_id string, routing_id string, tag string, time string"

NESTED = [((26, "parent", "routing", "42"), "test.tag")]
NESTED_SCHEMA = (
    "nested struct<age:int, parent_id:string, routing_id:string, request_id:string>, tag string"
)


def test_meta_extraction_flat(spark):
    """_id/_parent/routing from configured keys (README.md:654-764)."""
    df = spark.createDataFrame(SAMPLE, SCHEMA)
    cfg = PipelineConfig(id_key="request_id", parent_key="parent_id", routing_key="routing_id")
    row = extract_meta(df, cfg).collect()[0]
    assert row["_id"] == "42" and row["_parent"] == "parent" and row["routing"] == "routing"


def test_meta_extraction_nested_paths(spark):
    """$.nested.* accessor paths (test_out_opensearch.rb:3095-3125)."""
    df = spark.createDataFrame(NESTED, NESTED_SCHEMA)
    cfg = PipelineConfig(
        id_key="$.nested.request_id",
        parent_key="$.nested.parent_id",
        routing_key="$.nested.routing_id",
    )
    row = extract_meta(df, cfg).collect()[0]
    assert row["_id"] == "42" and row["_parent"] == "parent" and row["routing"] == "routing"


def test_meta_missing_config_gives_nulls(spark):
    df = spark.createDataFrame(SAMPLE, SCHEMA)
    row = extract_meta(df, PipelineConfig()).collect()[0]
    assert row["_id"] is None and row["_parent"] is None and row["routing"] is None


def test_meta_missing_field_gives_null_and_flags(spark):
    """Configured key absent from the record → NULL meta; for create/
    update/upsert the row is flagged missing_id
    (out_opensearch.rb:895-903; test :3503-3603)."""
    df = spark.createDataFrame(SAMPLE, SCHEMA)
    cfg = PipelineConfig(id_key="absent_key", write_operation="create")
    out = missing_id_filter(extract_meta(df, cfg), cfg).collect()[0]
    assert out["_id"] is None and out["missing_id"] is True


def test_include_tag_and_remove_keys(spark):
    """P6 tag injection under tag_key; P8 remove_keys drops columns
    before indexing (out_opensearch.rb:1002-1004, 1037-1039)."""
    df = spark.createDataFrame(SAMPLE, SCHEMA)
    cfg = PipelineConfig(
        include_tag_key=True, tag_key="fluentd_tag", remove_keys=("parent_id", "time", "nope")
    )
    out = remove_keys(include_tag(df, cfg), cfg)
    assert "fluentd_tag" in out.columns
    assert out.collect()[0]["fluentd_tag"] == "test.tag"
    assert "parent_id" not in out.columns and "time" not in out.columns
    assert "age" in out.columns  # untouched


def test_include_tag_off_by_default(spark):
    df = spark.createDataFrame(SAMPLE, SCHEMA)
    out = include_tag(df, PipelineConfig())
    assert "fluentd_tag" not in out.columns and out.columns == df.columns
