"""Error-taxonomy golden corpus — replay of
test_opensearch_error_handler.rb:414-539 (index op) and :650-769
(upsert op): exact retry/DLQ id partitioning must match the Ruby
classifier (FIXTURES.md §4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fluent_plugin_opensearch_spark import PipelineConfig
from fluent_plugin_opensearch_spark.operators.classify import (
    batch_should_abort,
    classify,
    failed_count,
    outcome_stats,
)

SCHEMA = "_id int, op string, status int, error_type string, error_is_string boolean"

# test_opensearch_error_handler.rb:414-539 (write_operation=index).
# The response op key mirrors the request op (index) except where the
# server echoes create; outcome expectations from the Ruby assertions:
# retried ids [2, 8]; error-emitted (DLQ) ids [5, 6, 7, 9]; 201 success;
# 409-on-create duplicate.
INDEX_CORPUS = [
    (1, "index", 201, None, False),
    (2, "index", 500, "some unrecognized type", False),
    (3, "create", 409, None, False),
    (5, "index", 500, None, False),  # no error type → errors_bad_resp
    (6, "index", 400, "mapper_parsing_exception", False),
    (7, "index", 400, "some unrecognized type", False),
    (8, "index", 500, "some unrecognized type", False),
    (9, "index", 500, "json_parse_exception", False),
]

EXPECTED_INDEX = {
    1: "success",
    2: "retry",
    3: "duplicate",
    5: "dlq",
    6: "dlq",
    7: "dlq",
    8: "retry",
    9: "dlq",
}


def test_index_corpus(spark):
    df = spark.createDataFrame(INDEX_CORPUS, SCHEMA)
    got = {r["_id"]: r["outcome"] for r in classify(df, PipelineConfig()).collect()}
    assert got == EXPECTED_INDEX


def test_upsert_409_retries(spark):
    """test_opensearch_error_handler.rb:650-769: version_conflict on
    update/upsert goes to the retry stream (expected retry ids include
    the 409 row), unlike create-409 which is a silent duplicate."""
    rows = [
        (2, "update", 500, "some unrecognized type", False),
        (3, "update", 409, "version_conflict_engine_exception", False),
        (8, "update", 500, "some unrecognized type", False),
        (5, "update", 500, None, False),
        (6, "update", 400, "mapper_parsing_exception", False),
        (7, "update", 400, "some unrecognized type", False),
    ]
    cfg = PipelineConfig(write_operation="upsert")
    got = {r["_id"]: r["outcome"] for r in classify(spark.createDataFrame(rows, SCHEMA), cfg).collect()}
    assert {k for k, v in got.items() if v == "retry"} == {2, 3, 8}
    assert {k for k, v in got.items() if v == "dlq"} == {5, 6, 7}


@pytest.mark.parametrize("bad_type", ["out_of_memory_error", "rejected_execution_exception"])
def test_unrecoverable_aborts_batch(spark, bad_type):
    """test_opensearch_error_handler.rb:320-372,541-648: unrecoverable
    error types raise RequestAbortError → whole batch aborts."""
    rows = [(1, "index", 201, None, False), (2, "index", 500, bad_type, False)]
    out = classify(spark.createDataFrame(rows, SCHEMA), PipelineConfig())
    assert batch_should_abort(out)


def test_cluster_block_string_error_is_dlq(spark):
    """Bare-string error (e.g. cluster block) → errors_block_resp →
    DLQ, never retried (opensearch_error_handler.rb:142-148)."""
    rows = [(1, "index", 503, None, True)]
    out = classify(spark.createDataFrame(rows, SCHEMA), PipelineConfig())
    assert out.collect()[0]["outcome"] == "dlq"


def test_missing_op_or_status_is_bad_resp(spark):
    rows = [(1, None, 200, None, False), (2, "index", None, None, False)]
    out = classify(spark.createDataFrame(rows, SCHEMA), PipelineConfig())
    assert [r["outcome"] for r in out.collect()] == ["dlq", "dlq"]


def test_outcome_stats_and_failed_count(spark):
    df = classify(spark.createDataFrame(INDEX_CORPUS, SCHEMA), PipelineConfig())
    stats = {r["outcome"]: r["n"] for r in outcome_stats(df).collect()}
    assert stats == {"success": 1, "retry": 2, "duplicate": 1, "dlq": 4}
    # A3: data-stream counting — status >= 300 only
    fc = failed_count(df).collect()[0]
    assert fc["failed"] == 7 and fc["total"] == 8
