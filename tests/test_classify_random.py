"""Randomized classifier parity: 500 seeded random bulk items vs an
independent Python reimplementation of the Ruby handler's control flow
(opensearch_error_handler.rb:105-171). Catches clause-ordering drift
the fixed corpus can't."""

from __future__ import annotations

import random

from fluent_plugin_opensearch_spark import PipelineConfig
from fluent_plugin_opensearch_spark.constants import (
    UNRECOVERABLE_ERROR_TYPES,
    UNRECOVERABLE_RECORD_TYPES,
)
from fluent_plugin_opensearch_spark.operators.classify import classify

OPS = ["index", "create", "update", None]
STATUSES = [200, 201, 400, 403, 409, 429, 500, 503, None]
TYPES = [
    None,
    "mapper_parsing_exception",
    "version_conflict_engine_exception",
    "json_parse_exception",
    "out_of_memory_error",
    "rejected_execution_exception",
    "es_rejected_execution_exception",
    "some unrecognized type",
]


def ruby_reference(op, status, error_type, error_is_string):
    """Line-for-line port of the handler's case ladder (the Ruby
    semantics, written independently of operators/classify.py)."""
    if op is None or status is None:
        return "dlq"  # errors_nil_resp / errors_bad_resp (:105-121)
    if status in (200, 201):
        return "success"  # :123-124
    if op == "create" and status == 409:
        return "duplicate"  # :125-126
    if status == 400:
        return "dlq"  # bad_argument :127-140
    if error_is_string:
        return "dlq"  # errors_block_resp :142-148
    if error_type in UNRECOVERABLE_ERROR_TYPES:
        return "abort"  # :152-154
    if error_type in UNRECOVERABLE_RECORD_TYPES:
        return "dlq"  # :155-159
    if error_type is not None:
        return "retry"  # :161
    return "dlq"  # errors_bad_resp :163-171


def test_random_corpus_parity(spark):
    rng = random.Random(1234)
    rows = [
        (
            i,
            rng.choice(OPS),
            rng.choice(STATUSES),
            rng.choice(TYPES),
            rng.random() < 0.05,
        )
        for i in range(500)
    ]
    df = spark.createDataFrame(
        rows, "_id int, op string, status int, error_type string, error_is_string boolean"
    )
    got = {r["_id"]: r["outcome"] for r in classify(df, PipelineConfig()).collect()}
    for _id, op, status, etype, estr in rows:
        assert got[_id] == ruby_reference(op, status, etype, estr), (
            _id,
            op,
            status,
            etype,
            estr,
        )
