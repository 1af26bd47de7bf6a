"""Bulk-response error taxonomy (SURVEY.md §2.11) — the per-item
classifier of ``opensearch_error_handler.rb:72-181`` as a single
``when``-ladder producing an ``outcome`` column ∈
{success, duplicate, dlq, retry, abort}. The outcome drives fan-out
writes (sink / DLQ table / retry table) and the A2 stats aggregate.

Golden parity corpus: test_opensearch_error_handler.rb:414-539 (index
op: retry ids {2,8}, DLQ ids {5,6,7,9}) and :650-769 (upsert 409 →
retry) — replayed in tests/test_classify.py and registered as a
correctness query.

Input item schema (FIXTURES.md §4):
  ``(_id, op string, status int, error_type string, error_reason string)``
where ``op`` is the op key present in the response item and NULL/absent
status/op model the reference's nil/bad-response branches.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import PipelineConfig
from ..constants import (
    OP_CREATE,
    OUTCOME_ABORT,
    OUTCOME_DLQ,
    OUTCOME_DUPLICATE,
    OUTCOME_RETRY,
    OUTCOME_SUCCESS,
)


def outcome_col(
    cfg: PipelineConfig,
    op: Column | None = None,
    status: Column | None = None,
    error_type: Column | None = None,
    error_is_string: Column | None = None,
) -> Column:
    """The classification ladder, clause-for-clause against
    opensearch_error_handler.rb:105-171 (order preserved — order is
    semantics here, e.g. create+409 must win over the generic 4xx/5xx
    branches).
    """
    op = op if op is not None else F.col("op")
    status = status if status is not None else F.col("status")
    error_type = error_type if error_type is not None else F.col("error_type")
    error_is_string = (
        error_is_string if error_is_string is not None else F.lit(False)
    )

    return (
        # nil item / missing op key / missing status → errors_bad_resp,
        # record skipped (:105-121) → DLQ stream in our model (a skipped
        # record is lost in the reference; we keep it visible)
        F.when(op.isNull() | status.isNull(), F.lit(OUTCOME_DLQ))
        # 200/201 → success (:123-124)
        .when(status.isin(200, 201), F.lit(OUTCOME_SUCCESS))
        # create + 409 → duplicate, silently dropped: dedup worked (:125-126)
        .when((op == OP_CREATE) & (status == 409), F.lit(OUTCOME_DUPLICATE))
        # 400 → bad_argument; error-emitted, never retried (:127-140)
        .when(status == 400, F.lit(OUTCOME_DLQ))
        # bare-string error (cluster block) → errors_block_resp; DLQ (:142-148)
        .when(error_is_string, F.lit(OUTCOME_DLQ))
        # unrecoverable error types abort the whole remaining chunk (:152-154)
        .when(error_type.isin(*cfg.unrecoverable_error_types), F.lit(OUTCOME_ABORT))
        # unrecoverable record types → DLQ, not retried (:155-159)
        .when(error_type.isin(*cfg.unrecoverable_record_types), F.lit(OUTCOME_DLQ))
        # any other typed error (5xx, 429, upsert-409, ...) → retry (:161)
        .when(error_type.isNotNull(), F.lit(OUTCOME_RETRY))
        # typed-error key absent entirely → errors_bad_resp → DLQ (:163-171)
        .otherwise(F.lit(OUTCOME_DLQ))
    )


def classify(df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Attach ``outcome`` to a bulk-items DataFrame."""
    cols = {c: F.col(c) for c in df.columns}
    return df.withColumn(
        "outcome",
        outcome_col(
            cfg,
            op=cols.get("op"),
            status=cols.get("status"),
            error_type=cols.get("error_type"),
            error_is_string=cols.get("error_is_string", F.lit(False)),
        ),
    )


def outcome_stats(df: DataFrame) -> DataFrame:
    """A2: error-handler stats (stats[...] += 1,
    opensearch_error_handler.rb:81,123-172) as one aggregation."""
    return df.groupBy("outcome").agg(F.count(F.lit(1)).alias("n"))


def failed_count(df: DataFrame, status_col: str = "status") -> DataFrame:
    """A3: data-stream failure counting — only items with status ≥ 300
    (out_opensearch_data_stream.rb:215;
    test_out_opensearch_data_stream.rb:746-803)."""
    return df.agg(
        F.sum(F.when(F.col(status_col) >= 300, 1).otherwise(0)).alias("failed"),
        F.count(F.lit(1)).alias("total"),
    )


def batch_should_abort(df: DataFrame) -> bool:
    """Chunk-abort check: any OUTCOME_ABORT item aborts the whole batch
    write (RequestAbortError, opensearch_error_handler.rb:152-154 —
    'whole remaining chunk dropped'; in Spark the batch write raises and
    the checkpoint does not advance, SURVEY.md §2.11)."""
    return df.filter(F.col("outcome") == OUTCOME_ABORT).limit(1).count() > 0
