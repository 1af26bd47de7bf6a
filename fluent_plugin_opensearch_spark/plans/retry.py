"""Outcome-driven fan-out + bounded-retry driver (SURVEY.md §2.11 and
Phase 3): the Spark re-expression of send_bulk's response handling
(out_opensearch.rb:1097-1141) and the retry-stream loop (R8).

In the reference, a bulk response classifies each record; retryable
records re-enter the pipeline under ``retry_tag`` with fluentd's
exponential backoff (2^k, opensearch_index_template.rb:74-80). Here:

  * ``fanout_by_outcome`` — one classified batch → sink/DLQ/retry
    tables (+ abort semantics: ANY abort-class item fails the whole
    batch BEFORE anything is written, like RequestAbortError dropping
    the chunk).
  * ``run_with_retries`` — the driver loop: attempt → classify via an
    injected ``respond`` function (the sink system's bulk response;
    tests use deterministic synthetic responses, production wires the
    real writer) → retry stream becomes the next attempt, with 2^k
    backoff, until empty or ``max_retries``; exhausted records land in
    DLQ with reason ``retry_exhausted``.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import PipelineConfig
from ..constants import (
    INDEX_KEY,
    OUTCOME_ABORT,
    OUTCOME_DLQ,
    OUTCOME_RETRY,
    OUTCOME_SUCCESS,
)
from ..sinks.writer import SinkCatalog, append_to_sink


class BatchAbortError(RuntimeError):
    """RequestAbortError analog (opensearch_error_handler.rb:152-154):
    an unrecoverable-error-type item aborts the whole remaining chunk;
    the checkpoint must not advance."""


def fanout_by_outcome(
    classified: DataFrame, catalog: SinkCatalog, cfg: PipelineConfig
) -> dict[str, int]:
    """Split a classified batch into sink/DLQ/retry tables. Returns
    per-outcome counts (A2). Rows must carry ``outcome`` and
    ``_index``."""
    classified = classified.persist()
    try:
        if classified.filter(F.col("outcome") == OUTCOME_ABORT).limit(1).count() > 0:
            raise BatchAbortError("unrecoverable error type in batch")

        counts = {
            r["outcome"]: r["n"]
            for r in classified.groupBy("outcome").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        append_to_sink(classified.filter(F.col("outcome") == OUTCOME_SUCCESS), catalog, "sink", cfg.sink_partitions)
        dlq = classified.filter(F.col("outcome") == OUTCOME_DLQ)
        append_to_sink(dlq.withColumn(INDEX_KEY, F.lit("dlq")), catalog, "dlq")
        retry = classified.filter(F.col("outcome") == OUTCOME_RETRY)
        # re-emit under retry_tag, else keep the original tag
        # (out_opensearch.rb:1118-1127; test :3391-3424)
        if cfg.retry_tag:
            tag_col = F.lit(cfg.retry_tag)
        elif "tag" in retry.columns:
            tag_col = F.col("tag")
        else:
            tag_col = F.lit("retry")
        retry_tagged = retry.withColumn("tag", tag_col)
        append_to_sink(retry_tagged.withColumn(INDEX_KEY, F.lit("retry")), catalog, "retry")
        return {k: counts.get(k, 0) for k in (OUTCOME_SUCCESS, "duplicate", OUTCOME_DLQ, OUTCOME_RETRY)}
    finally:
        classified.unpersist()


def run_with_retries(
    spark: SparkSession,
    batch: DataFrame,
    cfg: PipelineConfig,
    catalog: SinkCatalog,
    respond: Callable[[DataFrame, int], DataFrame],
    backoff_base_s: float = 0.0,
) -> dict:
    """Bounded-retry loop. ``respond(batch, attempt)`` plays the sink's
    bulk response: it returns the batch with an ``outcome`` column.
    ``backoff_base_s=0`` in tests; production uses 1.0 → 2^k seconds
    capped by ``cfg.max_retries`` (template-retry semantics,
    opensearch_index_template.rb:65-87)."""
    totals = {"success": 0, "duplicate": 0, "dlq": 0, "retry_exhausted": 0, "attempts": 0}
    current = batch
    for attempt in range(cfg.max_retries + 1):
        if current.limit(1).count() == 0:
            break
        totals["attempts"] = attempt + 1
        # materialize the classification itself (localCheckpoint is
        # eager and replicated): a nondeterministic respond (real bulk
        # responses) must never be lazily re-executed — not by the
        # next attempt, and not by a lost cached block during the
        # fanout writes — or the routed/retried row sets could diverge
        # (ADVICE r1). Everything downstream derives from the frozen
        # frame.
        classified = respond(current, attempt).localCheckpoint()
        current = classified.filter(F.col("outcome") == OUTCOME_RETRY).drop("outcome")
        stats = fanout_by_outcome(classified, catalog, cfg)
        totals["success"] += stats.get("success", 0)
        totals["duplicate"] += stats.get("duplicate", 0)
        totals["dlq"] += stats.get("dlq", 0)
        if backoff_base_s and stats.get("retry", 0):
            time.sleep(min(backoff_base_s * (2**attempt), 60.0))
    else:
        # retries exhausted: remaining rows → DLQ with explicit reason
        leftover = current.withColumn("outcome", F.lit(OUTCOME_DLQ)).withColumn(
            "dlq_reason", F.lit("retry_exhausted")
        )
        n = leftover.count()
        if n:
            append_to_sink(leftover.withColumn(INDEX_KEY, F.lit("dlq")), catalog, "dlq")
        totals["retry_exhausted"] = n
    return totals
