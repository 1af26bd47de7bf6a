"""Timestamp injection and parsing (SURVEY.md §2.2 P3/P4/P5).

Reference semantics:
  * P3 — ``@timestamp`` injection precedence (out_opensearch.rb:972-985):
    record's own ``@timestamp`` → parsed ``time_key`` field → formatted
    event time. Implemented as one ``coalesce`` column expression.
  * P4 — strptime fast path with generic ISO fallback
    (out_opensearch.rb:576-601) → ``to_timestamp(col, fmt)`` with a
    ``coalesce`` onto format-free ``to_timestamp``; numeric epoch values
    (out_opensearch.rb:603-606) → ``timestamp_seconds``.
  * P5 — parse failure routes an error event under
    ``time_parse_error_tag`` and falls back to event time
    (out_opensearch.rb:608-615): here a boolean ``time_parse_error``
    column drives DLQ fan-out while the row still flows with the
    fallback timestamp (same observable behavior: record is indexed
    with event time AND an error event is emitted).

All pure Catalyst expressions — no UDFs, fully codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import PipelineConfig, strftime_to_spark
from ..constants import ISO8601_US, TIMESTAMP_KEY


def parse_time_col(col: Column, time_key_format: str | None) -> Column:
    """P4: vectorized strptime with generic fallback.

    ``try_to_timestamp`` keeps ANSI mode from aborting the job on a bad
    row (the reference rescues per record, out_opensearch.rb:608-615);
    numeric strings are treated as epoch seconds
    (convert_numeric_time_into_string, out_opensearch.rb:603-606).
    """
    numeric = col.rlike(r"^\d+(\.\d+)?$")
    as_epoch = F.timestamp_seconds(col.cast("double"))
    attempts = []
    if time_key_format:
        attempts.append(F.try_to_timestamp(col, F.lit(strftime_to_spark(time_key_format))))
    attempts.append(F.try_to_timestamp(col))
    return F.when(numeric, as_epoch).otherwise(F.coalesce(*attempts))


def inject_timestamp(df: DataFrame, cfg: PipelineConfig, event_time_col: str = "ts") -> DataFrame:
    """P3+P5: add ``@timestamp`` (ISO8601, µs) and ``time_parse_error``.

    Precedence per out_opensearch.rb:972-985; the reference formats at
    ``time_precision`` digits (default ns) — Spark is µs, so precision
    is capped at 6 (documented divergence, SURVEY.md §7 hard part 2).
    """
    event_ts = F.col(event_time_col)
    existing = F.col(TIMESTAMP_KEY) if TIMESTAMP_KEY in df.columns else F.lit(None).cast("string")

    if cfg.time_key and cfg.time_key in df.columns:
        parsed = parse_time_col(F.col(cfg.time_key), cfg.time_key_format)
        parse_error = F.col(cfg.time_key).isNotNull() & parsed.isNull()
        best_ts = F.coalesce(parsed, event_ts)
    else:
        parse_error = F.lit(False)
        best_ts = event_ts

    # time_precision: reference emits `time_precision` sub-second
    # digits (default 9 = ns, out_opensearch.rb:107,980-983); Spark
    # timestamps are µs, so precision caps at 6 — extra digits would
    # be fabricated zeros, not data.
    precision = min(cfg.time_precision, 6)
    fmt = ISO8601_US.replace("SSSSSS", "S" * precision) if precision > 0 else ISO8601_US.replace(".SSSSSS", "")
    iso = F.date_format(best_ts, fmt)
    return (
        df.withColumn(TIMESTAMP_KEY, F.coalesce(existing, iso))
        .withColumn("_event_ts", best_ts)
        .withColumn("time_parse_error", parse_error)
    )
