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

    Precedence per out_opensearch.rb:972-985 — the record's own
    ``@timestamp`` field is parsed FIRST and drives the routing day
    (``_event_ts``), then ``time_key``, then event time; a parse failure
    on either falls back to event time and raises the error flag
    (parse_time rescue, out_opensearch.rb:608-615). The emitted record
    keeps an existing ``@timestamp`` string verbatim; a ``time_key``
    derived timestamp is written unless ``time_key_exclude_timestamp``
    (out_opensearch.rb:980). Injection only happens when
    ``logstash_format`` or ``include_timestamp`` (out_opensearch.rb:973)
    — ``_event_ts``/``time_parse_error`` are always computed (routing
    and DLQ fan-out need them regardless), but the record's own
    ``@timestamp`` field participates ONLY when injection is on (it is
    read inside that same branch in the reference; with both flags off
    it is an ordinary field and never a parse-error source).

    The reference formats at ``time_precision`` digits (default ns) —
    Spark is µs, so precision is capped at 6 (documented divergence,
    SURVEY.md §7 hard part 2).

    A NULL value in the ``@timestamp``/``time_key`` column is the
    columnar analog of "key absent" and falls through to the next
    precedence level without an error (round-1 semantics; the reference
    branches on has_key?, which a columnar schema cannot distinguish).
    """
    event_ts = F.col(event_time_col)
    inject_on = cfg.logstash_format or cfg.include_timestamp
    # the record's own @timestamp is only INSPECTED inside the
    # injection branch (out_opensearch.rb:973-976) — with both flags
    # off it is an ordinary record field: never parsed, never a
    # time_parse_error source (ADVICE r2: unconditional parsing here
    # DLQ'd records the reference delivers untouched)
    has_ts_field = inject_on and TIMESTAMP_KEY in df.columns
    tk = F.col(cfg.time_key) if cfg.time_key and cfg.time_key in df.columns else None

    best_ts = event_ts
    parse_error = F.lit(False)
    parsed_tk = None
    if tk is not None:
        parsed_tk = parse_time_col(tk, cfg.time_key_format)
        best_ts = F.when(tk.isNotNull(), F.coalesce(parsed_tk, event_ts)).otherwise(best_ts)
        parse_error = F.when(tk.isNotNull(), parsed_tk.isNull()).otherwise(parse_error)
    if has_ts_field:
        existing = F.col(TIMESTAMP_KEY)
        parsed_existing = parse_time_col(existing, cfg.time_key_format)
        best_ts = F.when(existing.isNotNull(), F.coalesce(parsed_existing, event_ts)).otherwise(best_ts)
        parse_error = F.when(existing.isNotNull(), parsed_existing.isNull()).otherwise(parse_error)

    # time_precision: reference emits `time_precision` sub-second
    # digits (default 9 = ns, out_opensearch.rb:107,980-983); Spark
    # timestamps are µs, so precision caps at 6 — extra digits would
    # be fabricated zeros, not data.
    precision = min(cfg.time_precision, 6)
    fmt = ISO8601_US.replace("SSSSSS", "S" * precision) if precision > 0 else ISO8601_US.replace(".SSSSSS", "")
    iso = F.date_format(best_ts, fmt)

    # _event_ts / time_parse_error FIRST: their expressions reference
    # the record's ORIGINAL @timestamp column — adding the emitted
    # @timestamp before them would silently rebind F.col("@timestamp")
    # to the freshly-injected value (caught by
    # test_timestamp_precedence_random: a garbage time_key's error
    # flag vanished because the emitted fallback re-parsed cleanly)
    out = df.withColumn("_event_ts", best_ts).withColumn("time_parse_error", parse_error)
    if cfg.logstash_format or cfg.include_timestamp:
        emitted = iso
        if tk is not None and cfg.time_key_exclude_timestamp:
            # time_key-sourced rows keep @timestamp unset (:980)
            emitted = F.when(tk.isNotNull(), F.lit(None).cast("string")).otherwise(iso)
        if has_ts_field:
            emitted = F.coalesce(F.col(TIMESTAMP_KEY), emitted)
        out = out.withColumn(TIMESTAMP_KEY, emitted)
    return out
