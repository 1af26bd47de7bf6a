"""Scalar column-function library (SURVEY.md §2.8) — every scalar the
reference evaluates per record, re-expressed as reusable Catalyst
column builders. All JVM-side, codegen'd, zero UDFs.

| reference (file:line) | here |
|---|---|
| lowercase index (out_opensearch.rb:998-1001) | ``lower_index`` |
| strftime date suffix (out_opensearch.rb:992-993) | ``strftime_col`` |
| ISO8601 ns→µs (out_opensearch.rb:980-983) | ``iso8601_us`` |
| strptime parse (out_opensearch.rb:576-601) | ``operators.timestamps.parse_time_col`` |
| md5/sha1/sha2+Base64 (filter_opensearch_genid.rb:90-101) | ``operators.genid.hash_b64`` |
| uuid (filter_opensearch_genid.rb:73) | ``random_uuid`` |
| concat w/ separators (out_opensearch.rb:992) | native ``concat_ws`` |
| JSON generate/parse (oj_serializer.rb:32-46) | ``to_json_line`` / ``json_field`` |
| regex extract/replace (out_opensearch.rb:377-382 etc.) | ``operators.parse`` |
| gzip (out_opensearch.rb:1052-1058) | table codec config (S10), not an expression |
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..config import strftime_to_spark
from ..constants import ISO8601_US


def lower_index(col: Column) -> Column:
    """Index names are always lowercased (out_opensearch.rb:998-1001)."""
    return F.lower(col)


def strftime_col(ts: Column, strftime_fmt: str) -> Column:
    """strftime-dialect date formatting (logstash_dateformat etc.)."""
    return F.date_format(ts, strftime_to_spark(strftime_fmt))


def iso8601_us(ts: Column) -> Column:
    """ISO8601 at µs precision. The reference defaults to 9 digits
    (ns); Spark timestamps are µs — documented truncation
    (SURVEY.md §7 hard part 2)."""
    return F.date_format(ts, ISO8601_US)


def random_uuid() -> Column:
    return F.expr("uuid()")


def to_json_line(*cols: str) -> Column:
    """NDJSON-style serialization of selected columns (S9 analog) —
    only for byte-exact text sinks; columnar sinks skip this."""
    return F.to_json(F.struct(*cols))


def json_field(json_col: Column, path: str, dtype: str = "string") -> Column:
    """Typed extraction from a JSON-string column."""
    return F.get_json_object(json_col, path).cast(dtype)


def epoch_us(ts: Column) -> Column:
    """Integer-exact µs epoch (oracle-safe arithmetic base)."""
    return F.unix_micros(ts.cast("timestamp"))
