"""Data-stream sink variant (SURVEY.md §2.1 S7, §3.2) — the append-only
mode of ``out_opensearch_data_stream.rb``: ops forced to ``create``, no
meta map, no retry stream; failures are counted and DLQ'd only.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..constants import INDEX_KEY, ISO8601_US, TIMESTAMP_KEY
from .writer import SinkCatalog, append_to_sink

#: validation per validate_data_stream_parameters
#: (out_opensearch_data_stream.rb:46-68,121-143): lowercase only, no
#: invalid chars, ≤255 bytes, no leading -_+.
_INVALID_CHARS = re.compile(r'[\\/*?"<>|,#: ]')


def validate_data_stream_name(name: str) -> None:
    """R9: driver-side name validation at configure time (plain code,
    mirrors the reference's configure-phase checks)."""
    if name != name.lower():
        raise ValueError(f"data stream name must be lowercase: {name!r}")
    if _INVALID_CHARS.search(name):
        raise ValueError(f"invalid characters in data stream name: {name!r}")
    if len(name.encode()) > 255:
        raise ValueError("data stream name must be ≤255 bytes")
    if name[:1] in ("-", "_", "+", "."):
        raise ValueError(f"data stream name must not start with -_+. : {name!r}")


def write_data_stream(
    df: DataFrame,
    catalog: SinkCatalog,
    stream_name: str,
    ts_col: str = "ts",
) -> dict:
    """S7: per-batch @timestamp injection + create-only append
    (out_opensearch_data_stream.rb:153-231). Returns {written} —
    failure counting (A3) happens on the bulk-response side
    (operators.classify.failed_count)."""
    validate_data_stream_name(stream_name)
    out = df
    if TIMESTAMP_KEY not in df.columns:
        out = out.withColumn(TIMESTAMP_KEY, F.date_format(F.col(ts_col), ISO8601_US))
    out = out.withColumn(INDEX_KEY, F.lit(stream_name))
    # count DURING the write (Observation) — a post-write .count()
    # would re-execute the whole upstream plan
    from pyspark.sql import Observation

    obs = Observation("ds_write")
    observed = out.observe(obs, F.count(F.lit(1)).alias("n"))
    append_to_sink(observed, catalog, "sink")
    return {"written": obs.get["n"]}
