"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship pipeline on sf0.001 (read → parse → enrich
→ route → per-sink counts). ``queries()``/``oracle_sql()`` — one entry
per implemented operator (SURVEY.md §2), DuckDB-checked at sf0.01.
Implementation lives in ``fluent_plugin_opensearch_spark``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fluent_plugin_opensearch_spark.plans.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the full record
    pipeline (parse → enrich → route) reduced to per-sink routed-row
    counts (A1 — the reference's correctness metric)."""
    return QUERIES["route_logstash_counts"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
