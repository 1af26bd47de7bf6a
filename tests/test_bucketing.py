"""Bucketed-table co-location (input_hint: transcripts bucketed on
conv_id). Two tables bucketed on the same key join WITHOUT a shuffle —
the Spark analog of the Iceberg bucket(16, conv_id) spec, and the
reason conv-keyed enrichment/merge stays shuffle-free at 10^12 turns."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fluent_plugin_opensearch_spark import load_transcripts

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # saveAsTable writes under the session's static warehouse dir
    # (./spark-warehouse, gitignored); tables dropped at teardown
    t = load_transcripts(spark, SF_SMOKE)
    (
        t.write.mode("overwrite")
        .bucketBy(8, "conv_id")
        .sortBy("conv_id", "turn_idx")
        .saveAsTable("transcripts_b")
    )
    conv_dim = t.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n_turns"))
    conv_dim.write.mode("overwrite").bucketBy(8, "conv_id").saveAsTable("conv_dim_b")
    yield "transcripts_b", "conv_dim_b"
    spark.sql("DROP TABLE IF EXISTS transcripts_b")
    spark.sql("DROP TABLE IF EXISTS conv_dim_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    ta, tb = bucketed_tables
    a = spark.table(ta)
    b = spark.table(tb)
    # force the shuffle-join path (not broadcast) so bucketing is what
    # saves the exchange
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = a.join(b, "conv_id").groupBy("conv_id").agg(F.sum("n_turns").alias("s"))
        plan = spark._jvm.PythonSQLUtils.explainString(j._jdf.queryExecution(), "formatted")
        import re

        # bucket layout satisfies the join's distribution requirement:
        # zero shuffle exchanges before the join
        join_part = plan.split("HashAggregate")[0]
        assert len(re.findall(r"(?<!Broadcast)Exchange", join_part)) == 0, plan
        assert j.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_groupby_avoids_shuffle(spark, bucketed_tables):
    """Aggregation keyed on the bucket column needs no exchange."""
    ta, _ = bucketed_tables
    agg = spark.table(ta).groupBy("conv_id").agg(F.count(F.lit(1)).alias("n"))
    plan = spark._jvm.PythonSQLUtils.explainString(agg._jdf.queryExecution(), "formatted")
    import re

    assert len(re.findall(r"(?<!Broadcast)Exchange \(", plan)) == 0, plan
