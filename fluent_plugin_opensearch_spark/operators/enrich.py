"""Broadcast-join lookup enrichment + skew handling (SURVEY.md §2.6 J3,
§4 item 1; north_star "broadcast-join lookup enrichment (role/tool
dictionaries mirroring record_transformer + template mappings)").

The dictionaries are small (4–10 rows, FIXTURES.md §2) → always
broadcast: the join is map-side, zero shuffle, and survives 100× input
scale unchanged. Misses stay as NULLs, never drops (left join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: role_dict(role, role_class, priority) — FIXTURES.md §2
ROLE_DICT_ROWS = [
    ("user", "human", 1),
    ("assistant", "model", 2),
    ("system", "control", 3),
    ("tool", "machine", 4),
]

#: tool_dict(tool, tool_family, is_sandboxed) — FIXTURES.md §2
TOOL_DICT_ROWS = [
    ("search", "retrieval", True),
    ("browser", "retrieval", False),
    ("python", "code", True),
    ("bash", "code", True),
    ("none", "none", True),
]

#: the same dictionaries as SQL literals for DuckDB oracles
ROLE_DICT_SQL = (
    "(VALUES ('user','human',1),('assistant','model',2),"
    "('system','control',3),('tool','machine',4)) AS role_dict(role, role_class, priority)"
)
TOOL_DICT_SQL = (
    "(VALUES ('search','retrieval',true),('browser','retrieval',false),"
    "('python','code',true),('bash','code',true),('none','none',true)) "
    "AS tool_dict(tool, tool_family, is_sandboxed)"
)


def role_dict(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(ROLE_DICT_ROWS, "role string, role_class string, priority int")


def tool_dict(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        TOOL_DICT_ROWS, "tool string, tool_family string, is_sandboxed boolean"
    )


def enrich(df: DataFrame, spark: SparkSession) -> DataFrame:
    """J3: left broadcast joins against both dictionaries. Misses
    survive as NULLs (FIXTURES.md §2 — e.g. tool='frobnicator')."""
    return df.join(F.broadcast(role_dict(spark)), on="role", how="left").join(
        F.broadcast(tool_dict(spark)), on="tool", how="left"
    )


def salt(df: DataFrame, n_buckets: int, cols: tuple[str, ...] = ("conv_id", "turn_idx")) -> DataFrame:
    """Skew salting for hot conversations (SURVEY.md §4 item 1;
    north_rule "bucketed on conv_id with salting for hot
    conversations"). Adds ``_salt = pmod(xxhash64(cols), n)`` so a
    repartition/groupBy on (conv_id, _salt) splits a hot conv across n
    reducers. AQE skew-join stays enabled as the backstop."""
    return df.withColumn("_salt", F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_buckets)))


def repartition_salted(
    df: DataFrame, n_buckets: int, key: str = "conv_id", num_partitions: int | None = None
) -> DataFrame:
    """Repartition by (key, _salt): co-locates most of a conversation
    while bounding any one partition's share of a hot key. An explicit
    partition count keeps AQE from coalescing the salted shuffle back
    into few partitions (which would undo the salting)."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    return salt(df, n_buckets).repartition(n, F.col(key), F.col("_salt"))
