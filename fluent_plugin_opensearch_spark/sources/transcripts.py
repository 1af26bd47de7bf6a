"""The ``transcripts`` input table (BASELINE.json ``input_hint``).

Schema: ``(conv_id string, turn_idx int, role string, text string,
tool string, ts timestamp)`` — the multi-turn conversation / agent
transcript table the pipeline consumes. At production scale this is an
Iceberg table ``PARTITIONED BY (days(ts), bucket(16, conv_id))``; in
this sandbox it is derived deterministically from the driver-provided
``events`` parquet via ONE SQL string (`TRANSCRIPTS_SQL`) that runs
identically under Spark SQL and DuckDB, so every pipeline query has a
DuckDB oracle over byte-identical input (driver contract in
``__spark_entry__.py``).

Derivation properties (mirrors FIXTURES.md §1):
  * ``conv_id``   — one conversation per events.user_id.
  * ``turn_idx``  — 0-based contiguous per conv, ordered by event_id
                    (unique ⇒ deterministic row_number in both engines).
  * ``text``      — templated parseable line
                    ``[LEVEL] req=<digits> took=<n>ms <type> user=<id>``
                    with ~2% deliberately malformed (→ DLQ path) and
                    ~0.5% NULL (non-hash-record analog,
                    out_opensearch.rb:873).
  * ``tool``      — categorical with ~1% unknown values (enrichment
                    miss path) and NULLs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: Shared Spark-SQL/DuckDB derivation of transcripts from `events`.
#: Uses only the dialect intersection: concat, lpad, CASE, %, floor,
#: CAST AS STRING/INT/BIGINT, row_number() OVER.
TRANSCRIPTS_SQL = """
SELECT
  concat('conv', lpad(cast(user_id AS STRING), 8, '0')) AS conv_id,
  cast(row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1 AS INT)
    AS turn_idx,
  CASE event_type
    WHEN 'click' THEN 'user'
    WHEN 'view' THEN 'user'
    WHEN 'purchase' THEN 'assistant'
    WHEN 'signup' THEN 'system'
    ELSE 'tool'
  END AS role,
  CASE
    WHEN event_id % 211 = 0 THEN NULL
    WHEN event_id % 50 = 0 THEN concat('corrupted ', event_type, ' payload ##')
    ELSE concat(
      '[',
      CASE WHEN event_type = 'error' THEN 'ERROR'
           WHEN event_id % 7 = 0 THEN 'WARN'
           WHEN event_id % 3 = 0 THEN 'DEBUG'
           ELSE 'INFO' END,
      '] req=',
      lpad(cast((event_id * 1000003 + 12345) % 100000000000 AS STRING), 12, '0'),
      ' took=', cast(cast(floor(value * 100) AS BIGINT) AS STRING),
      'ms ', event_type, ' user=', cast(user_id AS STRING))
  END AS text,
  CASE
    WHEN event_id % 97 = 0 THEN 'frobnicator'
    WHEN event_type = 'error' THEN 'python'
    WHEN event_type IN ('click', 'view') THEN 'browser'
    WHEN event_type = 'purchase' THEN 'search'
    ELSE NULL
  END AS tool,
  ts
FROM events
"""

#: DuckDB oracle prefix: registers the same view over the same parquet.
#: Usage: ORACLE_PREFIX + "SELECT ... FROM transcripts ..."
ORACLE_PREFIX = f"WITH transcripts AS ({TRANSCRIPTS_SQL})\n"


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan the events parquet (S1 analog: the chunk scan collapses to
    a partitioned columnar scan, out_opensearch.rb:872-873)."""
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def load_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic transcripts DataFrame for a testdata sf dir."""
    load_events(spark, sf_dir).createOrReplaceTempView("events")
    return spark.sql(TRANSCRIPTS_SQL)


# ---------------------------------------------------------------------------
# Scale-path synthesizer: seeded transcripts at arbitrary row counts with
# explicit hot-conversation skew, built from spark.range (no data files, no
# Python row loop — pure Catalyst expressions, so it generates at cluster
# speed). Used by bench.py and the salting/skew tests.
# ---------------------------------------------------------------------------

def synthesize_transcripts(
    spark: SparkSession,
    n_rows: int,
    n_convs: int = 10_000,
    hot_conv_frac: float = 0.01,
    hot_weight: int = 100,
    partitions: int | None = None,
) -> DataFrame:
    """Seeded synthetic transcripts with skew.

    ``hot_conv_frac`` of conversations receive ``hot_weight``× the turn
    volume (FIXTURES.md §1: ~1% hot ids at 1000×; default kept milder so
    sandbox partitions stay balanced enough to measure). Deterministic:
    every column is a pure function of the row id.
    """
    n_hot = max(1, int(n_convs * hot_conv_frac))
    # weighted conv assignment: first `hot_share` of the id space maps to
    # hot convs, remainder uniformly to the cold tail.
    hot_share_num = n_hot * hot_weight
    total_weight = hot_share_num + (n_convs - n_hot)
    df = spark.range(0, n_rows, 1, partitions or spark.sparkContext.defaultParallelism)
    df.createOrReplaceTempView("_synth_ids")
    return spark.sql(f"""
SELECT
  concat('conv', lpad(cast(conv_no AS STRING), 8, '0')) AS conv_id,
  cast(turn_no AS INT) AS turn_idx,
  CASE cast(id % 4 AS INT)
    WHEN 0 THEN 'user' WHEN 1 THEN 'assistant'
    WHEN 2 THEN 'system' ELSE 'tool' END AS role,
  CASE
    WHEN id % 211 = 0 THEN NULL
    WHEN id % 50 = 0 THEN concat('corrupted payload ##', cast(id AS STRING))
    ELSE concat(
      '[', CASE WHEN id % 11 = 0 THEN 'ERROR'
                WHEN id % 7 = 0 THEN 'WARN'
                WHEN id % 3 = 0 THEN 'DEBUG' ELSE 'INFO' END,
      '] req=', lpad(cast((id * 1000003 + 12345) % 100000000000 AS STRING), 12, '0'),
      ' took=', cast((id * 37) % 5000 AS STRING),
      'ms synthetic user=', cast(conv_no AS STRING))
  END AS text,
  CASE
    WHEN id % 97 = 0 THEN 'frobnicator'
    WHEN id % 5 = 0 THEN 'python'
    WHEN id % 5 = 1 THEN 'browser'
    WHEN id % 5 = 2 THEN 'search'
    ELSE NULL END AS tool,
  timestamp_micros(cast(1704067200000000 + (id * 2654435) % 2592000000000 AS BIGINT)) AS ts
FROM (
  SELECT id,
    CASE WHEN weight_slot < {hot_share_num}
         THEN cast(weight_slot % {n_hot} AS BIGINT)
         ELSE {n_hot} + (weight_slot - {hot_share_num}) % {n_convs - n_hot}
    END AS conv_no,
    cast(id DIV {total_weight} AS BIGINT) AS turn_no
  FROM (SELECT id, id % {total_weight} AS weight_slot FROM _synth_ids)
)
""")
