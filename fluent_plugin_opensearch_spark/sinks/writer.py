"""Per-sink fan-out writes + write-operation semantics (SURVEY.md §2.1
S6-S8, §2.3 R6-R7, §2.4 W1-W3).

The reference groups NDJSON lines per (host, index) and POSTs a bulk
request per group (out_opensearch.rb:856-915,1097-1141). Spark-first
shape: ONE write with ``partitionBy("_index")`` — the shuffle on the
routing key is the grouping, every sink directory is a "bulk batch",
and file sizing replaces byte-threshold request splitting (R7 →
``write.target-file-size-bytes`` / AQE coalescing).

On a production cluster the sink is an Iceberg table per index family
(``CREATE TABLE ... USING iceberg PARTITIONED BY (days(ts))``) and the
write ops map to MERGE INTO (W1). This sandbox has no Iceberg runtime
jar, so the catalog is parquet-directory-backed and the merge variants
are expressed as equivalent DataFrame joins — the semantics (and
tests) carry over to MERGE unchanged:

  index  → replace-by-_id  : existing anti-join batch, then union
  create → insert-if-absent: batch anti-join existing (dups dropped, W2)
  update → only matching   : batch semi-join existing, replace those
  upsert → full merge      : replace matching + insert rest
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import PipelineConfig
from ..constants import ID_KEY, INDEX_KEY, OP_CREATE, OP_INDEX, OP_UPDATE, OP_UPSERT


@dataclass
class SinkCatalog:
    """Directory-backed stand-in for an Iceberg catalog.

    Layout: ``<base>/<table>/`` parquet, data tables partitioned by
    ``_index`` (partition value = dynamic index name, SURVEY.md §1.2).
    """

    base_dir: str

    def path(self, table: str) -> str:
        return os.path.join(self.base_dir, table)

    def ensure(self, table: str) -> str:
        """S8: idempotent DDL before first write (template_install,
        opensearch_index_template.rb:107-122)."""
        p = self.path(table)
        os.makedirs(p, exist_ok=True)
        return p

    def exists(self, table: str) -> bool:
        p = self.path(table)
        return os.path.isdir(p) and any(
            f.endswith(".parquet") or f.startswith(INDEX_KEY + "=") or f.startswith("_index=")
            for f in os.listdir(p)
        )

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.read.option("basePath", self.path(table)).parquet(self.path(table))


def append_to_sink(
    df: DataFrame,
    catalog: SinkCatalog,
    table: str = "sink",
    sink_partitions: int = 0,
    writers_per_sink: int = 1,
) -> None:
    """S6/S7: the bulk append — ``partitionBy(_index)`` fans rows out
    to per-sink directories in one job (data-stream mode S7 is exactly
    this, append-only).

    Writer layout matters at scale (measured on 20M rows / 30 sinks):
      * no repartition: every map task writes every sink dir →
        tasks×sinks tiny files and dir-handle churn (102 s, 522 files);
      * repartition on _index alone (default): one writer per sink —
        fastest when sinks ≈ cores and sink sizes are balanced
        (22.7 s, 30 files; one consolidated file per sink is also the
        Iceberg-friendliest layout);
      * repartition on (_index, bounded deterministic salt): set
        ``writers_per_sink`` > 1 when one sink dominates the batch —
        parallel writers per hot sink, file count bounded by
        sinks × writers_per_sink (measured 31.2 s on BALANCED sinks —
        pay it only under skew). Salt hashes stable columns so replays
        produce identical layouts.
      * AQE REBALANCE hint measured worst here (40.8 s) — advisory
        partition sizing splits sinks across tasks and loses dir
        locality.
    """
    catalog.ensure(table)
    out = df
    if sink_partitions > 0:
        if writers_per_sink > 1:
            stable = [c for c in ("conv_id", "_id", "turn_idx") if c in df.columns]
            salt = (
                F.pmod(F.xxhash64(*[F.col(c) for c in stable]), F.lit(writers_per_sink))
                if stable
                else F.spark_partition_id() % writers_per_sink
            )
            out = out.repartition(sink_partitions, F.col(INDEX_KEY), salt)
        else:
            out = out.repartition(sink_partitions, F.col(INDEX_KEY))
    out.write.mode("append").partitionBy(INDEX_KEY).parquet(catalog.path(table))


def _apply_doc_update(
    existing: DataFrame,
    batch: DataFrame,
    update_exclude: tuple[str, ...],
    update_exclude_key: str | None = None,
) -> DataFrame:
    """P13: the ``{"doc": record}`` partial-update body
    (update_body, out_opensearch.rb:776-790): matched rows take the
    batch's values EXCEPT ``remove_keys_on_update`` columns, which keep
    their existing values (:792-799). At scale this is the column list
    of ``MERGE ... WHEN MATCHED THEN UPDATE SET``.

    ``update_exclude_key`` is the per-record variant
    (remove_keys_on_update_key, out_opensearch.rb:792-799): a record
    field holding a comma-separated list of keys to exclude for THAT
    row — a per-row CASE on each column instead of a static list.
    """
    upd_cols = {c for c in batch.columns if c != ID_KEY and c not in update_exclude}
    if update_exclude_key:
        upd_cols.discard(update_exclude_key)
    e, b = existing.alias("e"), batch.alias("b")

    def value(c: str):
        if c not in upd_cols:
            return F.col(f"e.{c}")
        if update_exclude_key and update_exclude_key in batch.columns:
            dyn_excluded = F.array_contains(
                F.split(F.coalesce(F.col(f"b.{update_exclude_key}"), F.lit("")), r"\s*,\s*"),
                c,
            )
            return F.when(dyn_excluded, F.col(f"e.{c}")).otherwise(F.col(f"b.{c}"))
        return F.col(f"b.{c}")

    return e.join(b, F.col(f"e.{ID_KEY}") == F.col(f"b.{ID_KEY}"), "inner").select(
        F.col(f"e.{ID_KEY}").alias(ID_KEY),
        *[value(c).alias(c) for c in existing.columns if c != ID_KEY],
    )


def merge_write(
    spark: SparkSession,
    batch: DataFrame,
    catalog: SinkCatalog,
    cfg: PipelineConfig,
    table: str = "sink",
) -> dict[str, int]:
    """W1: write-operation dispatch (append_record_to_messages,
    out_opensearch.rb:751-774; README.md:812-823). Returns op stats.

    At scale each branch is a single Iceberg ``MERGE INTO`` keyed on
    ``_id`` (snapshot isolation handles W3 commit conflicts); here the
    equivalent join plans run against the parquet state. ``create``
    duplicates are counted, not errors (W2,
    opensearch_error_handler.rb:125-126).
    """
    op = cfg.write_operation
    n_batch = batch.count()
    if op != OP_INDEX:
        batch = batch.filter(F.col(ID_KEY).isNotNull())

    if not catalog.exists(table):
        if op == OP_UPDATE:
            return {"input": n_batch, "written": 0, "duplicates": 0}
        append_to_sink(batch, catalog, table, cfg.sink_partitions)
        written = batch.count() if op != OP_INDEX else n_batch
        return {"input": n_batch, "written": written, "duplicates": 0}

    existing = catalog.read(spark, table)
    if op == OP_INDEX:
        merged = existing.join(batch.select(ID_KEY).distinct(), on=ID_KEY, how="left_anti").unionByName(batch)
        stats = {"input": n_batch, "written": n_batch, "duplicates": 0}
    elif op == OP_CREATE:
        fresh = batch.join(existing.select(ID_KEY).distinct(), on=ID_KEY, how="left_anti")
        n_fresh = fresh.count()
        merged = existing.unionByName(fresh)
        stats = {"input": n_batch, "written": n_fresh, "duplicates": n_batch - n_fresh}
    elif op == OP_UPDATE:
        matched = _apply_doc_update(existing, batch, cfg.remove_keys_on_update, cfg.remove_keys_on_update_key)
        n_upd = matched.count()
        merged = existing.join(batch.select(ID_KEY).distinct(), on=ID_KEY, how="left_anti").unionByName(matched)
        stats = {"input": n_batch, "written": n_upd, "duplicates": 0}
    elif op == OP_UPSERT:
        matched = _apply_doc_update(existing, batch, cfg.remove_keys_on_update, cfg.remove_keys_on_update_key)
        inserted = batch.join(existing.select(ID_KEY).distinct(), on=ID_KEY, how="left_anti")
        merged = (
            existing.join(batch.select(ID_KEY).distinct(), on=ID_KEY, how="left_anti")
            .unionByName(matched)
            .unionByName(inserted.select(*matched.columns))
        )
        stats = {"input": n_batch, "written": n_batch, "duplicates": 0}
    else:  # pragma: no cover
        raise ValueError(op)

    # rewrite (parquet has no in-place merge; Iceberg MERGE replaces this)
    tmp = catalog.path(table) + ".tmp"
    merged.write.mode("overwrite").partitionBy(INDEX_KEY).parquet(tmp)
    final = catalog.path(table)
    spark.read.parquet(tmp)  # validate before swap
    import shutil

    shutil.rmtree(final)
    os.rename(tmp, final)
    return stats


def write_metrics(
    catalog: SinkCatalog, run_id: str, metrics_rows: list[dict], table: str = "metrics"
) -> None:
    """Per-sink metrics + lineage emission (north_star: "lineage and
    metrics emitted per sink"). JSONL — tiny, driver-side."""
    p = catalog.ensure(table)
    with open(os.path.join(p, f"{run_id}.jsonl"), "a") as f:
        for row in metrics_rows:
            f.write(json.dumps({"run_id": run_id, "at": time.time(), **row}) + "\n")
