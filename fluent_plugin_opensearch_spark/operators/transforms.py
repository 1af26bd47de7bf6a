"""Per-record transforms (SURVEY.md §2.2 P1/P2/P6-P10).

Every transform is a pure ``DataFrame -> DataFrame`` stage built from
built-in column functions only (zero UDFs; the reference iterates rows
in Ruby, out_opensearch.rb:965-1042 — here each becomes one projection
Catalyst folds into a single whole-stage-codegen'd select).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import PipelineConfig
from ..constants import ID_KEY, PARENT_KEY, ROUTING_KEY


def drop_non_records(df: DataFrame, text_col: str = "text") -> DataFrame:
    """P1: the reference silently skips non-hash records
    (out_opensearch.rb:873). The columnar analog of "not a record" is a
    NULL payload; we route those to DLQ instead of silently dropping
    (flagged, not filtered — fan-out decides)."""
    return df.withColumn("malformed_record", F.col(text_col).isNull())


def flatten_struct_cols(df: DataFrame, separator: str = "_") -> DataFrame:
    """P2: recursive hash flattening (flatten_record,
    out_opensearch.rb:801-814; test :2426-2446
    ``{"foo":{"bar":"baz"}} → {"foo<sep>bar":"baz"}``).

    Static-schema variant: every StructType column is expanded into
    ``parent<sep>child`` top-level columns, recursively; arrays are left
    intact exactly like the reference (:806-809). Pure projection — no
    shuffle, no UDF.
    """
    def expand(prefix: str, col: Column, dtype: T.DataType) -> list[tuple[str, Column]]:
        if isinstance(dtype, T.StructType):
            out: list[tuple[str, Column]] = []
            for f in dtype.fields:
                out.extend(expand(f"{prefix}{separator}{f.name}", col.getField(f.name), f.dataType))
            return out
        return [(prefix, col)]

    cols: list[Column] = []
    for f in df.schema.fields:
        if isinstance(f.dataType, T.StructType):
            cols.extend(c.alias(n) for n, c in expand(f.name, F.col(f.name), f.dataType))
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)


def include_tag(df: DataFrame, cfg: PipelineConfig, tag_col: str = "tag") -> DataFrame:
    """P6: tag injection under ``tag_key`` when ``include_tag_key``
    (out_opensearch.rb:1002-1004). The tag is a column in our model."""
    if not cfg.include_tag_key:
        return df
    return df.withColumn(cfg.tag_key, F.col(tag_col))


def inject_chunk_id(
    df: DataFrame, chunk_id_key: str = "chunk_id", buckets: int = 256
) -> DataFrame:
    """P7: chunk-id injection (inject_chunk_id_to_record_if_needed,
    out_opensearch.rb:847-854). The Spark batch lineage analog: a
    deterministic id per (sink, content bucket) so replays are
    dedupable (test_out_opensearch.rb:1923-1955 exercises dedup on it).

    The bucket is derived from STABLE row content (conv_id when
    present), not spark_partition_id — a replay under a different
    partition layout/parallelism still produces the same chunk ids
    (ADVICE r1). The partition-id fallback only applies to schemas
    with no stable key, where the replay-dedup claim is scoped to
    same-plan replays."""
    stable = next((c for c in ("conv_id", "_id", "event_id") if c in df.columns), None)
    bucket = (
        F.pmod(F.xxhash64(F.col(stable)), F.lit(buckets))
        if stable
        else F.spark_partition_id()
    )
    return df.withColumn(
        chunk_id_key,
        F.lower(F.hex(F.xxhash64(F.col("_index"), bucket))),
    )


def remove_keys(df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """P8: drop configured keys before indexing
    (out_opensearch.rb:1037-1039)."""
    return df.drop(*[k for k in cfg.remove_keys if k in df.columns]) if cfg.remove_keys else df


def resolve_key_path(path: str) -> Column:
    """P9: nested-key accessor — ``$.a.b`` / ``$['a']['b']`` / legacy
    ``a.b`` (convert_compat_id_key, out_opensearch.rb:558-563) resolved
    to a native nested-field column reference."""
    p = path
    if p.startswith("$."):
        p = p[2:]
    elif p.startswith("$["):
        p = p[1:].replace("['", ".").replace("']", "").lstrip(".")
    parts = p.split(".")
    col = F.col(parts[0])
    for seg in parts[1:]:
        col = col.getField(seg)
    return col


def extract_meta(df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """P10: copy record fields into bulk meta ``_id``/``_parent``/
    ``routing`` when configured (create_meta_config_map +
    process_message, out_opensearch.rb:565-571,1031-1035). Missing
    config → NULL column so downstream ops are uniform."""
    def meta(key: str | None) -> Column:
        if key is None:
            return F.lit(None).cast("string")
        root = key.replace("$.", "").replace("$['", "").split(".")[0].split("'")[0]
        if root not in df.columns:
            return F.lit(None).cast("string")
        return resolve_key_path(key).cast("string")

    out = (
        df.withColumn(ID_KEY, meta(cfg.id_key))
        .withColumn(PARENT_KEY, meta(cfg.parent_key))
        .withColumn(ROUTING_KEY, meta(cfg.routing_key))
    )
    if cfg.pipeline:
        # ingest-pipeline meta, placeholder-expanded per row
        # (meta["pipeline"], out_opensearch.rb:1027-1029; expansion
        # :835-840 — per-chunk there, per-row here, values agree)
        from .routing import expand_placeholders

        out = out.withColumn("_pipeline", expand_placeholders(cfg.pipeline))
    return out


def missing_id_filter(df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """W1 side-rule: for create/update/upsert, records without ``_id``
    are dropped (optionally emitted as errors,
    out_opensearch.rb:895-903; tests :3503-3603). Flag, don't filter —
    the fan-out writer sends flagged rows to DLQ (emit) or drops them.
    """
    if cfg.write_operation == "index":
        return df.withColumn("missing_id", F.lit(False))
    return df.withColumn("missing_id", F.col(ID_KEY).isNull())
