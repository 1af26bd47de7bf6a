"""Dynamic index-name routing (SURVEY.md §2.3 R1-R6) — the heart of the
reference plugin, re-expressed as column expressions so every row gets
its sink computed inside whole-stage codegen (strictly more general
than the reference's per-chunk placeholder expansion,
out_opensearch.rb:816-841 — Catalyst constant-folds the per-chunk
constants for free, SURVEY.md §4).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import PipelineConfig, strftime_to_spark
from ..constants import INDEX_KEY

#: ${key} | %% (escaped percent — matched FIRST so '%%%Y' lexes as
#: '%%','%Y', like strftime) | %<modifier?><letter> directives
_PLACEHOLDER_RE = re.compile(r"\$\{([^}]+)\}|(%%|%[-:.\w]?[a-zA-Z])")


def expand_placeholders(template: str, tag_col: str = "tag", ts_col: str = "_event_ts") -> Column:
    """R1: expand ``${tag}`` / ``${custom_key}`` / strftime directives in
    an index/pipeline/host template into a per-row column expression
    (out_opensearch.rb:816-841; README.md:1191-1242).

    Per-row rather than per-chunk: a superset of the reference behavior
    (the reference evaluates once per buffer chunk keyed by the same
    fields, so values agree).
    """
    parts: list[Column] = []
    pos = 0
    for m in _PLACEHOLDER_RE.finditer(template):
        if m.start() > pos:
            parts.append(F.lit(template[pos : m.start()]))
        if m.group(1) is not None:
            key = m.group(1)
            parts.append(F.col(tag_col) if key == "tag" else F.col(key))
        else:
            parts.append(F.date_format(F.col(ts_col), strftime_to_spark(m.group(2))))
        pos = m.end()
    if pos < len(template):
        parts.append(F.lit(template[pos:]))
    if not parts:
        return F.lit("")
    return F.concat(*parts) if len(parts) > 1 else parts[0]


def target_index_col(df: DataFrame, cfg: PipelineConfig, ts_col: str = "_event_ts") -> Column:
    """R2+R3: target-index precedence (out_opensearch.rb:987-1001).

    ``target_index_key`` record field → logstash ``prefix-sep-date`` →
    static ``index_name``; always lowercased (out_opensearch.rb:998-1001).
    UTC vs local index day per ``utc_index`` (out_opensearch.rb:991,
    test_out_opensearch.rb:2483-2510) — testdata timestamps are tz-naive
    (≡ UTC), so local mode applies the session timezone.
    """
    date_fmt = strftime_to_spark(cfg.logstash_dateformat)
    ts = F.col(ts_col)
    if not cfg.utc_index:
        # utc_index=false renders the index day in the local zone
        # (out_opensearch.rb:991). Inputs are tz-naive ≡ UTC instants,
        # so shift them into the JVM-local zone before formatting.
        ts = F.from_utc_timestamp(ts, F.current_timezone())
    logstash = F.concat_ws(
        cfg.logstash_prefix_separator, F.lit(cfg.logstash_prefix), F.date_format(ts, date_fmt)
    )
    fallback = logstash if cfg.logstash_format else F.lit(cfg.index_name)
    if cfg.target_index_key and cfg.target_index_key in df.columns:
        return F.lower(F.coalesce(F.col(cfg.target_index_key), fallback))
    return F.lower(fallback)


def route(df: DataFrame, cfg: PipelineConfig, ts_col: str = "_event_ts") -> DataFrame:
    """Attach ``_index`` and drop the override key from the record
    (the reference deletes ``target_index_key`` after use,
    out_opensearch.rb:988-990; test_out_opensearch.rb:2044-2054)."""
    out = df.withColumn(INDEX_KEY, target_index_col(df, cfg, ts_col))
    if cfg.target_index_key and cfg.target_index_key in df.columns:
        out = out.drop(cfg.target_index_key)
    return out


def alias_col(cfg: PipelineConfig, app_name: str, ts_col: str = "_event_ts") -> Column:
    """R4: rollover alias ``prefix<sep>app_name<sep>date``
    (out_opensearch.rb:992-993,1025) — the write-alias a rollover
    policy targets while ``_index`` names the concrete backing index."""
    date_fmt = strftime_to_spark(cfg.logstash_dateformat)
    return F.lower(
        F.concat_ws(
            cfg.logstash_prefix_separator,
            F.lit(cfg.logstash_prefix),
            F.lit(app_name),
            F.date_format(F.col(ts_col), date_fmt),
        )
    )


def affinity_enabled(cfg: PipelineConfig) -> bool:
    """R5 gate — target_index_affinity_enabled?
    (out_opensearch.rb:917-919): affinity only fires for logstash
    routing with an id_key under update/upsert write operations."""
    return (
        cfg.target_index_affinity
        and cfg.logstash_format
        and bool(cfg.id_key)
        and cfg.write_operation in ("update", "upsert")
    )


def affinity_override(
    df: DataFrame, existing_ids: DataFrame, id_col: str = "_id"
) -> DataFrame:
    """R5: target-index affinity for update/upsert + logstash
    (out_opensearch.rb:917-951,1006-1013; tests :2173-2275).

    The reference queries the cluster for THE CHUNK'S ``_id`` set only
    (get_affinity_target_indices builds the id set from the chunk,
    out_opensearch.rb:925-930), sorts hits by ``_index desc`` and keeps
    the OLDEST index per id so updates land where the doc already
    lives. Spark-first shape, bounded the same way (A4→A5→J1):

      1. semi-join the existing sink state on the batch's distinct ids
         — the build side is O(batch ids), never O(sink table), so a
         billion-doc sink cannot OOM the broadcast;
      2. ``min(_index) per _id`` over the surviving rows (A5);
      3. left join + coalesce onto the computed index. No broadcast is
         forced: AQE sizes the aggregated side at runtime and converts
         to broadcast-hash when it fits ``autoBroadcastJoinThreshold``,
         falling back to a shuffle join for pathological batches whose
         id set is itself huge.

    ``existing_ids`` must have columns (_id, _index).
    """
    batch_ids = df.select(F.col(id_col)).where(F.col(id_col).isNotNull()).distinct()
    relevant = existing_ids.join(batch_ids, on=id_col, how="left_semi")
    oldest = relevant.groupBy(id_col).agg(F.min(INDEX_KEY).alias("_affinity_index"))
    return (
        df.join(oldest, on=id_col, how="left")
        .withColumn(INDEX_KEY, F.coalesce(F.col("_affinity_index"), F.col(INDEX_KEY)))
        .drop("_affinity_index")
    )


def per_sink_counts(df: DataFrame) -> DataFrame:
    """A1: per-sink routed-row counts (bulk_message_count,
    out_opensearch.rb:857,890,896) — the graft's correctness metric.
    Partial aggregation (map-side combine) is automatic in Catalyst."""
    return df.groupBy(INDEX_KEY).agg(F.count(F.lit(1)).alias("routed_rows"))
