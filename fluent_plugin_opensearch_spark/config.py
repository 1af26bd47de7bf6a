"""Pipeline configuration.

``PipelineConfig`` mirrors the reference plugin's config surface
(``lib/fluent/plugin/out_opensearch.rb:95-220``) restricted to the
record-pipeline parameters that affect dataflow semantics. Transport
parameters (hosts, TLS, auth, sniffer/selector classes) have no Spark
analog — they are replaced by the Spark cluster manager and table
catalog config (SURVEY.md §2.1 S11) and intentionally absent here.
"""

from __future__ import annotations

from dataclasses import dataclass

from .constants import (
    OP_INDEX,
    UNRECOVERABLE_ERROR_TYPES,
    UNRECOVERABLE_RECORD_TYPES,
    WRITE_OPERATIONS,
)


@dataclass(frozen=True)
class PipelineConfig:
    """Dataflow-relevant knobs of fluent-plugin-opensearch.

    Field-by-field provenance is noted against the reference defaults
    (out_opensearch.rb line numbers in comments).
    """

    # --- routing (out_opensearch.rb:98-131) ---
    index_name: str = "fluentd"            # :119 default index
    logstash_format: bool = False          # :104
    logstash_prefix: str = "logstash"      # :105
    logstash_prefix_separator: str = "-"   # :106
    logstash_dateformat: str = "%Y.%m.%d"  # :108 (strftime)
    utc_index: bool = True                 # :128 (out_opensearch.rb:991)
    target_index_key: str | None = None    # :109
    target_index_affinity: bool = False    # :130 (R5)

    # --- timestamps (out_opensearch.rb:107-118) ---
    time_key: str | None = None            # :111
    time_key_format: str | None = None     # :110 (strftime)
    time_precision: int = 6                # :107 default 9 (ns); Spark is µs
    include_timestamp: bool = False        # :103 forces @timestamp injection without logstash_format
    time_key_exclude_timestamp: bool = False  # :126 (skip writing @timestamp from time_key)
    time_parse_error_tag: str = "opensearch_plugin.output.time.error"  # :151

    # --- record shaping ---
    include_tag_key: bool = False          # :112
    tag_key: str = "tag"                   # :113
    remove_keys: tuple[str, ...] = ()      # :288-290
    flatten_hashes: bool = False           # :166
    flatten_hashes_separator: str = "_"    # :167

    # --- meta extraction (out_opensearch.rb:114-117, 554-556) ---
    id_key: str | None = None
    parent_key: str | None = None
    routing_key: str | None = None
    # ingest-pipeline meta with placeholder expansion
    # (out_opensearch.rb:153,835-840,1027-1029)
    pipeline: str | None = None

    # --- write semantics (out_opensearch.rb:173, 751-774) ---
    write_operation: str = OP_INDEX
    emit_error_for_missing_id: bool = False  # :175 (test :3503-3603)
    # P13: keys excluded from the UPDATE SET on update/upsert
    # (remove_keys_on_update, out_opensearch.rb:792-799), plus the
    # per-record variant: a record field naming that row's exclusions
    # (remove_keys_on_update_key)
    remove_keys_on_update: tuple[str, ...] = ()
    remove_keys_on_update_key: str | None = None
    # skip the {"doc": record} wrap on update bodies (update_body,
    # out_opensearch.rb:171,776-780): the record IS the update body, so
    # matched rows are replaced wholesale — an excluded/absent key no
    # longer preserves its existing value (the wrap is what gives
    # partial-merge semantics)
    suppress_doc_wrap: bool = False

    # --- chunk-id injection (out_opensearch.rb:182-183, 847-854) ---
    # the reference injects the chunk id ONLY when configured; P7 is
    # gated the same way here (r2 applied it unconditionally)
    include_chunk_id: bool = False
    chunk_id_key: str = "chunk_id"

    # --- retry / DLQ (out_opensearch.rb:149-165) ---
    retry_tag: str | None = None             # :149
    unrecoverable_error_types: tuple[str, ...] = UNRECOVERABLE_ERROR_TYPES  # :164
    unrecoverable_record_types: tuple[str, ...] = UNRECOVERABLE_RECORD_TYPES  # :165
    max_retries: int = 10                    # opensearch_index_template.rb:74-80

    # --- batching / sizing (declarative in Spark; R7) ---
    target_file_size_bytes: int = 128 * 1024 * 1024
    sink_partitions: int = 0                 # 0 = let AQE decide

    # --- skew handling (SURVEY.md §4 item 1) ---
    salt_buckets: int = 0                    # 0 = no salting

    # --- genid filter (filter_opensearch_genid.rb:34-55) ---
    genid_hash_id_key: str = "_hash"
    genid_include_tag_in_seed: bool = False
    genid_include_time_in_seed: bool = False
    genid_use_record_as_seed: bool = False
    genid_use_entire_record: bool = False
    genid_record_keys: tuple[str, ...] = ()
    genid_separator: str = "_"
    genid_hash_type: str = "sha1"

    def __post_init__(self) -> None:
        if self.write_operation not in WRITE_OPERATIONS:
            raise ValueError(f"write_operation must be one of {WRITE_OPERATIONS}")
        if self.genid_hash_type not in ("md5", "sha1", "sha256", "sha512"):
            raise ValueError("genid_hash_type must be md5|sha1|sha256|sha512")


#: strftime → Spark date_format pattern translation for the subset the
#: reference exercises (logstash_dateformat %Y.%m.%d and time formats).
_STRFTIME_TO_SPARK = {
    "%Y": "yyyy",
    "%m": "MM",
    "%d": "dd",
    "%H": "HH",
    "%M": "mm",
    "%S": "ss",
    "%j": "DDD",
    "%y": "yy",
    "%N": "SSSSSSSSS",
    "%3N": "SSS",
    "%6N": "SSSSSS",
    "%L": "SSS",
    "%z": "XX",
    "%:z": "XXX",
    "%%": "%",
}


def strftime_to_spark(fmt: str) -> str:
    """Translate a strftime pattern (reference config dialect,
    out_opensearch.rb:108,110) to a Spark ``date_format`` pattern.

    Literal text is passed through; unknown directives raise so that a
    config error surfaces at plan-build time (like the reference's
    configure-time validation), not mid-job.
    """
    out: list[str] = []
    literal: list[str] = []

    def flush_literal() -> None:
        if literal:
            run = "".join(literal)
            # letters must be quoted as ONE block — per-char quoting
            # ('l''o') reads as an escaped quote in DateTimeFormatter
            out.append(f"'{run}'" if any(c.isalpha() for c in run) else run)
            literal.clear()

    i = 0
    while i < len(fmt):
        if fmt[i] == "%":
            for probe in (fmt[i : i + 3], fmt[i : i + 2]):
                if probe in _STRFTIME_TO_SPARK:
                    flush_literal()
                    out.append(_STRFTIME_TO_SPARK[probe])
                    i += len(probe)
                    break
            else:
                raise ValueError(f"unsupported strftime directive at {fmt[i:]!r}")
        else:
            literal.append(fmt[i])
            i += 1
    flush_literal()
    return "".join(out)
