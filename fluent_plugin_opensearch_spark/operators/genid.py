"""Deterministic/random ``_hash`` id generation (SURVEY.md §2.2 P11/P12).

Parity target: filter_opensearch_genid.rb — golden Base64 digest
vectors from test_filter_opensearch_genid.rb:78-239 are replayed in
tests/test_genid.py. Seed construction (filter_seed_as_record,
filter_opensearch_genid.rb:77-88):

    [tag + sep]? [time + sep]? + join(record_keys values, sep)
  or (use_entire_record) concat over sorted keys of "|k|v"

digest ∈ {md5, sha1, sha256, sha512}, emitted as Base64 of the RAW
digest bytes (encode_hash :90-101) — hence ``base64(unhex(hex_digest))``.
All built-in expressions; vectorized and codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import PipelineConfig

_HASHERS = {
    "md5": lambda c: F.md5(c),
    "sha1": lambda c: F.sha1(c),
    "sha256": lambda c: F.sha2(c, 256),
    "sha512": lambda c: F.sha2(c, 512),
}


def hash_b64(seed: Column, hash_type: str) -> Column:
    """Base64(raw digest(seed)) — encode_hash parity
    (filter_opensearch_genid.rb:90-101). Ruby strict_encode64 emits no
    line breaks; Spark's base64 is MIME-style (CRLF every 76 chars, so
    sha512 digests get split) — strip them."""
    hex_digest = _HASHERS[hash_type](seed)
    return F.regexp_replace(F.base64(F.unhex(hex_digest)), "[\\r\\n]", "")


def seed_column(df: DataFrame, cfg: PipelineConfig, tag_col: str = "tag", time_col: str | None = None) -> Column:
    """Build the digest seed per filter_seed_as_record
    (filter_opensearch_genid.rb:77-88).

    The Ruby builds ``seed += tag + sep`` then ``seed += time + sep``
    then joins the selected record values with sep BETWEEN them — i.e.
    trailing separators after tag/time, none after the last value.
    """
    sep = cfg.genid_separator
    parts: list[Column] = []
    if cfg.genid_include_tag_in_seed and tag_col in df.columns:
        parts.append(F.concat(F.col(tag_col), F.lit(sep)))
    if cfg.genid_include_time_in_seed and time_col:
        parts.append(F.concat(F.col(time_col).cast("string"), F.lit(sep)))

    if cfg.genid_use_entire_record:
        # entire-record seed: "|k|v" per key in key order
        # (filter_opensearch_genid.rb:81-83 iterates record.keys.sort? —
        # no: Ruby hash order = insertion order; our fixed schema gives
        # a stable column order, which we document as the seed order).
        kv = [
            F.concat(F.lit(f"|{c}|"), F.coalesce(F.col(c).cast("string"), F.lit("")))
            for c in df.columns
        ]
        parts.append(F.concat(*kv))
    else:
        # Ruby: record_keys.map{|k| record[k]}.join(sep) — a missing/nil
        # value stringifies to "" but KEEPS its separator, so coalesce
        # to '' (concat_ws alone would drop the null AND its sep).
        vals = [
            F.coalesce(F.col(k).cast("string"), F.lit(""))
            if k in df.columns
            else F.lit("")
            for k in cfg.genid_record_keys
        ]
        if vals:
            parts.append(F.concat_ws(sep, *vals))
    return F.concat(*parts) if parts else F.lit("")


def add_hash_id(df: DataFrame, cfg: PipelineConfig, tag_col: str = "tag", time_col: str | None = None) -> DataFrame:
    """P12: deterministic ``_hash`` column (the dedup-enabling id)."""
    if cfg.genid_use_record_as_seed or cfg.genid_record_keys or cfg.genid_use_entire_record:
        seed = seed_column(df, cfg, tag_col, time_col)
        return df.withColumn(cfg.genid_hash_id_key, hash_b64(seed, cfg.genid_hash_type))
    return add_random_id(df, cfg)


def add_random_id(df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """P11: random id — ``Base64.strict_encode64(SecureRandom.uuid)``
    (filter_opensearch_genid.rb:73) encodes the 36-char UUID STRING
    (not its bytes), yielding a 48-char id; matched here for format
    parity. Non-deterministic by design (no dedup value); only used
    when determinism is not requested."""
    return df.withColumn(
        cfg.genid_hash_id_key, F.base64(F.encode(F.expr("uuid()"), "utf-8"))
    )
