"""Golden-vector parity with filter_opensearch_genid
(test_filter_opensearch_genid.rb:78-239 — exact Base64 digests)."""

from __future__ import annotations

import pytest

from fluent_plugin_opensearch_spark import PipelineConfig
from fluent_plugin_opensearch_spark.operators.genid import add_hash_id

# sample_record (test_out_opensearch.rb:78-80) + custom_key
SAMPLE = [(26, "42", "parent", "routing", "This is also encoded value.")]
SCHEMA = "age int, request_id string, parent_id string, routing_id string, custom_key string"
KEYS = ("age", "parent_id", "routing_id", "custom_key")

GOLDEN = {
    "md5": "PPg+zmH1ASUCpNzMUcTzqw==",
    "sha1": "JKfCrEAxeAyRSdcKqkw4unC9xZ8=",
    "sha256": "9Z9i+897bGivSItD/6i0vye9uRwq/sLwWkxOwydtTJY=",
    "sha512": "KWI5OdZPaCFW9/CEY3NoGrvueMtjZJdmGdqIVGJP8vgI4uW+0gHExZVaHerw+RhbtIdLCtVZ43xBgMKH+KliQg==",
}


@pytest.mark.parametrize("hash_type,expected", sorted(GOLDEN.items()))
def test_use_record_as_seed_golden(spark, hash_type, expected):
    df = spark.createDataFrame(SAMPLE, SCHEMA)
    cfg = PipelineConfig(
        genid_use_record_as_seed=True,
        genid_record_keys=KEYS,
        genid_hash_type=hash_type,
    )
    row = add_hash_id(df, cfg).collect()[0]
    assert row["_hash"] == expected


def test_missing_key_keeps_separator(spark):
    """Ruby: record['absent'].to_s == '' but the join separator stays —
    seed 'a__c' not 'a_c' when the middle key is missing."""
    import base64
    import hashlib

    df = spark.createDataFrame([("a", "c")], "k1 string, k3 string")
    cfg = PipelineConfig(
        genid_use_record_as_seed=True,
        genid_record_keys=("k1", "k2", "k3"),
        genid_hash_type="sha256",
    )
    row = add_hash_id(df, cfg).collect()[0]
    want = base64.b64encode(hashlib.sha256(b"a__c").digest()).decode()
    assert row["_hash"] == want


def test_entire_record_seed(spark):
    """use_entire_record: seed = '|k|v' per column in schema order
    (filter_opensearch_genid.rb:81-83)."""
    import base64
    import hashlib

    df = spark.createDataFrame(SAMPLE, SCHEMA)
    cfg = PipelineConfig(
        genid_use_record_as_seed=True,
        genid_use_entire_record=True,
        genid_hash_type="sha256",
    )
    row = add_hash_id(df, cfg).collect()[0]
    seed = "|age|26|request_id|42|parent_id|parent|routing_id|routing|custom_key|This is also encoded value."
    want = base64.b64encode(hashlib.sha256(seed.encode()).digest()).decode()
    assert row["_hash"] == want


def test_tag_and_time_in_seed(spark):
    """tag/time prefixes carry trailing separators
    (filter_opensearch_genid.rb:78-80)."""
    import base64
    import hashlib

    df = spark.createDataFrame([("test", "1507993223", "v1")], "tag string, t string, k string")
    cfg = PipelineConfig(
        genid_use_record_as_seed=True,
        genid_include_tag_in_seed=True,
        genid_include_time_in_seed=True,
        genid_record_keys=("k",),
        genid_hash_type="md5",
    )
    row = add_hash_id(df, cfg, tag_col="tag", time_col="t").collect()[0]
    want = base64.b64encode(hashlib.md5(b"test_1507993223_v1").digest()).decode()
    assert row["_hash"] == want


def test_random_id_shape(spark):
    df = spark.createDataFrame([(1,), (2,)], "x int")
    cfg = PipelineConfig()
    rows = add_hash_id(df, cfg).collect()
    vals = {r["_hash"] for r in rows}
    assert len(vals) == 2  # distinct
    # Base64.strict_encode64(uuid STRING) parity: 36 chars → 48, no pad
    import base64
    import uuid

    for v in vals:
        assert len(v) == 48
        assert str(uuid.UUID(base64.b64decode(v).decode()))  # round-trips as a UUID
