"""Unit tests: routing placeholders, flattening, nested accessors,
dataset ops (minhash/simhash/ANN), salting, multimodal plumbing."""

from __future__ import annotations

from pyspark.sql import functions as F

from fluent_plugin_opensearch_spark import PipelineConfig
from fluent_plugin_opensearch_spark.operators import dataset as DS
from fluent_plugin_opensearch_spark.operators.enrich import repartition_salted, salt
from fluent_plugin_opensearch_spark.operators.routing import expand_placeholders, route
from fluent_plugin_opensearch_spark.operators.timestamps import inject_timestamp
from fluent_plugin_opensearch_spark.operators.transforms import (
    flatten_struct_cols,
    resolve_key_path,
)


def test_placeholder_expansion(spark):
    """R1: ${tag}, strftime, ${custom_key} (README.md:1191-1242)."""
    df = spark.createDataFrame(
        [("app.logs", "us-east", "2024-03-05 10:00:00")],
        "tag string, region string, ts_s string",
    ).withColumn("_event_ts", F.to_timestamp("ts_s"))
    col = expand_placeholders("idx-${tag}-${region}-%Y.%m.%d")
    got = df.select(col.alias("x")).collect()[0]["x"]
    assert got == "idx-app.logs-us-east-2024.03.05"


def test_logstash_index_utc_boundary(spark):
    """R3: 1s past midnight UTC lands in the new UTC day
    (test_out_opensearch.rb:2483-2510 semantics, UTC mode)."""
    cfg = PipelineConfig(logstash_format=True, logstash_prefix="logstash")
    df = spark.createDataFrame([("2024-03-05 00:00:01",)], "s string").withColumn(
        "ts", F.to_timestamp("s")
    )
    out = route(inject_timestamp(df, cfg), cfg)
    assert out.collect()[0]["_index"] == "logstash-2024.03.05"


def test_timestamp_field_precedence_drives_routing(spark):
    """P3 precedence (out_opensearch.rb:972-985): a record's own
    @timestamp is parsed first and the logstash index day follows it,
    so the emitted field and the routing day agree (ADVICE r1)."""
    cfg = PipelineConfig(logstash_format=True, logstash_prefix="logs", time_key="tk")
    df = spark.createDataFrame(
        [
            ("2024-03-09T08:00:00", "2024-03-07T08:00:00", "2024-03-05 10:00:00"),
            (None, "2024-03-07T08:00:00", "2024-03-05 10:00:00"),
            (None, None, "2024-03-05 10:00:00"),
        ],
        "`@timestamp` string, tk string, s string",
    ).withColumn("ts", F.to_timestamp("s"))
    rows = route(inject_timestamp(df, cfg), cfg).collect()
    assert rows[0]["_index"] == "logs-2024.03.09" and rows[0]["@timestamp"] == "2024-03-09T08:00:00"
    assert rows[1]["_index"] == "logs-2024.03.07" and rows[1]["@timestamp"].startswith("2024-03-07T08:00:00")
    assert rows[2]["_index"] == "logs-2024.03.05" and rows[2]["@timestamp"].startswith("2024-03-05T10:00:00")


def test_include_timestamp_and_exclude_knobs(spark):
    """include_timestamp forces injection without logstash_format
    (out_opensearch.rb:973); time_key_exclude_timestamp suppresses the
    time_key-derived @timestamp (:980)."""
    df = spark.createDataFrame(
        [("2024-03-07T08:00:00", "2024-03-05 10:00:00")], "tk string, s string"
    ).withColumn("ts", F.to_timestamp("s"))
    plain = inject_timestamp(df, PipelineConfig(time_key="tk"))
    assert "@timestamp" not in plain.columns  # no logstash, no include_timestamp
    forced = inject_timestamp(df, PipelineConfig(time_key="tk", include_timestamp=True))
    assert forced.collect()[0]["@timestamp"].startswith("2024-03-07T08:00:00")
    excl = inject_timestamp(
        df, PipelineConfig(time_key="tk", include_timestamp=True, time_key_exclude_timestamp=True)
    )
    assert excl.collect()[0]["@timestamp"] is None


def test_timestamp_field_ignored_when_injection_off(spark):
    """ADVICE r2: with logstash_format AND include_timestamp both off,
    a record's @timestamp is an ordinary field — never parsed, never a
    time_parse_error source (the reference reads it only inside the
    `if @logstash_format || @include_timestamp` branch,
    out_opensearch.rb:973-976). Before this fix an unparseable value
    DLQ'd records the reference delivers."""
    df = spark.createDataFrame(
        [("definitely-not-a-time", "2024-03-05 10:00:00")],
        "`@timestamp` string, s string",
    ).withColumn("ts", F.to_timestamp("s"))
    out = inject_timestamp(df, PipelineConfig()).collect()[0]
    assert out["time_parse_error"] is False
    assert out["@timestamp"] == "definitely-not-a-time"  # kept verbatim
    assert str(out["_event_ts"]).startswith("2024-03-05 10:00:00")
    # with injection ON the same garbage value IS a parse error (P5)
    on = inject_timestamp(df, PipelineConfig(include_timestamp=True)).collect()[0]
    assert on["time_parse_error"] is True


def test_index_name_lowercased(spark):
    """out_opensearch.rb:998-1001 / test :2032-2042."""
    cfg = PipelineConfig(target_index_key="target_index")
    df = spark.createDataFrame(
        [("UPPERCASE-Index", "2024-03-05 10:00:00")], "target_index string, s string"
    ).withColumn("ts", F.to_timestamp("s"))
    out = route(inject_timestamp(df, cfg), cfg)
    row = out.collect()[0]
    assert row["_index"] == "uppercase-index"
    assert "target_index" not in out.columns


def test_flatten_nested_struct(spark):
    """P2: {"foo":{"bar":"baz"}} → {"foo_bar":"baz"}; arrays untouched
    (out_opensearch.rb:801-814; test :2426-2446)."""
    df = spark.createDataFrame(
        [((("baz", [1, 2]),),)],
        "foo struct<inner: struct<bar: string, arr: array<int>>>",
    )
    out = flatten_struct_cols(df, "_")
    assert set(out.columns) == {"foo_inner_bar", "foo_inner_arr"}
    row = out.collect()[0]
    assert row["foo_inner_bar"] == "baz" and row["foo_inner_arr"] == [1, 2]


def test_nested_key_accessor(spark):
    """P9: $.nested.field / $['nested']['field'] / legacy a.b
    (out_opensearch.rb:558-571; test :3095-3125)."""
    df = spark.createDataFrame([(("42",),)], "nested struct<request_id: string>")
    for path in ["$.nested.request_id", "$['nested']['request_id']", "nested.request_id"]:
        assert df.select(resolve_key_path(path).alias("x")).collect()[0]["x"] == "42"


def test_minhash_finds_planted_near_dup(spark):
    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    near = base.replace("lazy", "sleepy")
    far = "completely different content about spark shuffles and partitions " * 5
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id bigint, text string"
    )
    pairs = DS.minhash_lsh_pairs(df, min_jaccard=0.5).collect()
    found = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert (1, 2) in found
    assert all(p in {(1, 2)} for p in found)  # no false pair with doc 3


def test_simhash_close_for_near_dup(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta " * 4
    near = base.replace("delta", "delta2")
    far = "one two three four five six seven eight nine ten " * 4
    df = spark.createDataFrame([(1, base), (2, near), (3, far)], "doc_id bigint, text string")
    h = {r["doc_id"]: r["simhash"] for r in DS.simhash64(df).collect()}
    ham = lambda a, b: bin((a ^ b) & (2**64 - 1)).count("1")  # noqa: E731
    assert ham(h[1], h[2]) < ham(h[1], h[3])
    assert ham(h[1], h[2]) <= 16


def test_star_cc_planted_graphs(spark):
    """large-star/small-star CC: correct clusters on a chain (the
    min-label worst case), a star (skewed degree), and an isolated
    pair — in O(log) rounds, not O(diameter)."""
    edges = (
        [(i, i + 1) for i in range(16)]
        + [(100, 100 + i) for i in range(1, 8)]
        + [(200, 201)]
    )
    df = spark.createDataFrame(edges, "doc_a bigint, doc_b bigint")
    stats = {}
    got = {r["doc_id"]: r["cluster_id"] for r in DS.dedup_clusters_star(df, stats=stats).collect()}
    want = {i: 0 for i in range(17)} | {100 + i: 100 for i in range(8)} | {200: 200, 201: 200}
    assert got == want
    assert stats["rounds"] <= 6, stats  # chain diameter is 16


def test_star_cc_matches_minlabel_random(spark):
    """Output-contract equality with the min-label baseline on a
    random graph (same clusters, any order)."""
    import random

    rng = random.Random(7)
    edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(25)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "doc_a bigint, doc_b bigint")
    star = {(r["doc_id"], r["cluster_id"]) for r in DS.dedup_clusters_star(df).collect()}
    ml = {(r["doc_id"], r["cluster_id"]) for r in DS.dedup_clusters(df, max_iter=40).collect()}
    assert star == ml


def test_simhash64_refactor_preserves_values(spark):
    """The explode→groupBy simhash64 must emit bit-identical hashes to
    the r1 array-expression math (computed inline here as the slow
    reference — it re-hashes per bit, fine for 3 rows)."""
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "x y z"), (3, "one one two")],
        "doc_id bigint, text string",
    )
    toks = F.array_distinct(F.split(F.trim(F.col("text")), r"\s+"))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))

    def vote(j):
        return F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc + F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )

    sim = None
    for j in range(64):
        bit = F.when(vote(j) > 0, F.lit(1).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
        term = F.shiftleft(bit, j)
        sim = term if sim is None else sim.bitwiseXOR(term)
    want = {r["doc_id"]: r["simhash"] for r in df.select("doc_id", sim.alias("simhash")).collect()}
    got = {r["doc_id"]: r["simhash"] for r in DS.simhash64(df).collect()}
    assert got == want


def test_ann_exact_vs_ivf_recall(spark):
    """IVF buckets must contain most of the exact top-k (recall check
    on the real embeddings table at smoke scale)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = DS.cosine_topk(emb, [0, 1, 2], k=5).collect()
    approx = DS.ivf_topk(emb, [0, 1, 2], k=5, n_probe_bits=2).collect()
    exact_set = {(r["q_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["q_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.4  # 2-bit LSH at n=500: coarse, but far above random


def test_salting_splits_hot_key(spark):
    df = spark.createDataFrame(
        [("hot", i) for i in range(1000)] + [("cold", 1)], "conv_id string, turn_idx int"
    )
    salted = salt(df, 8)
    n_salts = salted.filter(F.col("conv_id") == "hot").select("_salt").distinct().count()
    assert n_salts == 8
    # repartition on (conv_id, _salt) actually spreads the hot key
    parts = (
        repartition_salted(df, 8)
        .withColumn("p", F.spark_partition_id())
        .filter(F.col("conv_id") == "hot")
        .select("p")
        .distinct()
        .count()
    )
    assert parts > 1


def test_multimodal_feature_extraction(spark):
    from fluent_plugin_opensearch_spark.operators.multimodal import (
        extract_features,
        frame_sample_plan,
        synth_assets,
    )

    assets = synth_assets(spark, 32)
    feats = extract_features(assets)
    rows = feats.collect()
    assert len(rows) == 32
    assert all(len(r["feature"]) == 16 for r in rows)
    # deterministic: same asset → same feature
    again = {r["asset_id"]: r["feature"] for r in extract_features(assets).collect()}
    assert all(again[r["asset_id"]] == r["feature"] for r in rows)
    # frame sampling fan-out
    frames = frame_sample_plan(assets, every_nth=5)
    assert frames.count() >= 32


def test_simhash_neardup_planted(spark):
    # rich vocab so one swapped token flips few bits (tiny vocabs make
    # every vote marginal — hamming blows past any banding guarantee)
    base = " ".join(f"w{i:02d}" for i in range(40))
    near = base.replace("w39", "w39x")
    far = " ".join(f"z{i:02d}" for i in range(40))
    df = spark.createDataFrame([(1, base), (2, near), (3, far)], "doc_id bigint, text string")
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in DS.simhash_neardup_pairs(df, max_hamming=16).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] <= 16
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_embedding_neardup_planted(spark):
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = emb.select("vec_id", v.alias("embedding"))
    planted = base.filter(F.col("vec_id") < 3).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.001).alias("embedding"),
    )
    allv = base.unionByName(planted)
    exact = {(r["vec_a"], r["vec_b"]) for r in DS.embedding_neardup_pairs(allv, 0.99, exact=True).collect()}
    assert exact == {(0, 100000), (1, 100001), (2, 100002)}
    # LSH path: identical-direction vectors always share the bucket
    lsh = {(r["vec_a"], r["vec_b"]) for r in DS.embedding_neardup_pairs(allv, 0.99).collect()}
    assert lsh == exact


def test_grok_pattern_dictionary(spark):
    """First matching named pattern wins; fields from non-winning
    patterns stay NULL; unmatched rows get NULL pattern."""
    from fluent_plugin_opensearch_spark.operators.parse import parse_text_multi

    df = spark.createDataFrame(
        [
            ("[INFO] req=123 took=45ms hello world",),
            ("corrupted click payload ##",),
            ("garbage line",),
            (None,),
        ],
        "text string",
    )
    rows = parse_text_multi(df).collect()
    assert rows[0]["pattern"] == "req_line" and rows[0]["level"] == "INFO"
    assert rows[0]["req_id"] == "123" and rows[0]["corrupted_kind"] is None
    assert rows[1]["pattern"] == "corrupted" and rows[1]["corrupted_kind"] == "click"
    assert rows[1]["level"] is None
    assert rows[2]["pattern"] is None and rows[3]["pattern"] is None


def test_curate_corpus_planted(spark):
    """End-to-end curation drops: low-quality (4), exact dup (3, keeps
    lowest id 1), near-dup cluster loser (2) — keeps {1, 5}."""
    base = " ".join(f"w{i:02d}" for i in range(40))
    near = base.replace("w39", "w39x")
    far = " ".join(f"z{i:02d}" for i in range(40))
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, base), (4, "tiny"), (5, far)],
        "doc_id bigint, text string",
    )
    kept = {r["doc_id"] for r in DS.curate_corpus(df, min_jaccard=0.5).collect()}
    assert kept == {1, 5}


def test_embedding_neardup_multiband_recall(spark):
    """OR-amplification (VERDICT r2 item 1): noisy near-copies flip
    ~4% of hyperplane signs, so a SINGLE band misses a measurable
    fraction of pairs — the 4-band default must recover them (a pair
    is a candidate if ANY band collides)."""
    import numpy as np

    rng = np.random.RandomState(7)
    rows = []
    for i, v in enumerate(rng.randn(60, 32)):
        noisy = v + rng.randn(32) * 0.12  # cos ≈ 0.993
        rows.append((i, [float(x) for x in v]))
        rows.append((i + 1000, [float(x) for x in noisy]))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")

    def pairs(**kw):
        return {
            (r["vec_a"], r["vec_b"])
            for r in DS.embedding_neardup_pairs(df, threshold=0.98, **kw).collect()
        }

    exact = pairs(exact=True)
    planted = {(i, i + 1000) for i in range(60)} & exact
    assert len(planted) >= 50  # noise keeps most pairs above threshold
    one_band = pairs(n_bands=1, band_bits=4)
    four_band = pairs(n_bands=4, band_bits=4)
    r1 = len(one_band & planted) / len(planted)
    r4 = len(four_band & planted) / len(planted)
    assert r4 >= 0.95, f"4-band recall {r4:.2f}"
    assert r4 >= r1, f"multi-band ({r4:.2f}) must not trail single-band ({r1:.2f})"


def test_embedding_neardup_mega_bucket_guard(spark):
    """A degenerate pileup (300 identical vectors → one bucket in every
    band) must be dropped pre-join by max_bucket_size, while small
    buckets still pair; the unguarded call returns the quadratic set."""
    rows = [(i, [1.0] * 16) for i in range(300)]
    rows += [(1000, [-1.0] * 16), (1001, [-1.0] * 16)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    guarded = {
        (r["vec_a"], r["vec_b"])
        for r in DS.embedding_neardup_pairs(
            df, 0.99, n_bands=2, band_bits=4, max_bucket_size=100
        ).collect()
    }
    assert (1000, 1001) in guarded, "small bucket must survive the guard"
    assert not any(a < 300 and b < 300 for a, b in guarded), "mega-bucket not dropped"
    unguarded = DS.embedding_neardup_pairs(
        df, 0.99, n_bands=2, band_bits=4, max_bucket_size=10**6
    )
    n_boiler = unguarded.filter("vec_a < 300 AND vec_b < 300").count()
    assert n_boiler == 300 * 299 // 2


def test_simhash_neardup_mega_bucket_guard(spark):
    """VERDICT r2 item 2: a boilerplate text shared by 200 docs shares
    every simhash block → B²/2 candidates; the guard drops those blocks
    pre-join while distinct near-dup pairs still pair via their own
    blocks. Non-binding guard returns the full quadratic set."""
    boiler = "license header all rights reserved " * 5
    a = " ".join(f"w{i:02d}" for i in range(30))
    rows = [(i, boiler) for i in range(200)] + [(1000, a), (1001, a)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    guarded = {
        (r["doc_a"], r["doc_b"])
        for r in DS.simhash_neardup_pairs(df, max_hamming=16, max_bucket_size=50).collect()
    }
    assert (1000, 1001) in guarded
    assert not any(x < 200 and y < 200 for x, y in guarded), "mega-block not dropped"
    full = DS.simhash_neardup_pairs(df, max_hamming=16, max_bucket_size=1000)
    assert full.filter("doc_a < 200 AND doc_b < 200").count() == 200 * 199 // 2


def test_curate_corpus_guarded_default_matches_unguarded(spark):
    """VERDICT r2 item 3: the production default (max_bucket_size=1000)
    must produce the identical kept-set to the unguarded oracle-parity
    configuration whenever no bucket binds (true at this scale)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    kept_default = {r["doc_id"] for r in DS.curate_corpus(docs).collect()}
    kept_unguarded = {
        r["doc_id"] for r in DS.curate_corpus(docs, max_bucket_size=1_000_000).collect()
    }
    assert kept_default == kept_unguarded


def test_grok_compile_dialect():
    """grok_compile: recursive dictionary expansion, named vs anonymous
    references, oniguruma (?<name>…)/\\k<name> normalization, cycle and
    unknown-pattern errors."""
    import re

    import pytest

    from fluent_plugin_opensearch_spark.operators.parse import grok_compile

    rx = grok_compile(
        "%{LINE}",
        {"LINE": r"^%{WORD:verb} %{NUM:n}$", "NUM": r"\d+"},
    )
    m = re.match(rx, "get 42")
    assert m and m.group("verb") == "get" and m.group("n") == "42"
    # anonymous %{WORD} expands without capturing
    assert re.compile(grok_compile("%{WORD}")).groups == 0
    # oniguruma named group + backreference: a duplicated-word matcher
    # (the named-backreference example from VERDICT r2 item 8)
    dup = grok_compile(r"(?<w>\w+) \k<w>")
    assert re.match(dup, "echo echo").group("w") == "echo"
    assert re.match(dup, "echo print") is None
    # lookbehind is NOT rewritten as a named group
    lb = grok_compile(r"(?<=x)%{WORD:rest}")
    assert re.search(lb, "xyz").group("rest") == "yz"
    with pytest.raises(KeyError):
        grok_compile("%{NOPE}")
    with pytest.raises(ValueError):
        grok_compile("%{A}", {"A": "%{B}", "B": "%{A}"})


def test_parse_grok_pandas_named_fields(spark):
    """parse_grok_pandas: named-group extraction over a runtime
    dictionary, typed casts, grok_ok flag, NULL-safe."""
    from fluent_plugin_opensearch_spark.operators.parse import parse_grok_pandas

    df = spark.createDataFrame(
        [("[INFO] req=123 took=45ms hello",), ("nope",), (None,)], "text string"
    )
    out = parse_grok_pandas(
        df,
        "%{REQLINE}",
        {"NUM": r"\d+", "REQLINE": r"^\[%{WORD:level}\] req=%{NUM:req_id} took=%{NUM:took_ms}ms %{GREEDYDATA:msg}$"},
        types={"took_ms": "bigint"},
    )
    rows = out.collect()
    assert rows[0]["level"] == "INFO" and rows[0]["req_id"] == "123"
    assert rows[0]["took_ms"] == 45 and rows[0]["msg"] == "hello"
    assert rows[0]["grok_ok"] is True
    assert rows[1]["grok_ok"] is False and rows[1]["level"] is None
    assert rows[2]["grok_ok"] is False


def test_curate_corpus_semantic_planted(spark):
    """Semantic stage after text curation: two docs with different
    texts (lexically distinct → text stages keep both) but near-
    identical embeddings must collapse to the lower id; docs without a
    semantic twin pass through."""
    a = " ".join(f"w{i:02d}" for i in range(40))
    b = " ".join(f"x{i:02d}" for i in range(40))
    c = " ".join(f"y{i:02d}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id bigint, text string"
    )
    v1 = [float((i * 7) % 13 - 6) for i in range(16)]
    emb = spark.createDataFrame(
        [
            (1, v1),
            (2, [x * 1.001 for x in v1]),  # semantic twin of doc 1
            (3, [float((i * 5) % 11 - 5) for i in range(16)]),
        ],
        "vec_id bigint, embedding array<double>",
    )
    kept = {
        r["doc_id"]
        for r in DS.curate_corpus_semantic(docs, emb, min_jaccard=0.5).collect()
    }
    assert kept == {1, 3}


# ---------------------------------------------------------------------------
# Incremental dedup (new batch vs existing corpus, r4)
# ---------------------------------------------------------------------------

def test_dedup_incremental_planted(spark):
    """Exact dup (incl. normalization), deterministic near-dup (all 4
    md5 band slices collide — verified by independent Python minhash
    simulation, jaccard 0.8947), and a novel doc that survives."""
    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa quebec romeo sierra tango")
    near = base.rsplit(" ", 1)[0] + " zulu"
    existing = spark.createDataFrame(
        [(0, base), (1, "completely different content about spark physical plans here")],
        ["doc_id", "text"],
    )
    new = spark.createDataFrame(
        [
            (10, base),                       # exact (and near) dup of 0
            (11, "ALPHA  bravo " + base.split(" ", 2)[2]),  # exact after lower+ws normalization
            (12, near),                       # near dup of 0, not exact
            (13, "utterly novel sentence with entirely unique vocabulary tokens"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in DS.dedup_incremental(
            new, existing, num_hashes=8, bands=4, min_jaccard=0.2,
            hasher=DS._md5_hasher, bucket_by_values=True,
        ).collect()
    }
    assert out[10]["exact_dup"] == 1 and out[10]["kept"] == 0
    assert out[10]["n_near"] >= 1 and out[10]["first_match"] == 0
    assert out[11]["exact_dup"] == 1 and out[11]["kept"] == 0
    assert out[12]["exact_dup"] == 0 and out[12]["n_near"] == 1
    assert out[12]["first_match"] == 0 and out[12]["kept"] == 0
    assert out[13]["exact_dup"] == 0 and out[13]["n_near"] == 0
    assert out[13]["first_match"] == -1 and out[13]["kept"] == 1


# --- winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003) ---


def _py_winnow(text: str, k: int = 3, w: int = 4) -> set[tuple[int, int]]:
    """Independent reference implementation of robust winnowing with
    the md5 60-bit shingle hash (rightmost-min tie rule). Returns
    {(fp_pos, fp_hash)}."""
    import hashlib

    toks = text.strip().split()
    grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    hs = [int(hashlib.md5(f"{g}#0".encode()).hexdigest()[:15], 16) for g in grams]
    n = len(hs)
    out: set[tuple[int, int]] = set()
    for q in range(n):
        if q >= w - 1 or q == n - 1:
            lo = max(0, q - w + 1)
            best = min(range(lo, q + 1), key=lambda p: (hs[p], -p))
            out.add((best, hs[best]))
    return out


def test_winnow_python_parity_random(spark):
    """Spark winnow_fingerprints (md5 twin) == the independent Python
    reference on random small-vocab docs (small vocab forces repeated
    shingles, hash ties, and duplicate selections)."""
    import random

    rng = random.Random(47)
    vocab = ["agg", "row", "scan", "key"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 14))))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["doc_id"], r["fp_pos"], r["fp_hash"])
        for r in DS.winnow_fingerprints(df, hasher=DS._md5_hasher).collect()
    }
    want = {
        (i, p, h) for i, text in rows for (p, h) in _py_winnow(text)
    }
    assert got == want
    # density sanity: every doc with >= k tokens fingerprinted
    assert {i for i, _, _ in got} == {i for i, t in rows if len(t.split()) >= 3}


def test_winnow_guarantee_planted(spark):
    """The winnowing guarantee: a shared token run of >= w + k - 1
    tokens (here 6) yields >= 1 shared fingerprint, so the pair
    surfaces; disjoint docs never pair."""
    shared = "zeta yotta quark gluon meson boson"  # 6 tokens, distinctive
    rows = [
        (0, "alpha beta gamma " + shared + " delta epsilon"),
        (1, shared + " omega psi chi phi upsilon tau"),
        (2, "one two three four five six seven eight nine"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in DS.winnow_pairs(df, min_shared=1, hasher=DS._md5_hasher).collect()
    }
    assert (0, 1) in pairs
    assert not any(2 in p for p in pairs)


def test_winnow_posting_guard(spark):
    """Fingerprint hashes appearing in > max_postings docs are dropped
    before the self-join (boilerplate guard): identical boilerplate in
    every doc stops pairing when the guard is tightened below the
    corpus size."""
    boiler = "terms of service apply to all"
    rows = [(i, boiler) for i in range(12)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    open_pairs = DS.winnow_pairs(df, min_shared=1, max_postings=50).count()
    guarded = DS.winnow_pairs(df, min_shared=1, max_postings=5).count()
    assert open_pairs == 12 * 11 // 2
    assert guarded == 0


def test_dedup_incremental_index_reuse(spark):
    """Passing a precomputed existing-side signature frame
    (``existing_sigs`` — the cross-batch incremental index) must
    reproduce the default path exactly, and ``cache_handle`` must
    receive only the frames THIS call persisted (the new-batch
    signatures) so a long-lived ingest loop can unpersist them."""
    existing = spark.createDataFrame(
        [(0, "alpha bravo charlie delta echo foxtrot golf hotel india juliet"),
         (1, "completely different content about spark physical plans here")],
        ["doc_id", "text"],
    )
    new = spark.createDataFrame(
        [(10, "alpha bravo charlie delta echo foxtrot golf hotel india juliet"),
         (13, "utterly novel sentence with entirely unique vocabulary tokens")],
        ["doc_id", "text"],
    )
    kw = dict(num_hashes=8, bands=4, min_jaccard=0.2,
              hasher=DS._md5_hasher, bucket_by_values=True)
    want = {r["doc_id"]: (r["exact_dup"], r["n_near"], r["kept"])
            for r in DS.dedup_incremental(new, existing, **kw).collect()}

    sigs_e = DS.minhash_signatures(existing, "doc_id", "text", 8, 3,
                                   DS._md5_hasher).persist()
    handle: list = []
    got = {r["doc_id"]: (r["exact_dup"], r["n_near"], r["kept"])
           for r in DS.dedup_incremental(
               new, existing, existing_sigs=sigs_e, cache_handle=handle, **kw
           ).collect()}
    assert got == want
    assert len(handle) == 1  # only the new-batch signatures
    for df in handle:
        df.unpersist()
    sigs_e.unpersist()


def _py_dup_spans(rows, w):
    """Independent Python ExactSubstr-span oracle: keeper = globally
    smallest (id, pos) per duplicated w-token window; per-doc marked
    windows merge when overlapping or adjacent (pos <= prev span end)."""
    occ = {}
    for did, text in rows:
        toks = text.split()
        for p in range(len(toks) - w + 1):
            occ.setdefault(tuple(toks[p : p + w]), []).append((did, p))
    by_doc = {}
    for v in occ.values():
        keeper = min(v)
        for o in v:
            if o != keeper:
                by_doc.setdefault(o[0], []).append(o[1])
    spans = {}
    for did, ps in by_doc.items():
        out = []
        for p in sorted(ps):
            if out and p <= out[-1][1]:
                out[-1][1] = max(out[-1][1], p + w)
                out[-1][2] += 1
            else:
                out.append([p, p + w, 1])
        spans[did] = [tuple(x) for x in out]
    return spans


def test_duplicate_spans_planted(spark):
    """Cross-doc shared run -> one merged span on the non-keeper doc;
    within-doc repetition -> keeper occurrences stay, repeats merge;
    span_end is exclusive; disjoint spans never merge."""
    rows = [
        (0, "a b c d e f"),
        (1, "x a b c d y"),
        (2, "p q r p q r p q r"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_dup_windows"])
        for r in DS.duplicate_spans(df, window=3).collect()
    }
    # doc 1: windows at pos 1 ("a b c") and 2 ("b c d") both lose to
    # doc 0 -> merged span [1, 5); doc 2: "p q r"/"q r p"/"r p q" all
    # keep their first occurrence (pos 0/1/2), repeats at 3..6 merge
    # into [3, 9)
    assert got == {(1, 1, 5, 2), (2, 3, 9, 4)}


def test_strip_duplicate_spans_planted(spark):
    rows = [
        (0, "a b c d e f"),
        (1, "x a b c d y"),
        (2, "p q r p q r p q r"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["text"], r["n_removed_tokens"])
        for r in DS.strip_duplicate_spans(df, window=3).collect()
    }
    assert got == {
        0: ("a b c d e f", 0),  # keeper doc untouched
        1: ("x y", 4),
        2: ("p q r", 6),
    }


def test_duplicate_spans_random_parity(spark):
    """Random small-vocab corpora vs the independent Python oracle —
    spans AND strip reassembly must match exactly."""
    import random

    rng = random.Random(20260817)
    vocab = list("abcde")
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(4, 20))))
        for i in range(40)
    ]
    w = 3
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    want = _py_dup_spans(rows, w)
    got: dict = {}
    for r in DS.duplicate_spans(df, window=w).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"], r["n_dup_windows"])
        )
    assert {k: sorted(v) for k, v in got.items()} == {
        k: sorted(v) for k, v in want.items()
    }

    stripped = {
        r["doc_id"]: (r["text"], r["n_removed_tokens"])
        for r in DS.strip_duplicate_spans(df, window=w).collect()
    }
    for did, text in rows:
        spans = want.get(did, [])
        toks = text.split()
        kept = [
            t for i, t in enumerate(toks)
            if not any(s <= i < e for s, e, _ in spans)
        ]
        assert stripped[did] == (" ".join(kept), sum(e - s for s, e, _ in spans))


def test_dedup_incremental_corpus_free_fast_path(spark):
    """With BOTH stored indexes (signatures + fingerprints) the
    existing corpus text is never needed: existing_docs=None must
    reproduce the default path exactly; missing either index raises."""
    import pytest

    existing = spark.createDataFrame(
        [(0, "alpha bravo charlie delta echo foxtrot golf hotel india juliet"),
         (1, "completely different content about spark physical plans here")],
        ["doc_id", "text"],
    )
    new = spark.createDataFrame(
        [(10, "alpha bravo charlie delta echo foxtrot golf hotel india juliet"),
         (13, "utterly novel sentence with entirely unique vocabulary tokens")],
        ["doc_id", "text"],
    )
    kw = dict(num_hashes=8, bands=4, min_jaccard=0.2,
              hasher=DS._md5_hasher, bucket_by_values=True)
    want = {r["doc_id"]: (r["exact_dup"], r["n_near"], r["kept"])
            for r in DS.dedup_incremental(new, existing, **kw).collect()}

    sigs = DS.minhash_signatures(existing, "doc_id", "text", 8, 3,
                                 DS._md5_hasher).persist()
    fps = existing.select(DS.normalized_fp("text").alias("_fp")).persist()
    got = {r["doc_id"]: (r["exact_dup"], r["n_near"], r["kept"])
           for r in DS.dedup_incremental(
               new, None, existing_sigs=sigs, existing_fps=fps, **kw
           ).collect()}
    assert got == want
    with pytest.raises(ValueError):
        DS.dedup_incremental(new, None, existing_sigs=sigs, **kw)
    sigs.unpersist()
    fps.unpersist()


def test_kmeans_assign_python_parity(spark):
    """Random small corpora: kmeans_assign (quantize → init by md5(id)
    → exact-integer Lloyd with trunc-div centroid means) must equal an
    independent pure-Python run of the same algorithm."""
    import hashlib
    import random

    def py_kmeans(vecs, k, n_assign, scale=1_000_000):
        # quantize like the operator: round() on IEEE doubles
        q = {i: [int(round(x * scale)) for x in v] for i, v in vecs.items()}
        order = sorted(q, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        cents = [(j, list(q[order[j]])) for j in range(k)]

        def assign():
            out = {}
            for i, vec in q.items():
                best = min(
                    (sum((a - b) * (a - b) for a, b in zip(vec, cv)), j)
                    for j, cv in cents
                )
                out[i] = best[1]
            return out

        a = assign()
        for _ in range(n_assign - 1):
            sums, cnts = {}, {}
            for i, c in a.items():
                cnts[c] = cnts.get(c, 0) + 1
                acc = sums.setdefault(c, [0] * len(q[i]))
                for d, x in enumerate(q[i]):
                    acc[d] += x
            cents = [
                (c, [(-(abs(s) // cnts[c]) if s < 0 else s // cnts[c]) for s in sums[c]])
                for c in sorted(sums)
            ]
            a = assign()
        return a

    rng = random.Random(20260817)
    for trial in range(3):
        n, dim, k = 60, 8, 3
        vecs = {
            i: [rng.uniform(-2, 2) for _ in range(dim)] for i in rng.sample(range(10**6), n)
        }
        expected = py_kmeans(vecs, k, n_assign=3)
        df = spark.createDataFrame(
            [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
        )
        got = {
            r["vec_id"]: r["cluster"]
            for r in DS.kmeans_assign(df, k=k, n_assign=3).collect()
        }
        assert got == expected, f"trial {trial}"


def test_semdedup_drops_planted_copies_and_guard(spark):
    """Planted near-copies die inside their cell (originals survive);
    a binding max_cluster_size guard excludes oversized cells from
    pairing entirely (nothing dropped there) instead of going
    quadratic."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = emb.select("vec_id", v.alias("embedding"))
    planted = base.filter(F.col("vec_id") < 3).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.001).alias("embedding"),
    )
    allv = base.unionByName(planted)
    clusters = DS.kmeans_assign(allv, k=3, n_assign=2)
    kept = {r["vec_id"] for r in DS.semdedup_keep(allv, clusters, 0.99).collect()}
    all_ids = {r["vec_id"] for r in allv.select("vec_id").collect()}
    assert kept == all_ids - {100000, 100001, 100002}  # copies die, originals live
    # binding guard: no cell is small enough to pair — nothing dropped
    kept_guarded = {
        r["vec_id"]
        for r in DS.semdedup_keep(allv, clusters, 0.99, max_cluster_size=1).collect()
    }
    assert kept_guarded == all_ids


def test_bm25_python_parity(spark):
    """Random word corpora: bm25_topk must equal an independent pure-
    Python BM25 (Lucene idf variant) on ranking AND micro-quantized
    scores."""
    import math
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    docs = {
        i: " ".join(rng.choice(vocab) for _ in range(rng.randint(5, 40)))
        for i in range(80)
    }
    query = "w0 w1 w2"
    k1, b = 1.2, 0.75

    toks = {i: t.split() for i, t in docs.items()}
    n = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / n
    scores = {}
    for term in query.split():
        df = sum(1 for t in toks.values() if term in t)
        if df == 0:
            continue
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        for i, t in toks.items():
            tf = t.count(term)
            if tf:
                s = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(t) / avgdl))
                scores[i] = scores.get(i, 0.0) + s
    micro = {i: int(round(1e6 * s)) for i, s in scores.items()}
    expected = sorted(micro.items(), key=lambda kv: (-kv[1], kv[0]))[:10]

    from fluent_plugin_opensearch_spark.operators.search import bm25_topk

    df = spark.createDataFrame(list(docs.items()), ["doc_id", "text"])
    got = [
        (r["doc_id"], r["score_micro"])
        for r in bm25_topk(df, query, k=10).orderBy("rank").collect()
    ]
    assert got == expected


def test_log_templates_planted(spark):
    """Digit-bearing tokens collapse to <*>; whitespace normalizes;
    counts and evidence pointers are exact."""
    from fluent_plugin_opensearch_spark.operators.search import log_templates

    rows = [
        ("c1", "GET /api/user/123 took 45ms"),
        ("c2", "GET   /api/user/999 took  7ms"),
        ("c1", "cache miss for key alpha"),
        ("c3", "cache miss for key alpha"),
        ("c4", None),
    ]
    out = {
        r["template"]: (r["n_events"], r["n_sources"], r["first_source"])
        for r in log_templates(
            spark.createDataFrame(rows, ["conv_id", "text"])
        ).collect()
    }
    assert out == {
        "GET <*> took <*>": (2, 2, "c1"),
        "cache miss for key alpha": (2, 2, "c1"),
    }


def test_ivf_kmeans_full_probe_equals_bruteforce(spark):
    """With n_probe == n_cells (probe everything) the IVF result must
    equal a pure-Python brute-force integer-L2 top-k — same
    quantization, same tie-break."""
    import random

    rng = random.Random(11)
    vecs = {i: [rng.uniform(-1, 1) for _ in range(6)] for i in range(50)}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    q = {i: [int(round(x * 1e6)) for x in v] for i, v in vecs.items()}

    def brute(qid, k):
        d = sorted(
            (sum((a - b) * (a - b) for a, b in zip(q[i], q[qid])), i)
            for i in q
            if i != qid
        )
        return [(qid, i, r + 1, dist) for r, (dist, i) in enumerate(d[:k])]

    expected = [t for qid in (0, 1, 2) for t in brute(qid, 5)]
    got = [
        (r["q_id"], r["neighbor_id"], r["rank"], r["dist"])
        for r in DS.ivf_kmeans_topk(
            df, query_ids=[0, 1, 2], k=5, n_cells=3, n_probe=3
        ).orderBy("q_id", "rank").collect()
    ]
    assert got == expected


def test_search_and_kmeans_edge_cases(spark):
    """Edge behavior: a query matching nothing returns an empty frame
    (not an error); k-means with k >= corpus still assigns every
    vector; a single-split table routes everything to that split."""
    import pytest

    from fluent_plugin_opensearch_spark.operators.curation import split_corpus
    from fluent_plugin_opensearch_spark.operators.search import bm25_topk

    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "beta gamma")], ["doc_id", "text"]
    )
    assert bm25_topk(docs, "zzz qqq", k=5).count() == 0
    with pytest.raises(ValueError, match="no tokens"):
        bm25_topk(docs, "!!!", k=5)

    vecs = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(3)], "vec_id long, embedding array<double>"
    )
    out = DS.kmeans_assign(vecs, k=5, n_assign=2)
    assert out.count() == 3  # every vector assigned despite k > n

    one = split_corpus(docs, {"only": 1000})
    assert {r["split"] for r in one.collect()} == {"only"}


def test_tfidf_keywords_python_parity(spark):
    """Random word corpora: tfidf_keywords must equal an independent
    pure-Python smoothed TF-IDF top-k (same quantization, same term
    tie-break)."""
    import math
    import random

    from fluent_plugin_opensearch_spark.operators.search import tfidf_keywords

    rng = random.Random(99)
    vocab = [f"w{i}" for i in range(25)]
    docs = {
        i: " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 30)))
        for i in range(60)
    }
    toks = {i: t.split() for i, t in docs.items()}
    n = len(docs)
    df_cnt: dict[str, int] = {}
    for t in toks.values():
        for term in set(t):
            df_cnt[term] = df_cnt.get(term, 0) + 1
    expected = []
    for i, t in toks.items():
        ws = [
            (int(round(1e6 * t.count(term) * math.log(1 + n / df_cnt[term]))), term)
            for term in set(t)
        ]
        top = sorted(ws, key=lambda x: (-x[0], x[1]))[:3]
        expected.extend((i, term, r + 1, w) for r, (w, term) in enumerate(top))

    df = spark.createDataFrame(list(docs.items()), ["doc_id", "text"])
    got = [
        (r["doc_id"], r["term"], r["rank"], r["w_micro"])
        for r in tfidf_keywords(df, k=3).orderBy("doc_id", "rank").collect()
    ]
    assert got == sorted(expected, key=lambda x: (x[0], x[2]))


def test_bm25_require_all_conjunctive(spark):
    """require_all keeps only docs containing EVERY query term; the
    default (OR) ranks partial matches too."""
    from fluent_plugin_opensearch_spark.operators.search import bm25_topk

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma"),
            (1, "alpha beta"),
            (2, "alpha alpha alpha"),
            (3, "delta"),
        ],
        ["doc_id", "text"],
    )
    both = {r["doc_id"] for r in bm25_topk(docs, "alpha beta", k=10).collect()}
    assert both == {0, 1, 2}
    conj = {
        r["doc_id"]
        for r in bm25_topk(docs, "alpha beta", k=10, require_all=True).collect()
    }
    assert conj == {0, 1}


def test_semdedup_threshold_monotone(spark):
    """A stricter cosine threshold can only keep MORE docs (fewer
    pairs qualify as dups) — the SemDeDup dial is monotone."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = emb.select("vec_id", v.alias("embedding"))
    planted = base.filter(F.col("vec_id") < 3).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.01).alias("embedding"),
    )
    allv = base.unionByName(planted)
    clusters = DS.kmeans_assign(allv, k=3, n_assign=2)
    loose = {r["vec_id"] for r in DS.semdedup_keep(allv, clusters, 0.3).collect()}
    strict = {r["vec_id"] for r in DS.semdedup_keep(allv, clusters, 0.999).collect()}
    assert loose <= strict  # stricter threshold keeps a superset
    planted_ids = {100000, 100001, 100002}
    assert planted_ids.isdisjoint(strict)  # near-copies die even at 0.999
    assert len(loose) < len(strict)  # 0.3 also collapses merely-similar pairs
