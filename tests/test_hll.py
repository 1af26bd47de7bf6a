"""Portable HyperLogLog tests (plans/metrics.py:hll_*).

The md5 chain is parity-checked register-for-register and
estimate-for-estimate against an INDEPENDENT pure-Python
reimplementation (hashlib md5, no Spark expressions shared), the
register table is proven mergeable (halves max-merged == whole), both
hashers must meet the m=4096 accuracy bound on both sides of the
linear-counting switch, and the plan is pinned Python-free.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from fluent_plugin_opensearch_spark.plans.metrics import (
    HLL_EST_NUM,
    hll_distinct,
    hll_estimate,
    hll_registers,
    hll_xxhash,
)

M = 4096
W = 48


def _py_hll(keys):
    """Independent reference: same algorithm, hashlib-only."""
    regs: dict[int, int] = {}
    for k in keys:
        h = int(hashlib.md5(k.encode()).hexdigest()[:15], 16)
        idx, w = h % M, h // M
        rho = (W + 1) if w == 0 else (W + 1 - w.bit_length())
        regs[idx] = max(regs.get(idx, 0), rho)
    z_scaled = sum(1 << (50 - r) for r in regs.values()) + (M - len(regs)) * (1 << 50)
    e_raw = HLL_EST_NUM / z_scaled
    used = len(regs)
    if e_raw <= 2.5 * M and used < M:
        est = M * math.log(M / (M - used))
    else:
        est = e_raw
    return regs, used, int(round(est))


def _keys_df(spark, keys, group="g1"):
    return spark.createDataFrame([(group, k) for k in keys], "grp string, k string")


def test_md5_chain_matches_python_reference(spark):
    # 20000 distinct keys (some repeated) → raw-branch group (the LC
    # switch sits at E ≈ 2.5·m = 10240); 300 keys → LC-branch group.
    big = [f"conv-{i}" for i in range(20_000)]
    small = [f"s-{i}" for i in range(300)]
    df = _keys_df(spark, big + big[:500], "big").union(
        _keys_df(spark, small + small[:50], "small")
    )
    got = {
        r["grp"]: r
        for r in hll_distinct(df, "k", ["grp"]).collect()
    }
    for grp, keys, n_rows in (("big", big, 20_500), ("small", small, 350)):
        regs, used, est = _py_hll(keys)
        assert got[grp]["n_rows"] == n_rows
        assert got[grp]["used_registers"] == used
        assert got[grp]["est_distinct"] == est
    # register table itself matches the reference exactly
    regs, _, _ = _py_hll(big)
    spark_regs = {
        r["idx"]: r["rho"]
        for r in hll_registers(_keys_df(spark, big, "big"), "k", ["grp"]).collect()
    }
    assert spark_regs == regs


def test_md5_chain_random_and_unicode_property(spark):
    """Seeded-random multiplicities across several groups, including
    non-ASCII keys (md5 runs over UTF-8 bytes in all three engines) —
    estimate and register parity must hold for every group."""
    import random

    rng = random.Random(20260819)
    scripts = ["conv", "диалог", "会話", "대화", "café"]
    keys_by_group: dict = {}
    rows = []
    for g in range(5):
        n = rng.randint(1, 2000)
        keys = [f"{scripts[g]}-{i}" for i in range(n)]
        keys_by_group[f"g{g}"] = keys
        for k in keys:
            rows += [(f"g{g}", k)] * rng.randint(1, 3)
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "grp string, k string")
    got = {r["grp"]: r for r in hll_distinct(df, "k", ["grp"]).collect()}
    for g, keys in keys_by_group.items():
        _, used, est = _py_hll(keys)
        assert got[g]["used_registers"] == used, g
        assert got[g]["est_distinct"] == est, g


def test_register_tables_merge(spark):
    keys = [f"conv-{i}" for i in range(3000)]
    whole = _keys_df(spark, keys)
    h1, h2 = _keys_df(spark, keys[:1800]), _keys_df(spark, keys[1500:])
    merged = (
        hll_registers(h1, "k", ["grp"])
        .union(hll_registers(h2, "k", ["grp"]))
        .groupBy("grp", "idx")
        .agg(F.max("rho").alias("rho"), F.sum("cnt").alias("cnt"))
    )
    est_merged = hll_estimate(merged, ["grp"]).collect()[0]
    est_whole = hll_estimate(hll_registers(whole, "k", ["grp"]), ["grp"]).collect()[0]
    assert est_merged["est_distinct"] == est_whole["est_distinct"]
    assert est_merged["used_registers"] == est_whole["used_registers"]
    # cnt sums count re-delivered rows (1800 + 1500), not distinct —
    # by design: merge is for sketch state, n_rows reports scan volume
    assert est_merged["n_rows"] == 3300


def test_accuracy_both_hashers_both_branches(spark):
    # m=4096 → relative std error ~1.04/sqrt(m) = 1.6%; assert 5%.
    for n in (400, 30_000):  # LC branch / raw branch
        keys = [f"conv-{i}" for i in range(n)]
        df = _keys_df(spark, keys)
        for hasher in (None, hll_xxhash):
            kw = {} if hasher is None else {"hasher": hasher}
            est = hll_distinct(df, "k", ["grp"], **kw).collect()[0]["est_distinct"]
            assert abs(est - n) / n < 0.05, (n, hasher, est)


def test_hll_stream_matches_batch(spark, tmp_path):
    """Streamed register maintenance (update-mode cumulative upserts)
    finalizes to EXACTLY the batch hll_distinct answer across a
    multi-batch, time-unordered drain — same register table, same
    estimates, per day."""
    from fluent_plugin_opensearch_spark.sinks.writer import SinkCatalog
    from fluent_plugin_opensearch_spark.sources.transcripts import load_transcripts
    from fluent_plugin_opensearch_spark.streaming.stream import (
        TRANSCRIPTS_SCHEMA,
        hll_estimate_from_catalog,
        hll_registers_stream,
    )

    from .conftest import SF_SMOKE

    src_dir = str(tmp_path / "hll_src")
    t = load_transcripts(spark, SF_SMOKE)
    t.repartition(8).write.parquet(src_dir)
    cat = SinkCatalog(str(tmp_path / "hll_wh"))
    source = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", 2)  # force a multi-batch drain
        .parquet(src_dir)
    )
    q = hll_registers_stream(
        spark, source, cat, str(tmp_path / "hll_ckpt"), watermark="45 days"
    )
    q.awaitTermination(180)

    got = {
        r["day"]: (r["n_rows"], r["used_registers"], r["est_distinct"])
        for r in hll_estimate_from_catalog(spark, cat).collect()
    }
    batch = t.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
    want = {
        r["day"]: (r["n_rows"], r["used_registers"], r["est_distinct"])
        for r in hll_distinct(batch, "conv_id", ["day"]).collect()
    }
    assert got == want


def test_plan_is_python_free_and_single_wide_shuffle(spark):
    df = _keys_df(spark, [f"c{i}" for i in range(50)])
    plan = (
        hll_distinct(df, "k", ["grp"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# --- portable count-min sketch ---------------------------------------------

def _cms_py_cells(keys):
    from collections import Counter

    from fluent_plugin_opensearch_spark.plans.metrics import CMS_DEPTH, CMS_WIDTH

    cells: dict = Counter()
    for k in keys:
        for r in range(CMS_DEPTH):
            b = int(hashlib.md5(f"{k}#{r}".encode()).hexdigest()[:15], 16) % CMS_WIDTH
            cells[(r, b)] += 1
    return cells


def test_cms_python_parity_and_upper_bound(spark):
    from collections import Counter

    from fluent_plugin_opensearch_spark.plans.metrics import (
        CMS_DEPTH,
        CMS_WIDTH,
        cms_estimate,
        cms_table,
    )

    keys = []
    for i in range(200):  # skewed multiplicities 1..17
        keys += [f"conv-{i}"] * (1 + (i % 17))
    df = _keys_df(spark, keys)
    table = cms_table(df, "k")
    probe_keys = [f"conv-{i}" for i in range(0, 200, 25)]
    probes = spark.createDataFrame([(k,) for k in probe_keys], "k string")
    got = {r["k"]: r["est_count"] for r in cms_estimate(table, probes, "k").collect()}

    cells, true = _cms_py_cells(keys), Counter(keys)
    assert set(got) == set(probe_keys)
    for k, est in got.items():
        ref = min(
            cells[(r, int(hashlib.md5(f"{k}#{r}".encode()).hexdigest()[:15], 16) % CMS_WIDTH)]
            for r in range(CMS_DEPTH)
        )
        assert est == ref  # full-chain parity with the hashlib reference
        assert est >= true[k]  # the CMS guarantee: never an undercount
    # cell table is bounded by d*w whatever the cardinality
    assert table.count() <= CMS_DEPTH * CMS_WIDTH


def test_cms_stream_matches_batch(spark, tmp_path):
    """Streamed CMS cells (update-mode cumulative upserts, state
    bounded at d·w by construction) finalize to EXACTLY the batch
    cms_table answer across a multi-batch drain."""
    from fluent_plugin_opensearch_spark.plans.metrics import cms_estimate, cms_table
    from fluent_plugin_opensearch_spark.sinks.writer import SinkCatalog
    from fluent_plugin_opensearch_spark.sources.transcripts import load_transcripts
    from fluent_plugin_opensearch_spark.streaming.stream import (
        TRANSCRIPTS_SCHEMA,
        cms_cells_stream,
        cms_estimate_from_catalog,
    )

    from .conftest import SF_SMOKE

    src_dir = str(tmp_path / "cms_src")
    t = load_transcripts(spark, SF_SMOKE)
    t.repartition(8).write.parquet(src_dir)
    cat = SinkCatalog(str(tmp_path / "cms_wh"))
    source = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", 2)
        .parquet(src_dir)
    )
    q = cms_cells_stream(spark, source, cat, str(tmp_path / "cms_ckpt"))
    q.awaitTermination(180)

    probes = t.select("conv_id").distinct().orderBy(F.md5("conv_id")).limit(8)
    got = {
        r["conv_id"]: r["est_count"]
        for r in cms_estimate_from_catalog(spark, cat, probes, "conv_id").collect()
    }
    want = {
        r["conv_id"]: r["est_count"]
        for r in cms_estimate(cms_table(t, "conv_id"), probes, "conv_id").collect()
    }
    assert got == want and len(got) == 8


def test_cms_tables_merge_by_sum(spark):
    from fluent_plugin_opensearch_spark.plans.metrics import cms_estimate, cms_table

    keys = [f"conv-{i % 300}" for i in range(2000)]
    whole, h1, h2 = keys, keys[:1200], keys[1200:]
    merged = (
        cms_table(_keys_df(spark, h1), "k")
        .union(cms_table(_keys_df(spark, h2), "k"))
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    probes = spark.createDataFrame([(f"conv-{i}",) for i in range(0, 300, 40)], "k string")
    got_m = {r["k"]: r["est_count"] for r in cms_estimate(merged, probes, "k").collect()}
    got_w = {
        r["k"]: r["est_count"]
        for r in cms_estimate(cms_table(_keys_df(spark, whole), "k"), probes, "k").collect()
    }
    assert got_m == got_w
