"""Corpus-curation operators (operators/curation.py): PII redaction,
benchmark contamination, deterministic samplers, sequence packing,
hourly heavy hitters — planted-value unit tests plus the scale-shape
assertions (blocked prefix-sum equivalence, broadcast bench join,
no Python in any plan)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from fluent_plugin_opensearch_spark.operators import curation as CU
from fluent_plugin_opensearch_spark.operators.sessions import top_k_per_hour

from .conftest import SF_SMOKE


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

def test_redact_pii_planted(spark):
    rows = [
        (0, "mail me at jane.doe+spam@corp.example.org today"),
        (1, "server 192.168.1.254 answered 10.0.0.7"),
        (2, "ssn 123-45-6789 phone 555-123-4567"),
        (3, "clean text with numbers 12345 and 1.5 ratios"),
        (4, "two mails: a@b.io c.d@e-f.co"),
    ]
    out = {
        r["doc_id"]: r
        for r in CU.redact_pii(spark.createDataFrame(rows, ["doc_id", "text"])).collect()
    }
    assert out[0]["redacted"] == "mail me at <EMAIL> today"
    assert out[0]["n_email"] == 1
    assert out[1]["redacted"] == "server <IP> answered <IP>"
    assert out[1]["n_ip"] == 2
    assert out[2]["redacted"] == "ssn <SSN> phone <PHONE>"
    assert (out[2]["n_ssn"], out[2]["n_phone"]) == (1, 1)
    # no false positives: decimals / plain ints untouched
    assert out[3]["redacted"] == rows[3][1]
    assert sum(out[3][c] for c in ("n_email", "n_ip", "n_ssn", "n_phone")) == 0
    assert out[4]["n_email"] == 2 and "<EMAIL> <EMAIL>" in out[4]["redacted"]


def test_redact_pii_extended_classes(spark):
    """r4 additions (VERDICT r3 #5): credit-card digit-run masking,
    international phone, IPv6 — per-class planted spans, chain-order
    interactions, and no-false-positive guards."""
    rows = [
        (0, "pay with 4111 1111 1111 1111 thanks"),          # 4-4-4-4
        (1, "amex 3782 822463 10005 and visa 4111111111111111"),  # 4-6-5 + 16 contiguous
        (2, "dial +1 202 555 0199 or +44-20-7946-0958"),
        (3, "node 2001:db8:85a3::8a2e:370:7334 and fe80::1"),
        (4, "full 2001:0db8:0000:0000:0000:ff00:0042:8329 up"),
        # interactions: US-phone tail inside an intl number masks whole
        (5, "cell +1-555-123-4567 ok"),
        # adjacent ssn+phone must NOT merge into a fake card
        (6, "ssn 123-45-6789 555-123-4567 end"),
        # false positives: 12-digit run (too short for cc), order id
        (7, "order 123456789012 ref 12:30:45"),
    ]
    out = {
        r["doc_id"]: r
        for r in CU.redact_pii(spark.createDataFrame(rows, ["doc_id", "text"])).collect()
    }
    assert out[0]["redacted"] == "pay with <CC> thanks" and out[0]["n_cc"] == 1
    assert out[1]["redacted"] == "amex <CC> and visa <CC>" and out[1]["n_cc"] == 2
    assert out[2]["redacted"] == "dial <PHONE_INTL> or <PHONE_INTL>"
    assert out[2]["n_intl_phone"] == 2
    assert out[3]["redacted"] == "node <IPV6> and <IPV6>"  # fe80::1 = compressed form
    assert out[3]["n_ipv6"] == 2
    assert out[4]["redacted"] == "full <IPV6> up" and out[4]["n_ipv6"] == 1
    assert out[5]["redacted"] == "cell <PHONE_INTL> ok"
    # nested span counts for both classes (documented count semantics)
    assert out[5]["n_intl_phone"] == 1 and out[5]["n_phone"] == 1
    assert out[6]["redacted"] == "ssn <SSN> <PHONE> end" and out[6]["n_cc"] == 0
    assert out[7]["redacted"] == rows[7][1]
    assert sum(out[7][f"n_{n}"] for n, _, _ in CU.PII_PATTERNS) == 0


def test_redact_pii_is_pure_codegen(spark):
    df = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    plan = _plan(CU.redact_pii(df))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan  # projection only — no shuffle


# ---------------------------------------------------------------------------
# Contamination
# ---------------------------------------------------------------------------

def test_contamination_planted(spark):
    bench_span = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (0, f"prefix words {bench_span} suffix words here"),  # hit
            (1, "totally unrelated text with many words " * 3),  # clean
            (2, f"{bench_span} at the very start"),  # hit at offset 0
            (3, "alpha beta gamma delta epsilon zeta eta"),  # only 7-gram: no hit
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame([(100, bench_span)], ["bench_id", "text"])
    got = {r["doc_id"]: r for r in CU.contamination_check(docs, bench, n=8).collect()}
    assert set(got) == {0, 2}
    assert got[0]["n_bench_hits"] == 1 and got[0]["first_bench_id"] == 100
    # real eval suites key items with STRING ids — must not cast-crash
    # under ANSI mode (first_bench_id keeps the bench id's own type)
    sb = spark.createDataFrame([("mmlu-0042", bench_span)], ["bench_id", "text"])
    got_s = {r["doc_id"]: r for r in CU.contamination_check(docs, sb, n=8).collect()}
    assert got_s[0]["first_bench_id"] == "mmlu-0042"


def test_contamination_bench_side_broadcast(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    bench = docs.limit(5).select(F.col("doc_id").alias("bench_id"), "text")
    plan = _plan(CU.contamination_check(docs, bench, n=8))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# Samplers
# ---------------------------------------------------------------------------

def test_stratified_sample_monotone_and_layout_stable(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    lo = CU.stratified_sample(docs, {"src0": 200}, default_permille=100)
    hi = CU.stratified_sample(docs, {"src0": 700}, default_permille=400)
    lo_ids = {r["doc_id"] for r in lo.select("doc_id").collect()}
    hi_ids = {r["doc_id"] for r in hi.select("doc_id").collect()}
    assert lo_ids < hi_ids  # raising every rate keeps a strict superset
    # partition-layout independence: same kept set after repartition
    re_ids = {
        r["doc_id"]
        for r in CU.stratified_sample(docs.repartition(7), {"src0": 200}, default_permille=100)
        .select("doc_id")
        .collect()
    }
    assert re_ids == lo_ids


def test_quota_top_per_stratum_bounds(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    out = CU.quota_top_per_stratum(docs, quota=4).collect()
    per = {}
    for r in out:
        per.setdefault(r["source"], []).append(r)
    n_sources = docs.select("source").distinct().count()
    assert len(per) == n_sources
    for rows in per.values():
        assert 1 <= len(rows) <= 4
        assert sorted(r["rank"] for r in rows) == list(range(1, len(rows) + 1))
        # ranks follow n_chars desc
        ordered = sorted(rows, key=lambda r: r["rank"])
        chars = [r["n_chars"] for r in ordered]
        assert chars == sorted(chars, reverse=True)


# ---------------------------------------------------------------------------
# Sequence packing
# ---------------------------------------------------------------------------

def test_pack_sequences_blocked_prefix_sum_equivalence(spark):
    """The two-phase blocked prefix-sum must be exact: identical output
    for any block size (1 block ≡ many blocks), including sparse /
    shuffled ids."""
    rng = random.Random(7)
    ids = rng.sample(range(0, 10_000), 300)  # sparse, unordered ids
    rows = [(i, "tok " * rng.randint(0, 50)) for i in ids]
    docs = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(5)
    outs = []
    for bs in (17, 1_000_000):
        out = CU.pack_sequences(docs, budget=64, block_size=bs)
        outs.append(sorted(tuple(r) for r in out.collect()))
    assert outs[0] == outs[1]


def test_pack_sequences_invariants(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    rows = sorted(CU.pack_sequences(docs, budget=100, block_size=50).collect(),
                  key=lambda r: r["doc_id"])
    off = 0
    for r in rows:
        assert r["start_off"] == off  # exclusive prefix sum in id order
        off += r["n_tokens"]
        assert r["first_pack"] == r["start_off"] // 100
        assert r["last_pack"] >= r["first_pack"]
        assert r["n_packs"] == r["last_pack"] - r["first_pack"] + 1
        # a doc never spans more windows than its token count requires
        assert r["n_packs"] <= max(r["n_tokens"], 1) // 100 + 2


# ---------------------------------------------------------------------------
# Hourly heavy hitters
# ---------------------------------------------------------------------------

def test_top_k_per_hour_matches_manual(spark):
    from fluent_plugin_opensearch_spark import load_transcripts

    t = load_transcripts(spark, SF_SMOKE)
    got = top_k_per_hour(t, k=2).collect()
    manual = (
        t.groupBy(F.date_format("ts", "yyyy-MM-dd HH").alias("hour"), "conv_id")
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .collect()
    )
    best = {}
    for r in manual:
        best.setdefault(r["hour"], []).append((-r["n_turns"], r["conv_id"]))
    for hour, entries in best.items():
        want = sorted(entries)[:2]
        have = sorted(
            (-r["n_turns"], r["conv_id"]) for r in got if r["hour"] == hour
        )
        assert have == want, hour


# ---------------------------------------------------------------------------
# Composed clean-corpus pipeline
# ---------------------------------------------------------------------------

def test_curate_corpus_redact_then_decontaminate(spark):
    """Composition semantics: (1) docs differing ONLY in PII spans
    dedup together after redaction (redact-before-fingerprint); (2) a
    survivor sharing an 8-gram with a bench item is dropped."""
    from fluent_plugin_opensearch_spark.operators.dataset import curate_corpus

    base = ("spark rows tables merge hash value scan filter join sort "
            "group window batch stream plan stage task core node disk " * 3)
    bench_span = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (0, base + " mail jane@a.io"),      # PII twin of 1 (keep: min id)
            (1, base + " mail bob@b.org"),       # redacts to same text as 0
            (2, f"{base} {bench_span} unique tail words here"),  # contaminated
            (3, "distinct healthy document " + base.replace("spark", "flink")),
        ],
        ["doc_id", "text"],
    )
    red = CU.redact_pii(docs).select("doc_id", F.col("redacted").alias("text"))
    bench = spark.createDataFrame([(9, bench_span)], ["bench_id", "text"])
    kept = {
        r["doc_id"]
        for r in curate_corpus(
            red, min_tokens=10, min_chars=50, bench=bench, contamination_n=8
        ).collect()
    }
    assert 0 in kept      # twin winner survives
    assert 1 not in kept  # exact-dup after redaction (same masked text)
    assert 2 not in kept  # decontaminated
    assert 3 in kept


def test_quota_prefilter_exact_equivalence(spark):
    """The two-phase (stratum, partition)-local top-k prefilter must
    return EXACTLY the single-window result, on skewed strata with
    ties, across partition layouts."""
    rng = random.Random(11)
    rows = [(i, "hot", rng.randint(0, 20)) for i in range(2000)]  # hot stratum, many ties
    rows += [(10_000 + i, f"s{i % 5}", rng.randint(0, 1000)) for i in range(300)]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])
    for layout in (docs, docs.repartition(13)):
        plain = sorted(tuple(r) for r in CU.quota_top_per_stratum(layout, quota=7).collect())
        fast = sorted(
            tuple(r)
            for r in CU.quota_top_per_stratum(layout, quota=7, prefilter=True).collect()
        )
        assert plain == fast


def test_pack_sequences_per_stratum_independence(spark):
    """Per-stratum packing must equal packing each stratum separately."""
    rng = random.Random(3)
    rows = [(i, f"s{i % 3}", "tok " * rng.randint(0, 30)) for i in range(200)]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"]).repartition(4)
    joint = sorted(
        tuple(r)
        for r in CU.pack_sequences(docs, budget=64, block_size=13, stratum_col="source").collect()
    )
    separate = []
    for s in ("s0", "s1", "s2"):
        for r in CU.pack_sequences(
            docs.filter(F.col("source") == s), budget=64, block_size=13
        ).collect():
            separate.append((s, *tuple(r)))
    assert joint == sorted(separate)


# ---------------------------------------------------------------------------
# Repetition quality signals (Gopher-style, r4)
# ---------------------------------------------------------------------------

def test_repetition_signals_planted(spark):
    rows = [
        (0, "a b\na b\nc d"),   # "a b" line duplicated; bigram "a b" x2
        (1, "x y z"),           # nothing repeats
        (2, "solo"),            # single token: no bigrams at all
        (3, "p\np\np"),         # all lines identical; bigram "p p" x2
    ]
    out = {
        r["doc_id"]: r
        for r in CU.repetition_signals(spark.createDataFrame(rows, ["doc_id", "text"])).collect()
    }
    assert (out[0]["n_lines"], out[0]["n_dup_lines"], out[0]["dup_line_chars"]) == (3, 2, 6)
    # tokens cross line breaks: a b a b c d -> 5 bigrams, "a b" twice
    assert (out[0]["n_bigrams"], out[0]["n_dup_bigrams"], out[0]["top_bigram_n"]) == (5, 2, 2)
    assert (out[1]["n_lines"], out[1]["n_dup_lines"], out[1]["dup_line_chars"]) == (1, 0, 0)
    assert (out[1]["n_bigrams"], out[1]["n_dup_bigrams"], out[1]["top_bigram_n"]) == (2, 0, 1)
    assert (out[2]["n_bigrams"], out[2]["n_dup_bigrams"], out[2]["top_bigram_n"]) == (0, 0, 0)
    assert (out[3]["n_lines"], out[3]["n_dup_lines"], out[3]["dup_line_chars"]) == (3, 3, 3)
    assert (out[3]["n_bigrams"], out[3]["n_dup_bigrams"], out[3]["top_bigram_n"]) == (2, 2, 2)


def test_repetition_signals_random_parity(spark):
    """Random docs vs an independent pure-Python computation (the
    property-test pattern that caught two real r2 bugs)."""
    import re
    from collections import Counter

    rng = random.Random(41)
    vocab = ["aa", "bb", "cc", "dd"]
    rows = []
    for i in range(60):
        n_ln = rng.randint(1, 6)
        lines = [" ".join(rng.choices(vocab, k=rng.randint(1, 4))) for _ in range(n_ln)]
        rows.append((i, "\n".join(lines)))
    out = {
        r["doc_id"]: r
        for r in CU.repetition_signals(spark.createDataFrame(rows, ["doc_id", "text"])).collect()
    }
    for i, text in rows:
        lc = Counter(text.split("\n"))
        toks = re.split(r"\s+", text.strip())
        bc = Counter(zip(toks, toks[1:]))
        r = out[i]
        assert r["n_lines"] == sum(lc.values())
        assert r["n_dup_lines"] == sum(c for c in lc.values() if c > 1)
        assert r["dup_line_chars"] == sum(c * len(l) for l, c in lc.items() if c > 1)
        assert r["n_bigrams"] == sum(bc.values())
        assert r["n_dup_bigrams"] == sum(c for c in bc.values() if c > 1)
        assert r["top_bigram_n"] == (max(bc.values()) if bc else 0)


# ---------------------------------------------------------------------------
# Cross-document paragraph dedup (keep-first, r4)
# ---------------------------------------------------------------------------

def test_paragraph_dedup_planted(spark):
    rows = [
        (0, "header\nalpha beta\nfooter"),
        (1, "header\ngamma delta\nfooter"),   # header+footer seen in doc 0
        (2, "header\nheader\nunique"),        # in-doc repeat: 2nd "header" dropped too
        (3, "alpha beta"),                    # whole doc is a dup paragraph
    ]
    out = {
        r["doc_id"]: r
        for r in CU.paragraph_dedup(spark.createDataFrame(rows, ["doc_id", "text"])).collect()
    }
    assert out[0]["text"] == "header\nalpha beta\nfooter"
    assert (out[0]["n_pars"], out[0]["n_pars_kept"]) == (3, 3)
    assert out[1]["text"] == "gamma delta"
    assert (out[1]["n_pars"], out[1]["n_pars_kept"]) == (3, 1)
    assert out[2]["text"] == "unique"
    assert (out[2]["n_pars"], out[2]["n_pars_kept"]) == (3, 1)
    assert out[3]["text"] == ""
    assert (out[3]["n_pars"], out[3]["n_pars_kept"]) == (1, 0)


def test_paragraph_dedup_random_parity(spark):
    """Random corpora vs an independent Python keep-first computation;
    also checks total-paragraph conservation (each distinct paragraph
    survives exactly once corpus-wide)."""
    rng = random.Random(17)
    paras = [f"p{i}" for i in range(12)]
    rows = [
        (i, "\n".join(rng.choices(paras, k=rng.randint(1, 6)))) for i in range(50)
    ]
    out = {
        r["doc_id"]: r
        for r in CU.paragraph_dedup(spark.createDataFrame(rows, ["doc_id", "text"])).collect()
    }
    seen: set[str] = set()
    for i, text in rows:  # rows are in doc_id order = keep-first order
        kept = []
        for p in text.split("\n"):
            if p not in seen:
                seen.add(p)
                kept.append(p)
        r = out[i]
        assert r["text"] == "\n".join(kept)
        assert r["n_pars"] == len(text.split("\n"))
        assert r["n_pars_kept"] == len(kept)
    total_kept = sum(r["n_pars_kept"] for r in out.values())
    assert total_kept == len(seen)


# ---------------------------------------------------------------------------
# DSIR importance resampling (r4)
# ---------------------------------------------------------------------------

def _dsir_expected(rows, target_ids, buckets):
    """Independent Python computation of dsir_scores with the md5
    hasher — multiset unigram+bigram features, Laplace α=0.5,
    micro-int quantized per-bucket weights (round half away from
    zero, matching Spark/DuckDB round())."""
    import hashlib
    import math

    def bucket(ng):
        return int(hashlib.md5((ng + "#dsir").encode()).hexdigest()[:15], 16) % buckets

    def feats(text):
        t = text.strip().split()
        return [bucket(w) for w in t] + [
            bucket(f"{t[i]} {t[i+1]}") for i in range(len(t) - 1)
        ]

    q: dict[int, int] = {}
    p: dict[int, int] = {}
    doc_feats = {}
    for i, text in rows:
        fs = feats(text)
        doc_feats[i] = fs
        for b in fs:
            q[b] = q.get(b, 0) + 1
            if i in target_ids:
                p[b] = p.get(b, 0) + 1
    Q, P = sum(q.values()), sum(p.values())

    def away(x):
        return int(math.copysign(math.floor(abs(x) + 0.5), x))

    w = {
        b: away(
            1e6
            * math.log(
                ((p.get(b, 0) + 0.5) * (Q + 0.5 * buckets))
                / ((qn + 0.5) * (P + 0.5 * buckets))
            )
        )
        for b, qn in q.items()
    }
    return {
        i: (len(fs), sum(w[b] for b in fs)) for i, fs in doc_feats.items() if fs
    }


def test_dsir_scores_target_affinity(spark):
    """Docs made of target-domain words must outscore docs made of
    off-domain words; mixed docs land between."""
    rows = [
        (0, "alpha beta alpha beta gamma"),   # target
        (1, "alpha gamma beta alpha beta"),   # target
        (2, "alpha beta gamma alpha"),        # on-domain, not in target set
        (3, "zeta eta theta iota kappa"),     # off-domain
        (4, "alpha beta zeta eta"),           # mixed
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    target = docs.filter(F.col("doc_id") < 2)
    out = {
        r["doc_id"]: r["dsir_score_micro"]
        for r in CU.dsir_scores(docs, target, buckets=512, hasher=CU._dsir_md5_hasher).collect()
    }
    assert out[2] > out[4] > out[3]
    assert out[0] > out[3] and out[1] > out[3]


def test_dsir_scores_random_parity(spark):
    """Random corpora vs the independent Python computation —
    integer-exact (the whole point of micro-unit quantization)."""
    rng = random.Random(23)
    vocab_t = [f"t{i}" for i in range(15)]
    vocab_o = [f"o{i}" for i in range(15)]
    rows = []
    for i in range(60):
        vocab = vocab_t if i % 3 == 0 else (vocab_o if i % 3 == 1 else vocab_t + vocab_o)
        rows.append((i, " ".join(rng.choices(vocab, k=rng.randint(1, 12)))))
    target_ids = {i for i in range(60) if i % 5 == 0}
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    target = docs.filter(F.col("doc_id") % 5 == 0)
    got = {
        r["doc_id"]: (r["n_feats"], r["dsir_score_micro"])
        for r in CU.dsir_scores(docs, target, buckets=64, hasher=CU._dsir_md5_hasher).collect()
    }
    assert got == _dsir_expected(rows, target_ids, 64)


# ---------------------------------------------------------------------------
# Training-set assembly (r4): token-budget mixture + shard order
# ---------------------------------------------------------------------------

def _h60(salt: str, key) -> int:
    import hashlib

    return int(hashlib.md5((salt + str(key)).encode()).hexdigest()[:15], 16)


def _py_tokens(text: str) -> int:
    import re

    return len(re.findall(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]", text))


def test_mixture_plan_rates(spark):
    """Rates follow the integer formula exactly; an overshooting weight
    caps at 1000 (stratum kept whole); unlisted strata get rate 0."""
    rows = [(i, "tok " * 10, f"s{i % 3}") for i in range(30)]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    plan = {
        r["source"]: r
        for r in CU.mixture_plan(docs, {"s0": 500, "s1": 5000}, budget_tokens=100).collect()
    }
    assert plan["s0"]["tok_total"] == 100  # 10 docs x 10 word tokens
    assert plan["s0"]["rate_permille"] == (100 * 500) // 100
    assert plan["s1"]["rate_permille"] == 1000  # capped: desired > available
    assert plan["s2"]["rate_permille"] == 0  # weight 0 -> dropped


def test_mixture_sample_python_parity(spark):
    """Kept set matches an independent Python md5 simulation of the
    full chain (token totals -> integer rates -> bucket filter), and is
    stable under repartitioning (no RNG, no partition dependence)."""
    rng = random.Random(23)
    rows = [
        (
            i,
            " ".join("w%d" % rng.randint(0, 50) for _ in range(rng.randint(3, 30))),
            f"s{i % 4}",
        )
        for i in range(80)
    ]
    w = {"s0": 400, "s1": 900, "s2": 2500}
    budget = 300
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    kept = sorted(r["doc_id"] for r in CU.mixture_sample(docs, w, budget).collect())
    tot: dict[str, int] = {}
    for _, text, s in rows:
        tot[s] = tot.get(s, 0) + _py_tokens(text)
    rates = {
        s: 0 if tot[s] == 0 else min(1000, (budget * w.get(s, 0)) // tot[s]) for s in tot
    }
    exp = sorted(i for i, _, s in rows if _h60("mix#0", i) % 1000 < rates[s])
    assert kept == exp
    re_kept = sorted(
        r["doc_id"] for r in CU.mixture_sample(docs.repartition(7), w, budget).collect()
    )
    assert re_kept == kept


def test_training_shards_python_parity(spark):
    """(shard, pos) for every doc matches an independent Python md5
    simulation; a new epoch yields a different permutation."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    out = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in CU.training_shards(docs, n_shards=4, epoch=2).collect()
    }
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    hk = {i: _h60("ord#2#", i) for i in ids}
    by_shard: dict[int, list[int]] = {}
    for i in ids:
        by_shard.setdefault(hk[i] % 4, []).append(i)
    for s, members in by_shard.items():
        members.sort(key=lambda i: (hk[i], i))
        for pos, i in enumerate(members):
            assert out[i] == (s, pos)
    assert len(out) == len(ids)
    out3 = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in CU.training_shards(docs, n_shards=4, epoch=3).collect()
    }
    assert out3 != out


def test_build_training_set_job(spark, tmp_path, capsys):
    """End-to-end assembly job: mixture -> shard shuffle -> partitioned
    write (+ pack sidecar). Shard membership and within-shard order
    must replay the operators exactly; positions are dense per shard."""
    import json

    from jobs.build_training_set import main as job_main

    out = str(tmp_path / "ts")
    weights = {"src0": 2000, "src1": 2000, "src2": 2000}
    budget = 2000
    job_main([
        "--input", f"{SF_SMOKE}/documents.parquet", "--output", out,
        "--weights", json.dumps(weights), "--budget-tokens", str(budget),
        "--n-shards", "4", "--epoch", "1", "--pack-budget", "256",
    ])
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["kept_docs"] > 0
    assert stats["n_shards_written"] <= 4
    assert {r["source"] for r in stats["mixture_plan"]} == {
        f"src{i}" for i in range(20)
    }

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    kept = CU.mixture_sample(docs, weights, budget)
    order = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in CU.training_shards(kept, 4, epoch=1).collect()
    }
    back = spark.read.parquet(f"{out}/shards")
    got = {r["doc_id"]: (r["shard"], r["pos"]) for r in back.collect()}
    assert got == order
    by_shard: dict[int, list[int]] = {}
    for _, (s, pos) in got.items():
        by_shard.setdefault(s, []).append(pos)
    for poss in by_shard.values():
        assert sorted(poss) == list(range(len(poss)))  # dense order
    assert spark.read.parquet(f"{out}/packs").count() == len(got)


def test_build_training_set_job_quality_stages(spark, tmp_path, capsys):
    """r5 (VERDICT r4 #7): the composed pipeline — split → decontam →
    LM-CE quality gate → DSIR target selection → mixture → shards —
    runs as ONE CLI and reproduces the standalone operators' doc sets
    and counts exactly."""
    import json

    from jobs.build_training_set import main as job_main

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    target_path = str(tmp_path / "target")
    docs.filter(F.col("source") == "src0").select("doc_id", "text").write.parquet(
        target_path
    )
    splits = {"train": 900, "val": 100}
    # threshold from the standalone operator: median CE over the
    # decontaminated train split (some docs drop, some survive)
    tagged = CU.split_corpus(docs, splits)
    train = tagged.filter(F.col("split") == "train").drop("split")
    holdout = tagged.filter(F.col("split") != "train")
    contam = CU.contamination_check(
        train,
        holdout.select(F.col("doc_id").alias("bench_id"), "text"),
        n=8,
        broadcast_bench=False,
    )
    train = train.join(contam.select("doc_id"), "doc_id", "left_anti")
    ce_vals = sorted(
        r["ce_micro"] for r in CU.lm_cross_entropy(train).collect()
    )
    max_ce = int(ce_vals[len(ce_vals) // 2])

    out = str(tmp_path / "ts")
    weights = {"src0": 3000, "src1": 3000}
    job_main([
        "--input", f"{SF_SMOKE}/documents.parquet", "--output", out,
        "--splits", json.dumps(splits), "--decontaminate-ngram", "8",
        "--max-ce-micro", str(max_ce),
        "--dsir-target", target_path, "--dsir-keep", "150",
        "--weights", json.dumps(weights), "--budget-tokens", "3000",
        "--n-shards", "4", "--epoch", "0",
    ])
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    # standalone replication of the composed chain
    ce_keep = CU.lm_cross_entropy(train).filter(
        F.col("ce_micro") <= max_ce
    ).select("doc_id")
    n_pre_ce = train.count()
    train2 = train.join(ce_keep, "doc_id", "left_semi")
    n_post_ce = train2.count()
    target = spark.read.parquet(target_path)
    dsir_keep = (
        CU.dsir_scores(train2, target)
        .orderBy(F.col("dsir_score_micro").desc(), F.col("doc_id"))
        .limit(150)
        .select("doc_id")
    )
    train3 = train2.join(dsir_keep, "doc_id", "left_semi")
    n_post_dsir = train3.count()
    kept = CU.mixture_sample(train3, weights, 3000)
    order = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in CU.training_shards(kept, 4, epoch=0).collect()
    }

    assert stats["ce_dropped"] == n_pre_ce - n_post_ce > 0
    assert stats["dsir_dropped"] == n_post_ce - n_post_dsir
    assert stats["kept_docs"] == len(order) > 0
    back = spark.read.parquet(f"{out}/shards")
    got = {r["doc_id"]: (r["shard"], r["pos"]) for r in back.collect()}
    assert got == order


def test_pack_manifest_inverse_invariants(spark):
    """Slices tile each doc contiguously from 0 and sum to n_tokens;
    per pack they sum to the budget (except the final partial pack);
    zero-token docs appear in no pack."""
    rng = random.Random(31)
    rows = [(i, " ".join("w" for _ in range(rng.randint(0, 40)))) for i in range(60)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    packed = CU.pack_sequences(docs, budget=16, block_size=8)
    man = CU.pack_manifest(packed, budget=16).collect()
    ntok = {r["doc_id"]: r["n_tokens"] for r in packed.collect()}
    per_doc: dict[int, list[tuple[int, int]]] = {}
    per_pack: dict[int, int] = {}
    for r in man:
        per_doc.setdefault(r["doc_id"], []).append((r["slice_start"], r["slice_len"]))
        per_pack[r["pack_id"]] = per_pack.get(r["pack_id"], 0) + r["slice_len"]
    for d, slices in per_doc.items():
        slices.sort()
        assert slices[0][0] == 0
        for (s1, l1), (s2, _) in zip(slices, slices[1:]):
            assert s1 + l1 == s2
        assert sum(l for _, l in slices) == ntok[d]
    assert set(per_doc) == {d for d, n in ntok.items() if n > 0}
    last = max(per_pack)
    for p, tot in per_pack.items():
        assert tot == 16 or p == last


def test_chunk_documents_invariants(spark):
    """Sliding-window chunking vs an independent Python reference on
    random docs: offsets/lengths/text identical; every token covered;
    consecutive starts differ by exactly the stride; no empty chunks;
    whitespace-only docs excluded."""
    rng = random.Random(53)
    rows = [
        (i, " ".join(f"t{rng.randint(0, 9)}" for _ in range(rng.randint(1, 30))))
        for i in range(40)
    ] + [(97, "   "), (98, None)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["doc_id"], r["chunk_idx"], r["tok_start"], r["tok_len"], r["chunk_text"])
        for r in CU.chunk_documents(docs, window=8, stride=5).collect()
    }
    want = set()
    for i, text in rows:
        if text is None or not text.strip():
            continue
        toks = text.strip().split()
        n = len(toks)
        kk = (n - 8 + 5 - 1) // 5 if n > 8 else 0
        for c in range(kk + 1):
            start = c * 5
            ln = min(n - start, 8)
            want.add((i, c, start, ln, " ".join(toks[start : start + ln])))
    assert got == want
    for _, _, start, ln, _ in got:
        assert ln > 0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        CU.chunk_documents(docs, window=8, stride=9)


def test_lm_cross_entropy_python_parity(spark):
    """lm_cross_entropy (md5 twin) vs an independent Python
    implementation of the bucket-LM NLL on random docs, with the LM
    trained on a subset so unseen-bucket smoothing is exercised."""
    import hashlib
    import math

    rng = random.Random(59)
    vocab = [f"w{j}" for j in range(30)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 20))))
        for i in range(30)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    lm_rows = [r for r in rows if r[0] % 3 == 0]
    lm = docs.filter(F.col("doc_id") % 3 == 0)
    B = 64

    def bucket(ng: str) -> int:
        return int(hashlib.md5(f"{ng}#dsir".encode()).hexdigest()[:15], 16) % B

    def feats(text: str) -> list[int]:
        t = text.strip().split()
        return [bucket(g) for g in t] + [
            bucket(f"{t[i]} {t[i + 1]}") for i in range(len(t) - 1)
        ]

    counts: dict[int, int] = {}
    for _, text in lm_rows:
        for b in feats(text):
            counts[b] = counts.get(b, 0) + 1
    C = sum(counts.values())

    def nll(b: int) -> int:
        return round(-1e6 * math.log((counts.get(b, 0) + 0.5) / (C + 0.5 * B)))

    want = {}
    for i, text in rows:
        fs = feats(text)
        s = sum(nll(b) for b in fs)
        want[i] = (len(fs), s, s // len(fs))
    got = {
        r["doc_id"]: (r["n_feats"], r["ce_micro_sum"], r["ce_micro"])
        for r in CU.lm_cross_entropy(
            docs, lm, buckets=B, hasher=CU._dsir_md5_hasher
        ).collect()
    }
    assert got == want
    # sanity: self-perplexity (lm = corpus) runs and covers every doc
    self_ce = CU.lm_cross_entropy(docs, buckets=B, hasher=CU._dsir_md5_hasher)
    assert self_ce.count() == len(rows)


def test_domain_blocklist_planted(spark):
    """Subdomain-aware blocklist: example.com blocks a.b.example.com;
    matching is on label boundaries (notexample.com survives) and
    case-insensitive; filter_blocked_domains keeps URL-free docs."""
    rows = [
        (0, "x https://a.b.example.com/p y"),
        (1, "x https://notexample.com/p y"),
        (2, "x https://ok.org/p https://Bad.NET/q y"),
        (3, "no urls here"),
        (4, "https://example.com https://also.example.com end"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    bl = spark.createDataFrame([("example.com",), ("bad.net",)], ["domain"])
    flags = {
        r["doc_id"]: (r["n_urls"], r["n_blocked"])
        for r in CU.domain_blocklist_flags(docs, bl).collect()
    }
    assert flags == {0: (1, 1), 1: (1, 0), 2: (2, 1), 4: (2, 2)}
    kept = {r["doc_id"] for r in CU.filter_blocked_domains(docs, bl).collect()}
    assert kept == {1, 3}


def test_curate_corpus_job_blocklist(spark, tmp_path, capsys):
    """curate_corpus job with --blocklist: docs citing a blocked
    domain (subdomain-aware) are dropped before any other stage;
    URL-free docs flow through."""
    import json

    from jobs.curate_corpus import main as job_main

    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta one two"),
        (1, "iota kappa lam mu nu xi omicron pi rho sigma"),
        (2, "tau upsilon phi chi psi omega ess tee you vee see https://evil.example.com/x"),
    ]
    inp, blp, out = (str(tmp_path / d) for d in ("in", "bl", "out"))
    spark.createDataFrame(rows, ["doc_id", "text"]).write.parquet(inp)
    spark.createDataFrame([("example.com",)], ["domain"]).write.parquet(blp)
    job_main([
        "--input", inp, "--output", out, "--blocklist", blp,
        "--min-tokens", "2", "--min-chars", "10",
    ])
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    kept = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert kept == {0, 1}
    assert stats["input_docs"] == 3 and stats["kept_docs"] == 2


def test_temperature_mixture_python_parity(spark):
    """temperature_mixture_plan/_sample vs an independent Python
    implementation: α=0.5 rates flatten the source distribution
    (smaller sources get strictly higher keep rates than α=1 natural
    proportions), and the kept set replays the md5-bucket rule."""
    import hashlib
    import math

    rng = random.Random(61)
    rows = []
    did = 0
    for s, n_docs in (("a", 40), ("b", 10), ("c", 3)):
        for _ in range(n_docs):
            rows.append((did, s, " ".join("tok" for _ in range(rng.randint(3, 9)))))
            did += 1
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    budget, alpha = 120, 0.5

    def ntok(t):
        import re

        return len(re.findall(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]", t))

    tots: dict[str, int] = {}
    for _, s, t in rows:
        tots[s] = tots.get(s, 0) + ntok(t)
    pwm = {s: round(1e6 * math.pow(v, alpha)) for s, v in tots.items()}
    z = sum(pwm.values())
    want = {s: round(budget * pwm[s] / z) for s in tots}
    rate = {s: min(1000, (1000 * want[s]) // tots[s]) for s in tots}
    got_plan = {
        r["source"]: (r["tok_total"], r["rate_permille"])
        for r in CU.temperature_mixture_plan(docs, budget, alpha).collect()
    }
    assert got_plan == {s: (tots[s], rate[s]) for s in tots}

    def bucket(i):
        return int(hashlib.md5(f"mix#0{i}".encode()).hexdigest()[:15], 16) % 1000

    want_kept = {i for i, s, _ in rows if bucket(i) < rate[s]}
    got_kept = {
        r["doc_id"]
        for r in CU.temperature_mixture_sample(docs, budget, alpha).collect()
    }
    assert got_kept == want_kept
    # flattening property: rate ordering inverts size ordering
    assert rate["c"] >= rate["b"] >= rate["a"]


def test_build_training_set_job_zero_kept(spark, tmp_path, capsys):
    """A budget small enough that every stratum's keep rate rounds to
    0‰ must exit cleanly with kept_docs=0 (an empty partitioned write
    leaves a _SUCCESS-only dir that cannot be read back) and surface
    the starved strata in zero_rate_strata."""
    import json

    from jobs.build_training_set import main as job_main

    inp, out = str(tmp_path / "in"), str(tmp_path / "zts")
    rows = [(i, "a", " ".join("tok" for _ in range(10))) for i in range(5)]
    spark.createDataFrame(rows, ["doc_id", "source", "text"]).write.parquet(inp)
    # tok_total=50; rate = (budget=1 * weight=10) div 50 = 0
    job_main([
        "--input", inp, "--output", out,
        "--weights", json.dumps({"a": 10}), "--budget-tokens", "1",
        "--n-shards", "4", "--pack-budget", "64",
    ])
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["kept_docs"] == 0
    assert stats["n_shards_written"] == 0
    assert stats["zero_rate_strata"] == ["a"]


def test_curate_corpus_job_stale_col_policy(spark, tmp_path, capsys):
    """After a text mutation the job must not write ANY non-recomputed
    text-derived column: unknown columns (lang, quality) are dropped
    and reported; --keep-cols is the caller's text-independence
    assertion and retains the named column."""
    import json

    from jobs.curate_corpus import main as job_main

    rows = [
        (0, "alpha beta gamma delta epsilon contact me a@b.com today ok", "en", 0.9, 1),
        (1, "one two three four five six seven eight nine ten done", "fr", 0.5, 2),
    ]
    inp = str(tmp_path / "in")
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "quality", "n_chars"]
    ).write.parquet(inp)

    out1 = str(tmp_path / "out1")
    job_main([
        "--input", inp, "--output", out1, "--redact-pii",
        "--min-tokens", "2", "--min-chars", "10",
    ])
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    got = spark.read.parquet(out1)
    assert set(got.columns) == {"doc_id", "text", "n_chars"}
    assert stats["dropped_stale_cols"] == ["lang", "quality"]
    # n_chars recomputed against the REDACTED text, not the stale input
    for r in got.collect():
        assert r["n_chars"] == len(r["text"])
        assert "a@b.com" not in r["text"]

    out2 = str(tmp_path / "out2")
    job_main([
        "--input", inp, "--output", out2, "--redact-pii",
        "--min-tokens", "2", "--min-chars", "10", "--keep-cols", "lang",
    ])
    stats2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    got2 = spark.read.parquet(out2)
    assert set(got2.columns) == {"doc_id", "text", "n_chars", "lang"}
    assert stats2["dropped_stale_cols"] == ["quality"]


def test_curate_corpus_job_strip_dup_spans(spark, tmp_path, capsys):
    """--strip-dup-spans W cuts every non-first duplicated W-token run
    before the quality gate; the copied run survives only in the
    first-occurrence doc, and the mutation triggers the stale-column
    drop policy."""
    import json

    from jobs.curate_corpus import main as job_main

    shared = " ".join(f"s{i}" for i in range(6))
    uniq_a = " ".join(f"a{i}" for i in range(20))
    uniq_b = " ".join(f"b{i}" for i in range(20))
    rows = [
        (0, f"{shared} {uniq_a}", "en"),
        (1, f"{uniq_b} {shared}", "fr"),
    ]
    inp, out = str(tmp_path / "in"), str(tmp_path / "out")
    spark.createDataFrame(rows, ["doc_id", "text", "lang"]).write.parquet(inp)
    job_main([
        "--input", inp, "--output", out, "--strip-dup-spans", "6",
        "--min-tokens", "5", "--min-chars", "10", "--min-jaccard", "0.9",
    ])
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    got = {r["doc_id"]: r["text"] for r in spark.read.parquet(out).collect()}
    assert got[0] == f"{shared} {uniq_a}"   # keeper occurrence intact
    assert got[1] == uniq_b                 # copied run cut
    assert stats["dropped_stale_cols"] == ["lang"]


# ---------------------------------------------------------------------------
# Deterministic corpus splits
# ---------------------------------------------------------------------------

def test_split_corpus_partition_and_determinism(spark):
    """Every doc lands in exactly one split; proportions track the
    per-mille boundaries; membership is a pure function of the id
    (re-running / repartitioning never moves a doc); bad boundaries
    rejected."""
    import pytest

    docs = spark.range(2000).selectExpr("id AS doc_id", "'x' AS text")
    splits = {"train": 900, "val": 50, "test": 50}
    out = CU.split_corpus(docs, splits)
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 2000
    assert set(counts) == {"train", "val", "test"}
    # 900/50/50 per-mille within a loose band (hash-uniformity, 2000 ids)
    assert 1700 <= counts["train"] <= 1900
    assert 50 <= counts["val"] + counts["test"] <= 300
    # determinism: same assignment after a repartition and a re-run
    again = CU.split_corpus(docs.repartition(7), splits)
    a = {r["doc_id"]: r["split"] for r in out.collect()}
    b = {r["doc_id"]: r["split"] for r in again.collect()}
    assert a == b
    with pytest.raises(ValueError, match="sum to 1000"):
        CU.split_corpus(docs, {"train": 990, "test": 5})


def test_split_decontamination_drops_leaked_train_docs(spark):
    """A train doc sharing an 8-gram with a holdout doc is dropped by
    the contamination anti-join; clean train docs and all holdout docs
    survive (the corpus_splits query shape, planted)."""
    leak = "alpha bravo charlie delta echo foxtrot golf hotel"
    rows = [(i, f"doc {i} filler " + " ".join(f"w{i}_{j}" for j in range(10))) for i in range(40)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    split = CU.split_corpus(docs, {"train": 500, "test": 500}, salt="t#1")
    pair = {r["doc_id"]: r["split"] for r in split.collect()}
    train_id = next(i for i in pair if pair[i] == "train")
    test_id = next(i for i in pair if pair[i] == "test")
    # plant the leak into one train doc and one test doc
    planted = spark.createDataFrame(
        [(i, leak if i in (train_id, test_id) else t) for i, t in rows], ["doc_id", "text"]
    )
    split = CU.split_corpus(planted, {"train": 500, "test": 500}, salt="t#1")
    train = split.filter(F.col("split") == "train")
    hold = split.filter(F.col("split") == "test")
    contam = CU.contamination_check(
        train, hold.select(F.col("doc_id").alias("bench_id"), "text"), n=8
    )
    kept_train = {r["doc_id"] for r in train.join(contam, "doc_id", "left_anti").collect()}
    assert train_id not in kept_train
    assert kept_train == {i for i in pair if pair[i] == "train"} - {train_id}


def test_build_training_set_job_splits(spark, tmp_path, capsys):
    """--splits + --decontaminate-ngram: holdout splits land under
    splits/, shards hold ONLY the train split, a planted train→test
    8-gram leak is dropped, and the stats JSON accounts for all of
    it."""
    import json

    from jobs.build_training_set import main as job_main

    leak = "alpha bravo charlie delta echo foxtrot golf hotel"
    rows = [(i, f"doc {i} " + " ".join(f"w{i}_{j}" for j in range(10)), "src0")
            for i in range(60)]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    split_map = {
        r["doc_id"]: r["split"]
        for r in CU.split_corpus(docs, {"train": 800, "val": 100, "test": 100}).collect()
    }
    train_id = next(i for i in split_map if split_map[i] == "train")
    test_id = next(i for i in split_map if split_map[i] == "test")
    planted = spark.createDataFrame(
        [(i, leak if i in (train_id, test_id) else t, s) for i, t, s in rows],
        ["doc_id", "text", "source"],
    )
    src = str(tmp_path / "docs")
    planted.write.parquet(src)

    out = str(tmp_path / "ts")
    job_main([
        "--input", src, "--output", out,
        "--splits", json.dumps({"train": 800, "val": 100, "test": 100}),
        "--decontaminate-ngram", "8", "--n-shards", "2",
    ])
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    n_train = sum(1 for s in split_map.values() if s == "train")
    assert stats["splits"]["train"] == n_train
    assert stats["splits"]["train_dropped_contaminated"] == 1
    assert stats["kept_docs"] == n_train - 1

    shard_ids = {r["doc_id"] for r in spark.read.parquet(f"{out}/shards").collect()}
    assert train_id not in shard_ids
    assert shard_ids == {i for i, s in split_map.items() if s == "train"} - {train_id}
    holdout = spark.read.parquet(f"{out}/splits")
    by_split = {
        r["split"]: r["n"]
        for r in holdout.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert by_split == {
        "val": sum(1 for s in split_map.values() if s == "val"),
        "test": sum(1 for s in split_map.values() if s == "test"),
    }


def test_search_logs_job_over_pipeline_sinks(spark, tmp_path, capsys):
    """Ingest-then-search e2e: run the record pipeline into sink
    tables, then the search job must rank parsed turns by BM25 over
    the routed snapshot and mine their templates."""
    import json

    from fluent_plugin_opensearch_spark import PipelineConfig, run_batch
    from fluent_plugin_opensearch_spark.sinks.writer import SinkCatalog
    from fluent_plugin_opensearch_spark.sources.transcripts import load_transcripts
    from jobs.search_logs import main as search_main

    cat = SinkCatalog(str(tmp_path))
    cfg = PipelineConfig(logstash_format=True, logstash_prefix="logs")
    t = load_transcripts(spark, "/root/testdata/sf0.001").limit(400)
    run_batch(spark, t, cfg, cat, batch_id="s1")

    search_main([
        "--warehouse", str(tmp_path), "--query", "error req", "--k", "5",
        "--id-col", "conv_id",
    ])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["query"] == "error req"
    assert 1 <= len(out["hits"]) <= 5
    assert out["hits"][0]["rank"] == 1
    assert all(h["_index"].startswith("logs-") for h in out["hits"])
    assert all(h["score_micro"] > 0 for h in out["hits"])

    search_main([
        "--warehouse", str(tmp_path), "--templates", "--id-col", "conv_id",
    ])
    prof = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert prof["templates"]
    top = prof["templates"][0]
    assert top["n_events"] >= 1 and "<*>" in " ".join(
        t["template"] for t in prof["templates"]
    )


def test_curate_corpus_job_keep_langs(spark, tmp_path, capsys):
    """--keep-langs filters on the heuristic language of the final
    text as a pure column filter; off-language docs drop and are
    counted."""
    import json

    from jobs.curate_corpus import main as curate_main

    en = "the cat sat on the mat and the dog is in the house"
    de = "der hund ist nicht in der wohnung und die katze ist da"
    # 20 unique filler tokens per doc keep pairwise Jaccard well under
    # the near-dup threshold so only the language gate drops anything
    rows = [
        (
            i,
            (en if i % 2 == 0 else de)
            + " "
            + " ".join(f"u{i}w{j}" for j in range(20)),
            "src0",
        )
        for i in range(30)
    ]
    src = str(tmp_path / "docs")
    spark.createDataFrame(rows, ["doc_id", "text", "source"]).write.parquet(src)

    out = str(tmp_path / "curated")
    curate_main([
        "--input", src, "--output", out,
        "--min-tokens", "5", "--min-chars", "20",
        "--keep-langs", "en",
    ])
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["lang_dropped"] == 15
    kept = spark.read.parquet(out)
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert ids == {i for i in range(30) if i % 2 == 0}
