"""Equivalence pins for the r6 optimization rewrites: each test
recomputes an optimized operator's result through the PRE-r6 shape
(or an independent Python reference) and asserts value equality, so a
future edit can't silently drift the semantics the speedups promised
to preserve.

Covered rewrites:
  * minhash verify sets = hashed shingles (vs string-set Jaccard)
  * contamination token-window-hash join (vs n-gram string join)
  * dsir single-tokenize features (vs union-of-word_ngrams multiset)
  * bm25 filter-before-explode postings (vs postings-then-filter)
  * kmeans per-dimension-sum centroid update (vs posexplode sums)
"""

from __future__ import annotations

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from fluent_plugin_opensearch_spark.operators import curation as CU
from fluent_plugin_opensearch_spark.operators import dataset as DS
from fluent_plugin_opensearch_spark.operators.search import bm25_topk, term_postings

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog again and again"),
    (1, "the quick brown fox jumps over the lazy dog again and again!"),
    (2, "a completely different document about hash join merge plans"),
    (3, "another doc about hash join merge plans and sort merge join"),
    (4, "the quick brown fox naps under the lazy dog again and again"),
    (5, ""),
    (6, None),
    (7, "one two"),  # < shingle_k tokens
    (8, "hash join merge hash join merge hash join merge"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _py_tokens(text):
    return re.split(r"\s+", text.strip()) if text and text.strip() else []


def _py_shingles(text, k=3):
    toks = _py_tokens(text)
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def test_minhash_pairs_jaccard_matches_string_sets(docs, spark):
    """The hashed verify sets must yield the same Jaccard as the
    original distinct-shingle STRING sets, pair for pair."""
    out = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in DS.minhash_lsh_pairs(docs, num_hashes=8, bands=4, min_jaccard=0.1).collect()
    }
    assert out, "planted near-dups must produce pairs"
    for (a, b), j in out.items():
        sa, sb = _py_shingles(DOCS[a][1]), _py_shingles(DOCS[b][1])
        expect = round(len(sa & sb) / len(sa | sb), 4)
        assert j == pytest.approx(expect), (a, b)
    spark.catalog.clearCache()


def test_contamination_hash_join_equals_string_ngrams(docs, spark):
    """Window-hash equi-join == n-gram string equi-join (whitespace-
    free tokens make ' '-joined grams injective)."""
    n = 3
    bench = spark.createDataFrame(
        [(100, "quick brown fox"), (101, "hash join merge"), (102, "missing from corpus")],
        "bench_id long, text string",
    )
    got = {
        (r.doc_id, r.n_bench_hits, r.first_bench_id)
        for r in CU.contamination_check(docs, bench, n=n).collect()
    }
    # reference: python n-gram string join
    bgrams = {}
    for bid, t in [(100, "quick brown fox"), (101, "hash join merge"), (102, "missing from corpus")]:
        toks = _py_tokens(t)
        for i in range(len(toks) - n + 1):
            bgrams.setdefault(" ".join(toks[i : i + n]), set()).add(bid)
    expect = {}
    for did, t in DOCS:
        toks = _py_tokens(t or "")
        hits = set()
        for i in range(len(toks) - n + 1):
            hits |= bgrams.get(" ".join(toks[i : i + n]), set())
        if hits:
            expect[did] = (len(hits), min(hits))
    assert got == {(d, c, m) for d, (c, m) in expect.items()}


def test_dsir_features_match_union_of_word_ngrams(docs, spark):
    """Single-tokenize gram build == word_ngrams(1) + word_ngrams(2)
    as a MULTISET of (id, bucket) occurrences."""
    got = Counter(
        (r.doc_id, r.bucket) for r in CU.dsir_bucket_features(docs, 64).collect()
    )
    ref_frame = CU.word_ngrams(docs, 1, "doc_id", "text").unionByName(
        CU.word_ngrams(docs, 2, "doc_id", "text")
    )
    hasher = lambda c: F.xxhash64(c, F.lit(41))  # noqa: E731
    ref = Counter(
        (r.doc_id, r.bucket)
        for r in ref_frame.select(
            "doc_id", F.pmod(hasher(F.col("ngram")), F.lit(64)).alias("bucket")
        ).collect()
    )
    assert got == ref


def test_bm25_prefilter_matches_postings_filter(docs, spark):
    """bm25's filter-the-array-then-explode postings == the full
    term_postings frame filtered to the query terms."""
    q_terms = ["hash", "join", "merge"]
    full = {
        (r.term, r.doc_id, r.tf, r.dl)
        for r in term_postings(docs.filter(F.col("text").isNotNull()))
        .filter(F.col("term").isin(q_terms))
        .collect()
    }
    # the production operator's own output (rank, id, score) must be
    # stable against the reference postings-then-filter scoring
    ranked = bm25_topk(docs, "hash join merge", k=5).collect()
    assert {r.doc_id for r in ranked} == {d for (_, d, _, _) in full}
    # doc 8 repeats every query term most often -> top rank
    assert ranked[0].doc_id == 8 or [r.doc_id for r in ranked if r.rank == 1] == [8]


def test_no_tokenizer_inside_shingle_generators(docs, spark):
    """The shingle Generate must consume a MATERIALIZED token/shingle
    attribute — if the tokenizer expression gets re-inlined into the
    generator lambda (e.g. by an extra intermediate projection that
    CollapseProject merges), the per-element recompute bug returns:
    an r6 experiment that materialized the shingle array in its own
    select re-triggered exactly this and took the query from ~10 s to
    ~101 s at sf1.0. Pin: no regex tokenizer call inside any Generate
    node's arguments."""
    frames = [
        DS.minhash_signatures(docs, num_hashes=4),
        DS.winnow_fingerprints(docs),
        DS.duplicate_spans(docs, window=4),
    ]
    for df in frames:
        plan = df._jdf.queryExecution().executedPlan().toString()
        for line in plan.splitlines():
            if "Generate" in line and "explode" in line.lower():
                assert "regexp_replace" not in line, line
    spark.catalog.clearCache()


def test_kmeans_update_matches_posexplode_sums(spark):
    """groupBy-with-per-dimension-sums centroid update == the
    posexplode shape it replaced (exact integer means)."""
    import random

    rnd = random.Random(7)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(8)]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents, assigned = DS.kmeans_fit(emb, k=3, n_assign=2, scale=1000)
    # reference: recompute the round-1 update from the round-1 assignment
    q = F.transform(F.col("embedding"), lambda x: F.round(x * F.lit(1000.0)).cast("long"))
    base = emb.select(F.col("vec_id"), q.alias("_q"))
    init = (
        base.withColumn("_h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("_h", "vec_id")
        .limit(3)
        .select("_q")
        .collect()
    )
    cents0 = [(j, list(r["_q"])) for j, r in enumerate(init)]

    def assign(cs):
        structs = []
        for j, cv in cs:
            arr = F.array(*[F.lit(int(v)).cast("long") for v in cv])
            diff = F.zip_with(F.col("_q"), arr, lambda x, c: (x - c) * (x - c))
            dist = F.aggregate(diff, F.lit(0).cast("long"), lambda acc, v: acc + v)
            structs.append(F.struct(dist.alias("d"), F.lit(j).alias("c")))
        return F.array_min(F.array(*structs))["c"]

    a1 = base.withColumn("cluster", assign(cents0))
    ref_rows = (
        a1.select("cluster", F.posexplode("_q").alias("_d", "_x"))
        .groupBy("cluster", "_d")
        .agg(F.sum("_x").alias("_s"), F.count(F.lit(1)).alias("_n"))
        .collect()
    )
    by_c = {}
    for r in ref_rows:
        by_c.setdefault(r["cluster"], {})[r["_d"]] = DS._tdiv(int(r["_s"]), int(r["_n"]))
    expect = {c: [dims[d] for d in sorted(dims)] for c, dims in by_c.items()}
    got = {c: v for c, v in cents}
    assert got == expect
