"""Corpus-curation operators a large-scale training-data pipeline
needs beyond the near-dup chain (task brief "training-data
extensions"): PII redaction, benchmark-contamination detection,
deterministic stratified / quota sampling for dataset mixing, and
sequence packing (concat-then-chunk context-window layout).

Scale notes baked into each operator:
  * redact_pii — pure codegen projection (regexp chain), no shuffle.
  * contamination_check — doc n-grams explode map-side; the benchmark
    side is broadcast (eval suites are tiny vs the corpus), so the
    join is shuffle-free on the corpus.
  * stratified_sample — filter on an engine-portable md5 bucket of the
    id: no shuffle, no RNG state, reproducible across runs/engines.
  * quota_top_per_stratum — pre-aggregates before the per-stratum
    window so the window input is bounded.
  * pack_sequences — the global exclusive prefix-sum uses the same
    two-phase blocked decomposition as sessions.sessionize_blocked,
    so no single task ever sees the whole corpus.

All hash logic is md5-based (first 15 hex digits → 60-bit bigint), the
same engine-portable trick as operators/dataset.py:_md5_hasher, so
every operator here has a full-chain DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

#: (name, pattern, replacement) — applied IN ORDER. Patterns are valid
#: in both Java regex (Spark) and RE2 (DuckDB): no lookaround, no
#: backreferences. Order matters only across overlapping classes
#: (email first: its local part may contain digit runs); the numeric
#: patterns (ip/ssn/phone) are mutually disjoint by shape.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
]


def redacted_text_expr(text_col: str):
    """The PII replacement chain (PII_PATTERNS order) as a column
    expression — for replacing a text column IN PLACE without the
    join-back a separate (id, redacted) frame would force."""
    red = F.col(text_col)
    for _, pat, repl in PII_PATTERNS:
        red = F.regexp_replace(red, pat, repl)
    return red


def redact_text(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace ``text_col`` with its redacted form, keeping every other
    column — still a pure projection (no shuffle, no join)."""
    return docs.withColumn(text_col, redacted_text_expr(text_col))


def redact_pii(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Mask PII spans and count matches per class.

    Counts are taken on the ORIGINAL text (so a span consumed by an
    earlier replacement still counts for its own class); the redacted
    text applies the replacement chain in PII_PATTERNS order. Pure
    projection — stays inside whole-stage codegen, no Python.
    """
    counts = [
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
        .cast("bigint")
        .alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    return docs.select(
        F.col(id_col), redacted_text_expr(text_col).alias("redacted"), *counts
    )


# ---------------------------------------------------------------------------
# Benchmark contamination
# ---------------------------------------------------------------------------

def word_ngrams(docs: DataFrame, n: int, id_col: str, text_col: str, out_col: str = "ngram") -> DataFrame:
    """(id, word-n-gram) rows. The token array is MATERIALIZED first
    (withColumn) so the per-index lambda reads a column value instead
    of re-running split() per element (CLAUDE.md lambda-recompute
    gotcha) — building all n-grams is O(len·n) per doc, map-side."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    cnt = F.size(F.col("_toks")) - (n - 1)
    grams = F.when(
        cnt > 0,
        F.transform(
            F.sequence(F.lit(1), F.greatest(cnt, F.lit(1))),
            lambda i: F.array_join(F.slice(F.col("_toks"), i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.withColumn("_toks", toks)
        .select(F.col(id_col), F.explode(grams).alias(out_col))
    )


def contamination_check(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "bench_id",
    bench_text_col: str = "text",
    broadcast_bench: bool = True,
) -> DataFrame:
    """Train/eval overlap detection: flag corpus docs sharing any word
    n-gram with a benchmark item (the standard decontamination test —
    e.g. 8–13-gram overlap — run before training on scraped corpora).

    Shape: both sides explode to (id, n-gram) map-side; the join is an
    EQUI-join on the n-gram string with the benchmark side broadcast
    (eval suites are thousands of items vs billions of docs), so the
    corpus side never shuffles. Set ``broadcast_bench=False`` if the
    benchmark side is genuinely huge — the join degrades to a hash
    shuffle on the n-gram, still linear.

    Returns one row per contaminated doc: hit count + the smallest
    offending bench id (deterministic evidence pointer).
    """
    doc_ng = word_ngrams(docs, n, id_col, text_col)
    bench_ng = word_ngrams(bench, n, bench_id_col, bench_text_col).withColumnRenamed(
        bench_id_col, "_bid"
    )
    if broadcast_bench:
        bench_ng = F.broadcast(bench_ng)
    hits = doc_ng.join(bench_ng, "ngram").select(id_col, "_bid").distinct()
    # first_bench_id keeps the bench id's own type (string suite ids
    # like 'mmlu-0042' are the common real shape — a bigint cast here
    # would throw under ANSI mode; the oracle query casts its synthetic
    # numeric ids at the query layer)
    return hits.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bench_hits"),
        F.min("_bid").alias("first_bench_id"),
    )


# ---------------------------------------------------------------------------
# Deterministic sampling for dataset mixing
# ---------------------------------------------------------------------------

def _id_bucket(id_col: str, buckets: int, salt: str):
    """Engine-portable uniform bucket of an id: first 15 hex digits of
    md5(salt || id) as a 60-bit bigint, mod ``buckets`` — the
    _md5_hasher trick, so sampling decisions replay bit-identically in
    Spark and DuckDB (and across cluster sizes: no RNG, no partition
    dependence)."""
    h = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    return (F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint") % buckets).alias("_bucket")


def stratified_sample(
    docs: DataFrame,
    rates_permille: dict[str, int],
    default_permille: int = 0,
    id_col: str = "doc_id",
    stratum_col: str = "source",
    salt: str = "strat#0",
) -> DataFrame:
    """Hash-based stratified sampling: keep a row iff its id bucket
    (0..999) < the stratum's per-mille rate. This is how corpus mixing
    weights are applied at 100 TB: a pure filter — no shuffle, no RNG
    seed to coordinate across executors, stable under re-runs,
    repartitioning, and engine swaps.
    """
    rate = F.lit(default_permille)
    for k, v in sorted(rates_permille.items()):
        rate = F.when(F.col(stratum_col) == k, F.lit(v)).otherwise(rate)
    return (
        docs.withColumn("_bucket", _id_bucket(id_col, 1000, salt))
        .filter(F.col("_bucket") < rate)
        .drop("_bucket")
    )


def quota_top_per_stratum(
    docs: DataFrame,
    quota: int,
    order_col: str = "n_chars",
    id_col: str = "doc_id",
    stratum_col: str = "source",
    prefilter: bool = False,
) -> DataFrame:
    """Quota sampling: the top-``quota`` docs per stratum by
    ``order_col`` (desc, id tie-break) — 'take the N best docs per
    source'.

    ``prefilter=True`` is the billion-doc-stratum mode: an EXACT
    two-phase top-k (the distributed takeOrdered shape). Phase 1 ranks
    within (stratum, input-partition) — the exchange keys include the
    partition id, so a hot stratum spreads across tasks instead of
    sorting entirely in one — and keeps only each task's local
    top-``quota``; a row outside its partition's top-``quota`` cannot
    be in the global top-``quota``, so phase 2's per-stratum window
    sees at most ``quota × num_partitions`` rows. Identical output to
    the single-window plan (equality-tested on skewed data)."""
    if prefilter:
        w_local = Window.partitionBy(stratum_col, "_pid").orderBy(
            F.desc(order_col), F.col(id_col)
        )
        docs = (
            docs.withColumn("_pid", F.spark_partition_id())
            .withColumn("_lr", F.row_number().over(w_local))
            .filter(F.col("_lr") <= quota)
            .drop("_pid", "_lr")
        )
    w = Window.partitionBy(stratum_col).orderBy(F.desc(order_col), F.col(id_col))
    return (
        docs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= quota)
        .select(stratum_col, id_col, order_col, "rank")
    )


# ---------------------------------------------------------------------------
# Sequence packing (concat-then-chunk)
# ---------------------------------------------------------------------------

def pack_sequences(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_size: int = 100_000,
    stratum_col: str | None = None,
) -> DataFrame:
    """Context-window layout for LLM pretraining: conceptually
    concatenate all docs in id order and cut every ``budget`` tokens
    (the standard 'concat then chunk' packing). Emits, per doc, its
    global token offset and the window span it lands in.

    The global exclusive prefix-sum over id order is computed with the
    same two-phase blocked decomposition as
    sessions.sessionize_blocked (local cumsum per id-block, tiny
    block-summary window, join offsets back) — a naive
    ``Window.orderBy(id)`` would drag the entire corpus through ONE
    task; this shape never materializes more than a block per task
    plus one row per block for the carry.

    Token counts use the bpe-ish regex (dataset.token_count_bpe_ish).

    ``stratum_col`` packs each stratum independently (per-domain
    context streams — the curriculum/mixture shape): offsets restart
    per stratum, and every window/groupBy/join key gains the stratum,
    so strata pack in parallel with no cross-stratum barrier.
    """
    strat = [stratum_col] if stratum_col else []
    n_tok = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]"), F.lit(0))
    ).cast("bigint")
    blocked = docs.select(
        *strat,
        F.col(id_col),
        n_tok.alias("n_tokens"),
        (F.col(id_col).cast("bigint") / block_size).cast("bigint").alias("_block"),
    )

    w_local = Window.partitionBy(*strat, "_block").orderBy(id_col)
    local = blocked.withColumn(
        "_local_excl",
        F.coalesce(
            F.sum("n_tokens").over(w_local.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0).cast("bigint"),
        ),
    )

    # one row per (stratum, block) — tiny by construction
    w_blk = Window.partitionBy(*strat).orderBy("_block") if strat else Window.orderBy("_block")
    offsets = (
        local.groupBy(*strat, "_block")
        .agg(F.sum("n_tokens").alias("_blk_sum"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_blk_sum").over(w_blk.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0).cast("bigint"),
            ),
        )
        .select(*strat, "_block", "_offset")
    )

    start = F.col("_local_excl") + F.col("_offset")
    last = (start + F.greatest(F.col("n_tokens"), F.lit(1)) - 1)
    return (
        local.join(offsets, on=[*strat, "_block"], how="inner")
        .select(
            *strat,
            F.col(id_col),
            F.col("n_tokens"),
            start.cast("bigint").alias("start_off"),
            (start / budget).cast("bigint").alias("first_pack"),
            (last / budget).cast("bigint").alias("last_pack"),
            ((last / budget).cast("bigint") - (start / budget).cast("bigint") + 1).alias(
                "n_packs"
            ),
        )
    )
