"""Corpus-curation operators a large-scale training-data pipeline
needs beyond the near-dup chain (task brief "training-data
extensions"): PII redaction, benchmark-contamination detection,
deterministic stratified / quota sampling for dataset mixing,
sequence packing (concat-then-chunk context-window layout), DSIR
importance resampling, token-budget mixture sampling, and the
deterministic epoch-shuffle / shard-assignment final stage
(jobs/build_training_set.py composes the last three).

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

from ..functions.text import cjk_pad, ws_tokens

# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

#: (name, pattern, replacement) — applied IN ORDER. Patterns are valid
#: in Java regex (Spark), RE2 (DuckDB) and Python ``re``: no
#: lookaround, no backreferences, ASCII ``\d``. Chain order matters
#: across overlapping classes:
#:   * email first — its local part may contain digit runs;
#:   * ipv6 before ipv4 — an IPv4-mapped IPv6 tail would otherwise be
#:     eaten piecemeal;
#:   * intl_phone before phone — "+1-555-123-4567" must mask whole,
#:     not leave a dangling "+1-" around a US-phone match;
#:   * cc LAST — by then SSN/phone/intl spans are already replaced, so
#:     adjacent short digit groups can never merge into a fake card.
#: Semantics notes (documented limits):
#:   * cc is digit-RUN masking: 13–19 contiguous digits, or the common
#:     4-4-4-x / 4-6-5 groupings with a single space/dash separator.
#:     Luhn validation is not regex-expressible — over-masking long
#:     digit runs is the safe direction for redaction.
#:   * ipv6 matches full-form and ::-compressed WITH a leading group;
#:     a bare leading "::" (e.g. "::1") is not matched (a \b cannot
#:     anchor before ':').
#:   * per-class counts are taken independently on the ORIGINAL text,
#:     so a span nested in another class (e.g. the US-phone tail of
#:     "+1-555-123-4567") counts for every class that matches it.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (
        "ipv6",
        r"\b(?:[0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}\b"
        r"|\b(?:[0-9A-Fa-f]{1,4}:){1,6}:(?:[0-9A-Fa-f]{1,4})(?::[0-9A-Fa-f]{1,4}){0,5}\b"
        r"|\b(?:[0-9A-Fa-f]{1,4}:){1,7}:",
        "<IPV6>",
    ),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("intl_phone", r"\+\d{1,3}(?:[ -]?\d){7,12}\b", "<PHONE_INTL>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    (
        "cc",
        r"\b(?:\d{13,19}|\d{4}[ -]\d{4}[ -]\d{4}[ -]\d{1,7}|\d{4}[ -]\d{6}[ -]\d{5})\b",
        "<CC>",
    ),
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
    toks = ws_tokens(F.col(text_col))
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
    corpus side never shuffles. The broadcast happens AFTER the bench
    side explodes to n-grams — size the default accordingly: roughly
    ``bench_items × (tokens_per_item − n + 1) × (n·avg_word + 60 B)``
    must fit Spark's broadcast ceiling (8 GB hard; driver/executor
    heap in practice). At 8-grams ≈ 100 bytes/row that is ~10M bench
    n-grams per GB — a 100k-item suite × 200 tokens ≈ 19M rows ≈ 2 GB:
    near the practical limit. Set ``broadcast_bench=False`` beyond
    that — the join degrades to a hash shuffle on the n-gram, still
    linear (ADVICE r3).

    Returns one row per contaminated doc: hit count + the smallest
    offending bench id (deterministic evidence pointer).
    """
    # join on a 64-bit hash of each n-TOKEN WINDOW instead of the
    # joined n-gram string (r6): tokens are whitespace-free, so
    # window equality <=> gram-string equality, and the hash spares
    # building ~n·avg_word-byte strings per corpus window AND shrinks
    # the broadcast to 8 B/row (raising the documented bench-side
    # ceiling ~10x). xxhash64 collisions across the corpus x bench
    # window sets are the usual negligible-odds caveat (oracle-gated).
    def _win_hashes(df: DataFrame, idc: str, tc: str, out: str) -> DataFrame:
        toks = F.col("_toks")
        cnt = F.size(toks) - (n - 1)
        hs = F.when(
            cnt > 0,
            F.transform(
                F.sequence(F.lit(1), F.greatest(cnt, F.lit(1))),
                lambda i: F.xxhash64(F.slice(toks, i, n)),
            ),
        ).otherwise(F.array().cast("array<bigint>"))
        return df.select(F.col(idc), ws_tokens(F.col(tc)).alias("_toks")).select(
            F.col(idc), F.explode(hs).alias(out)
        )

    doc_ng = _win_hashes(docs, id_col, text_col, "_ngh")
    bench_ng = _win_hashes(bench, bench_id_col, bench_text_col, "_ngh").withColumnRenamed(
        bench_id_col, "_bid"
    )
    if broadcast_bench:
        bench_ng = F.broadcast(bench_ng)
    hits = doc_ng.join(bench_ng, "_ngh").select(id_col, "_bid").distinct()
    # first_bench_id keeps the bench id's own type (string suite ids
    # like 'mmlu-0042' are the common real shape — a bigint cast here
    # would throw under ANSI mode; the oracle query casts its synthetic
    # numeric ids at the query layer)
    return hits.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bench_hits"),
        F.min("_bid").alias("first_bench_id"),
    )


# ---------------------------------------------------------------------------
# Repetition quality signals
# ---------------------------------------------------------------------------

def repetition_signals(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021,
    appendix A1 repetition filters — public): per-doc counts of
    duplicated lines, characters inside duplicated lines, and
    word-bigram repetition including the most-frequent bigram's
    occurrence count. Integer-exact outputs (the filter thresholds are
    consumer-side ratios, e.g. ``n_dup_lines/n_lines > 0.3`` → drop).

    Scale shape: lines and bigrams EXPLODE map-side, then one partial
    hash-agg per (doc, key) and a per-doc re-agg — two bounded
    shuffles regardless of document length. The alternative (per-row
    array lambdas comparing each line against the whole line array) is
    O(L²) per doc AND re-evaluates the outer split per element
    (CLAUDE.md lambda-recompute gotcha); a 1 GB document streams
    through the hash aggregate here instead.
    """
    # line stats: occurrences per (doc, line) → duplicate counts
    lc = (
        docs.select(F.col(id_col), F.explode(F.split(F.col(text_col), "\n")).alias("_l"))
        .groupBy(id_col, "_l")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    dup = F.col("_c") > 1
    lstats = lc.groupBy(id_col).agg(
        F.sum("_c").cast("bigint").alias("n_lines"),
        F.sum(F.when(dup, F.col("_c")).otherwise(0)).cast("bigint").alias("n_dup_lines"),
        F.sum(F.when(dup, F.col("_c") * F.length("_l")).otherwise(0))
        .cast("bigint")
        .alias("dup_line_chars"),
    )
    # bigram stats over the whole doc (whitespace tokens, line breaks
    # are token separators too — standard Gopher treatment)
    bg = (
        word_ngrams(docs, 2, id_col, text_col)
        .groupBy(id_col, "ngram")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    bstats = bg.groupBy(id_col).agg(
        F.sum("_c").cast("bigint").alias("n_bigrams"),
        F.sum(F.when(dup, F.col("_c")).otherwise(0)).cast("bigint").alias("n_dup_bigrams"),
        F.max("_c").cast("bigint").alias("top_bigram_n"),
    )
    # single-token docs have no bigrams → left join, zero-fill
    return lstats.join(bstats, id_col, "left").select(
        id_col,
        "n_lines",
        "n_dup_lines",
        "dup_line_chars",
        F.coalesce("n_bigrams", F.lit(0).cast("bigint")).alias("n_bigrams"),
        F.coalesce("n_dup_bigrams", F.lit(0).cast("bigint")).alias("n_dup_bigrams"),
        F.coalesce("top_bigram_n", F.lit(0).cast("bigint")).alias("top_bigram_n"),
    )


def paragraph_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """Cross-document paragraph-level exact dedup (the paragraph-grain
    variant of Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better" — public): every occurrence of a paragraph
    after its corpus-wide FIRST occurrence (ordered by doc id, then
    position in the doc) is removed, and documents are reassembled
    from their surviving paragraphs. This is the boilerplate-stripping
    pass — headers/footers/license blocks repeated across millions of
    pages survive exactly once.

    Skew-critical shape: the winner per paragraph is computed with
    ``groupBy(hash).agg(min(struct(doc, pos)))`` — a map-side partial
    aggregate — NOT a window over the paragraph key: a boilerplate
    paragraph repeated 10⁹ times would funnel its whole group through
    one window task, while min() reduces it map-side to one row per
    partition. The join back to occurrences is an equi-join on the
    md5 hash (narrow key, AQE skew-split handles the hot hash).
    Reassembly is one groupBy over the doc id with an array_sort on
    (pos, paragraph) — per-doc data, bounded by document size.
    """
    pars = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "par"),
    ).withColumn("_h", F.md5(F.col("par")))
    winners = pars.groupBy("_h").agg(
        F.min(F.struct(F.col(id_col).alias("d"), F.col("pos").alias("p"))).alias("_w")
    )
    kept = (
        pars.join(winners, "_h")
        .filter((F.col(id_col) == F.col("_w.d")) & (F.col("pos") == F.col("_w.p")))
        .drop("_h", "_w")
    )
    reassembled = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "par"))), lambda s: s["par"]
            ),
            sep,
        ).alias("text"),
        F.count(F.lit(1)).cast("bigint").alias("n_pars_kept"),
    )
    n_pars = F.size(F.split(F.col(text_col), sep)).cast("bigint").alias("n_pars")
    return (
        docs.select(F.col(id_col), n_pars)
        .join(reassembled, id_col, "left")
        .select(
            id_col,
            F.coalesce("text", F.lit("")).alias("text"),
            "n_pars",
            F.coalesce("n_pars_kept", F.lit(0).cast("bigint")).alias("n_pars_kept"),
        )
    )


# ---------------------------------------------------------------------------
# DSIR-style importance resampling (target-domain data selection)
# ---------------------------------------------------------------------------

def _dsir_md5_hasher(col):
    """Engine-portable feature hash: first 15 hex digits of
    md5(ngram + '#dsir') as a 60-bit non-negative bigint — identical
    in Spark and DuckDB (the _md5_hasher trick, seedless)."""
    return F.conv(
        F.substring(F.md5(F.concat(col, F.lit("#dsir"))), 1, 15), 16, 10
    ).cast("bigint")


def dsir_bucket_features(
    docs: DataFrame,
    buckets: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    hasher=None,
) -> DataFrame:
    """(id, bucket) rows: hashed word unigrams + bigrams (the DSIR
    feature space — Xie et al. 2023, "Data Selection for Language
    Modeling via Importance Resampling", public), one row per feature
    OCCURRENCE (multiset counts, per the paper). Pure map-side:
    explode + hash + pmod, no shuffle."""
    hasher = hasher or (lambda c: F.xxhash64(c, F.lit(41)))
    # one tokenize per document: unigrams ARE the token array and the
    # bigrams are built from the same materialized array, concatenated
    # before ONE explode — the union-of-word_ngrams shape tokenized
    # every document twice for the same feature multiset (r6)
    toks = F.col("_toks")
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), F.greatest(n - 1, F.lit(1))),
            lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = F.when(n >= 1, F.concat(toks, bigrams)).otherwise(
        F.array().cast("array<string>")
    )
    return (
        docs.select(F.col(id_col), ws_tokens(F.col(text_col)).alias("_toks"))
        .select(F.col(id_col), F.explode(grams).alias("ngram"))
        .select(F.col(id_col), F.pmod(hasher(F.col("ngram")), F.lit(buckets)).alias("bucket"))
    )


def dsir_scores(
    docs: DataFrame,
    target: DataFrame,
    buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
    hasher=None,
) -> DataFrame:
    """Per-document DSIR importance score: how much more likely the
    document's hashed-n-gram features are under the TARGET domain's
    bucket distribution than under the raw corpus's. The standard
    public recipe (Xie et al. 2023) for selecting web data that
    resembles a target domain before training.

    score(d) = Σ_{features f∈d} log( p̂(b(f)) / q̂(b(f)) ), with
    Laplace-smoothed (α=0.5) bucket frequencies p̂ (target) and q̂
    (corpus). Per-bucket log-ratios are quantized to integer
    MICRO-units (round(1e6·log)) before the per-doc sum, so the final
    aggregation is an exact BIGINT sum — engine-portable with no
    float-summation-order hazard; the single ln() per bucket is the
    only floating-point step on either engine.

    Scale shape (100 TB corpus, small target — the DSIR regime):
      * corpus features are exploded map-side TWICE (bucket-count pass
        + scoring pass) rather than persisted — the exploded feature
        set is larger than the corpus itself, and each pass is
        shuffle-free until its aggregate;
      * the bucket-count aggregates output ≤``buckets`` rows; the
        corpus total rides a partition-less window over that ≤B-row
        frame (bounded by the constant B, not the data);
      * the target side is tiny by definition — it pays one extra
        aggregate for its total rather than complicating the plan;
      * the per-bucket weight table (≤B rows) is BROADCAST into the
        scoring join, so the only corpus shuffle is the final
        groupBy(doc).
    Docs with no features (empty text) are absent from the output,
    like minhash_signatures.
    """
    feats_c = dsir_bucket_features(docs, buckets, id_col, text_col, hasher)
    feats_t = dsir_bucket_features(target, buckets, id_col, text_col, hasher)
    w_all = Window.partitionBy()
    q = (
        feats_c.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("q_n"))
        .withColumn("_Q", F.sum("q_n").over(w_all))
    )
    p = feats_t.groupBy("bucket").agg(F.count(F.lit(1)).alias("p_n"))
    ptot = feats_t.groupBy().agg(F.count(F.lit(1)).alias("_P"))
    num = (F.coalesce(F.col("p_n"), F.lit(0)) + F.lit(0.5)) * (
        F.col("_Q") + F.lit(0.5 * buckets)
    )
    den = (F.col("q_n") + F.lit(0.5)) * (F.col("_P") + F.lit(0.5 * buckets))
    weights = (
        q.join(p, "bucket", "left")
        .crossJoin(F.broadcast(ptot))
        .select(
            "bucket",
            F.round(F.lit(1000000.0) * F.log(num / den)).cast("bigint").alias("_w"),
        )
    )
    return (
        feats_c.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_feats"),
            F.sum("_w").cast("bigint").alias("dsir_score_micro"),
        )
    )


#: URL matcher + host-capture — valid in Java regex, RE2 and Python
#: ``re`` (no lookaround); the host group stops at '/', ':', '?', '#'.
URL_PATTERN = r"https?://[^\s]+"
DOMAIN_PATTERN = r"https?://([^/:?#\s]+)"


def extract_urls(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, u_idx, url, domain) — one row per URL occurrence, with the
    lowercased host. Pure map-side explode, no shuffle."""
    return docs.select(
        F.col(id_col),
        F.posexplode(
            F.regexp_extract_all(F.col(text_col), F.lit(URL_PATTERN), 0)
        ).alias("u_idx", "url"),
    ).withColumn(
        "domain", F.lower(F.regexp_extract(F.col("url"), DOMAIN_PATTERN, 1))
    )


def domain_blocklist_flags(
    docs: DataFrame,
    blocklist: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    domain_col: str = "domain",
) -> DataFrame:
    """Per-doc URL/blocked-URL counts against a domain blocklist with
    SUBDOMAIN matching (a blocklist entry ``example.com`` blocks
    ``a.b.example.com``) — the standard web-curation source filter.

    Scale shape: suffix matching is NOT a LIKE/endswith non-equi join
    (O(n·m) at corpus scale); each URL's domain explodes into its
    label-suffix chain (``a.b.c`` → a.b.c, b.c, c — ≤ ~6 rows) and the
    match is an EQUI-join on the suffix with the blocklist broadcast.
    Everything before the per-doc count is map-side. Returns
    (id, n_urls, n_blocked); docs with no URLs are absent.
    """
    urls = extract_urls(docs, id_col, text_col)
    parts = F.split(F.col("domain"), r"\.")
    sufs = urls.select(
        F.col(id_col),
        F.col("u_idx"),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size(parts)),
                lambda i: F.concat_ws(".", F.slice(parts, i, F.size(parts))),
            )
        ).alias("suf"),
    )
    bl = F.broadcast(
        blocklist.select(F.lower(F.col(domain_col)).alias("suf")).distinct()
    )
    hits = sufs.join(bl, "suf").select(id_col, "u_idx").distinct()
    n_urls = urls.groupBy(id_col).agg(F.count(F.lit(1)).cast("bigint").alias("n_urls"))
    n_blocked = hits.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_blocked")
    )
    return n_urls.join(n_blocked, id_col, "left").select(
        F.col(id_col),
        F.col("n_urls"),
        F.coalesce(F.col("n_blocked"), F.lit(0)).cast("bigint").alias("n_blocked"),
    )


def filter_blocked_domains(
    docs: DataFrame,
    blocklist: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    domain_col: str = "domain",
) -> DataFrame:
    """Drop docs citing any blocklisted domain (subdomain-aware):
    left-anti join of the corpus against the blocked id set — docs
    with no URLs are kept."""
    flags = domain_blocklist_flags(docs, blocklist, id_col, text_col, domain_col)
    blocked = flags.filter(F.col("n_blocked") > 0).select(id_col)
    return docs.join(blocked, id_col, "left_anti")


def lm_cross_entropy(
    docs: DataFrame,
    lm_docs: DataFrame | None = None,
    buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
    hasher=None,
) -> DataFrame:
    """Per-document cross-entropy under a hashed-n-gram reference LM —
    the CCNet/Gopher-style perplexity quality signal (Wenzek et al.
    2020 filter web text by LM perplexity; here the LM is a
    Laplace-smoothed bucket-unigram model over the same hashed
    unigram+bigram feature space as DSIR, so it needs no external
    model). Docs whose features are improbable under the reference
    distribution (gibberish, boilerplate soup, wrong language) score
    high; ``ce_micro`` is the mean NLL in integer micro-nats.

    NLL(b) = −ln((c_b + 0.5) / (C + 0.5·B)) with counts c_b from
    ``lm_docs`` (default: the corpus itself — self-perplexity).
    Per-bucket NLLs are quantized to integer micro-nats before the
    per-doc sum (exact BIGINT aggregation, no float-order hazard —
    the dsir_scores trick); features unseen in the LM get the c=0
    smoothed NLL.

    Scale shape: identical to ``dsir_scores`` — map-side feature
    explode, ≤``buckets``-row count aggregate with a bounded window
    for the total, the NLL table BROADCAST into the scoring join, one
    corpus shuffle (the final groupBy(doc)). Returns
    (id, n_feats, ce_micro_sum, ce_micro).
    """
    lm = lm_docs if lm_docs is not None else docs
    feats_d = dsir_bucket_features(docs, buckets, id_col, text_col, hasher)
    feats_lm = (
        feats_d
        if lm is docs
        else dsir_bucket_features(lm, buckets, id_col, text_col, hasher)
    )
    counts = (
        feats_lm.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c_n"))
        .withColumn("_C", F.sum("c_n").over(Window.partitionBy()))
    )
    nll = counts.select(
        "bucket",
        F.round(
            F.lit(-1000000.0)
            * F.log((F.col("c_n") + F.lit(0.5)) / (F.col("_C") + F.lit(0.5 * buckets)))
        )
        .cast("bigint")
        .alias("_nll"),
    )
    ctot = feats_lm.groupBy().agg(F.count(F.lit(1)).cast("bigint").alias("_C"))
    unseen = (
        F.round(
            F.lit(-1000000.0)
            * F.log(F.lit(0.5) / (F.col("_C") + F.lit(0.5 * buckets)))
        )
        .cast("bigint")
    )
    scored = (
        feats_d.join(F.broadcast(nll), "bucket", "left")
        .crossJoin(F.broadcast(ctot))
        .select(F.col(id_col), F.coalesce(F.col("_nll"), unseen).alias("_nll"))
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_feats"),
            F.sum("_nll").cast("bigint").alias("ce_micro_sum"),
        )
        .withColumn("ce_micro", F.expr("ce_micro_sum div n_feats"))
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


def split_corpus(
    docs: DataFrame,
    splits_permille: dict[str, int],
    id_col: str = "doc_id",
    salt: str = "split#0",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test split: assign each doc to exactly
    ONE split by its 60-bit md5 id bucket (0..999) against cumulative
    per-mille boundaries taken in ``splits_permille`` insertion order
    (must sum to 1000).

    Pure projection — no shuffle, no RNG, no coordination: membership
    is a function of the id alone, so it replays bit-identically across
    engines, cluster sizes, repartitions, and pipeline re-runs. That
    stability is what makes a holdout trustworthy at 100 TB: a doc can
    never silently migrate from test into train between corpus builds.
    Pair with ``contamination_check`` (train side vs holdout side) to
    drop n-gram leakage across the boundary — hash disjointness alone
    does not prevent near-duplicate leakage.
    """
    if sum(splits_permille.values()) != 1000:
        raise ValueError(
            f"splits_permille must sum to 1000, got {sum(splits_permille.values())}"
        )
    bounds: list[tuple[int, str]] = []
    cum = 0
    for name, pm in splits_permille.items():
        cum += pm
        bounds.append((cum, name))
    assign = None
    for bound, name in bounds[:-1]:
        cond = F.col("_bucket") < bound
        assign = F.when(cond, name) if assign is None else assign.when(cond, name)
    assign = F.lit(bounds[-1][1]) if assign is None else assign.otherwise(bounds[-1][1])
    return (
        docs.withColumn("_bucket", _id_bucket(id_col, 1000, salt))
        .withColumn(out_col, assign)
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
    same blocked decomposition as sessions.sessionize_blocked, but
    with a THREE-level carry: local cumsum per id-block (parallel
    windows), block-summary cumsum per superblock (parallel windows —
    one row per block), and a global window over superblock summaries
    only. A naive ``Window.orderBy(id)`` would drag the entire corpus
    through ONE task; with the extra level the single-task window sees
    n_docs / block_size² rows (10¹² docs at the default block size →
    100 rows), closing the r3 tail risk where the block-summary stream
    itself reached ~10⁷ rows in one task.

    All index arithmetic is integer division (SQL ``div``, bigint in /
    bigint out) — a double-division round-trip silently loses exactness
    past 2⁵³, a real cliff for cumulative token offsets at 100 TB
    (ADVICE r3).

    Token counts use the bpe-ish regex (dataset.token_count_bpe_ish).

    ``stratum_col`` packs each stratum independently (per-domain
    context streams — the curriculum/mixture shape): offsets restart
    per stratum, and every window/groupBy/join key gains the stratum,
    so strata pack in parallel with no cross-stratum barrier.
    """
    strat = [stratum_col] if stratum_col else []
    n_tok = _n_tokens(text_col)
    blocked = docs.select(
        *strat,
        F.col(id_col),
        n_tok.alias("n_tokens"),
        F.expr(f"CAST(`{id_col}` AS BIGINT) div {block_size}").alias("_block"),
    )

    w_local = Window.partitionBy(*strat, "_block").orderBy(id_col)
    local = blocked.withColumn(
        "_local_excl",
        F.coalesce(
            F.sum("n_tokens").over(w_local.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0).cast("bigint"),
        ),
    )

    # level 2: one row per (stratum, block), cumsum WITHIN a superblock
    # of ``block_size`` blocks — still a parallel, partitioned window
    w_blk = Window.partitionBy(*strat, "_sblock").orderBy("_block")
    blk = (
        local.groupBy(*strat, "_block")
        .agg(F.sum("n_tokens").alias("_blk_sum"))
        .withColumn("_sblock", F.expr(f"_block div {block_size}"))
        .withColumn(
            "_blk_excl",
            F.coalesce(
                F.sum("_blk_sum").over(w_blk.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0).cast("bigint"),
            ),
        )
        # blk feeds BOTH sides of the offsets join (directly + via
        # s_off); unpersisted, each side would re-run the full-corpus
        # scan + local window that produced it (the CLAUDE.md
        # join-rerun pattern). One row per block → caching is ~free
        # (10M rows at 10¹² docs) and drops the corpus scans from 3 to 2.
        .persist()
    )

    # level 3: one row per (stratum, superblock) — n_docs/block_size²
    # rows through the only unpartitioned window (≈100 at 10¹² docs)
    w_s = Window.partitionBy(*strat).orderBy("_sblock") if strat else Window.orderBy("_sblock")
    s_off = (
        blk.groupBy(*strat, "_sblock")
        .agg(F.sum("_blk_sum").alias("_s_sum"))
        .withColumn(
            "_s_off",
            F.coalesce(
                F.sum("_s_sum").over(w_s.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0).cast("bigint"),
            ),
        )
        .select(*strat, "_sblock", "_s_off")
    )
    offsets = (
        blk.join(s_off, on=[*strat, "_sblock"], how="inner")
        .select(*strat, "_block", (F.col("_blk_excl") + F.col("_s_off")).alias("_offset"))
    )

    packed = local.join(offsets, on=[*strat, "_block"], how="inner").select(
        *strat,
        F.col(id_col),
        F.col("n_tokens"),
        (F.col("_local_excl") + F.col("_offset")).alias("start_off"),
    )
    last = "start_off + greatest(n_tokens, CAST(1 AS BIGINT)) - 1"
    return packed.select(
        *strat,
        F.col(id_col),
        F.col("n_tokens"),
        F.col("start_off"),
        F.expr(f"start_off div {budget}").alias("first_pack"),
        F.expr(f"({last}) div {budget}").alias("last_pack"),
        F.expr(f"(({last}) div {budget}) - (start_off div {budget}) + 1").alias("n_packs"),
    )


def pack_manifest(
    packed: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    stratum_col: str | None = None,
) -> DataFrame:
    """Explode ``pack_sequences`` spans into the per-(pack, doc) slice
    manifest a dataloader consumes: for every context window
    (``pack_id``) the doc slices that fill it —
    ``slice_start``/``slice_len`` are token offsets WITHIN the doc
    (``array_slice(tokens, slice_start, slice_len)`` reconstructs the
    window, concatenating slices in ``slice_start``-of-pack order =
    doc order). Inverse invariants: per doc the slice lengths sum to
    n_tokens; per pack they sum to ``budget`` (except the final
    partial pack).

    Scale: a pure generate/projection over pack_sequences' output —
    the explosion factor is n_tokens/budget + 1 per doc (linear in
    corpus tokens), and no new shuffle is introduced.
    """
    strat = [stratum_col] if stratum_col else []
    b = f"CAST({budget} AS BIGINT)"
    return (
        packed.select(
            *strat,
            F.col(id_col),
            F.col("n_tokens"),
            F.col("start_off"),
            F.explode(F.expr("sequence(first_pack, last_pack)")).alias("pack_id"),
        )
        .select(
            *strat,
            F.col("pack_id"),
            F.col(id_col),
            F.expr(f"greatest(CAST(0 AS BIGINT), pack_id * {b} - start_off)").alias(
                "slice_start"
            ),
            F.expr(
                f"least(n_tokens, (pack_id + 1) * {b} - start_off)"
                f" - greatest(CAST(0 AS BIGINT), pack_id * {b} - start_off)"
            ).alias("slice_len"),
        )
        .filter(F.col("slice_len") > 0)
    )


def chunk_documents(
    docs: DataFrame,
    window: int = 32,
    stride: int = 24,
    id_col: str = "doc_id",
    text_col: str = "text",
    with_text: bool = True,
) -> DataFrame:
    """Sliding-window document chunking: split each doc's whitespace
    token stream into overlapping windows of ``window`` tokens whose
    starts advance by ``stride`` (overlap = window − stride) — the
    standard context-window layout for embedding/RAG indexing and
    long-doc training. Chunk starts are 0, stride, 2·stride, …; the
    final chunk starts at the last multiple of stride that still
    leaves uncovered tokens and may be shorter than ``window`` — every
    token lands in ≥1 chunk, and no chunk is empty or fully contained
    in its predecessor.

    Pure per-doc generate/projection (sequence → explode → slice): no
    shuffle, no UDF; explosion factor ≈ n_tokens/stride per doc. With
    ``with_text=False`` only offsets are emitted (the cheap manifest —
    chunk text can be re-sliced at read time).

    Returns (id, chunk_idx, tok_start, tok_len[, chunk_text]).
    """
    if not 0 < stride <= window:
        raise ValueError(f"stride must be in 1..window, got {stride}/{window}")
    toks = ws_tokens(F.col(text_col))
    n = F.size(toks).cast("bigint")
    base = docs.filter(F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != ""))
    base = base.select(
        F.col(id_col),
        toks.alias("_t"),
        n.alias("_n"),
    )
    # chunk count from the MATERIALIZED token count (never re-derive
    # the split inside a later expr — the r2 withColumn-rebind gotcha);
    # exact integer div, token counts are far below any double cliff
    base = base.withColumn(
        "_k",
        F.when(
            F.col("_n") > window,
            F.expr(f"(_n - {window} + {stride} - 1) div {stride}"),
        )
        .otherwise(F.lit(0))
        .cast("bigint"),
    )
    out = base.select(
        F.col(id_col),
        F.col("_t"),
        F.col("_n"),
        F.explode(F.expr("sequence(CAST(0 AS BIGINT), _k)")).alias("chunk_idx"),
    ).select(
        F.col(id_col),
        F.col("chunk_idx"),
        (F.col("chunk_idx") * stride).alias("tok_start"),
        F.least(F.col("_n") - F.col("chunk_idx") * stride, F.lit(window))
        .cast("bigint")
        .alias("tok_len"),
        F.col("_t"),
    )
    if with_text:
        out = out.withColumn(
            "chunk_text",
            F.array_join(
                F.slice(
                    F.col("_t"),
                    (F.col("tok_start") + 1).cast("int"),
                    F.col("tok_len").cast("int"),
                ),
                " ",
            ),
        )
    return out.drop("_t")


# ---------------------------------------------------------------------------
# Training-set assembly: token-budget mixture + deterministic shard order
# ---------------------------------------------------------------------------

#: the bpe-ish token regex shared with dataset.token_count_bpe_ish and
#: pack_sequences — letter runs, digit runs, single punctuation marks.
#: ``\p{L}`` spells identically in Java regex and RE2 (oracle twin);
#: ASCII-identical to the historical ``[A-Za-z]+|\d+|[^\sA-Za-z\d]``.
#: Counted over CJK-PADDED text so a letter run can never swallow a
#: CJK span — each CJK char counts as one token (≈ how real BPE
#: vocabularies treat them).
_BPE_ISH = r"\p{L}+|\d+|[^\s\p{L}\d]"


def _n_tokens(text_col: str):
    return F.size(
        F.regexp_extract_all(cjk_pad(F.col(text_col)), F.lit(_BPE_ISH), F.lit(0))
    ).cast("bigint")


def _apply_rate_plan(
    docs: DataFrame,
    plan: DataFrame,
    stratum_col: str,
    id_col: str,
    salt: str,
) -> DataFrame:
    """Shared keep-filter for every permille-rate mixture plan:
    broadcast the one-row-per-stratum rate table into an equi-join,
    then keep a doc iff its md5 id bucket (0..999) falls below its
    stratum's ``rate_permille``. One definition so the kept-set rule
    (bucket count, salt handling, strictly-less comparison) cannot
    diverge between plan flavors."""
    return (
        docs.join(
            F.broadcast(plan.select(stratum_col, "rate_permille")),
            on=stratum_col,
            how="inner",
        )
        .withColumn("_bucket", _id_bucket(id_col, 1000, salt))
        .filter(F.col("_bucket") < F.col("rate_permille"))
        .drop("_bucket", "rate_permille")
    )


def mixture_plan(
    docs: DataFrame,
    weights_permille: dict[str, int],
    budget_tokens: int,
    stratum_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Turn a target token mixture ("web 600‰ / code 250‰ / academic
    150‰ of a B-token budget") into per-stratum keep rates: one row per
    stratum with its corpus token total and
    ``rate_permille = min(1000, (budget · weight) div tok_total)`` —
    exactly the fraction of the stratum's tokens the budget asks for
    (capped: an under-represented stratum is taken whole; upsampling is
    an epoch-level decision, not a sampling one).

    All arithmetic is bigint (weights stay permille, the single
    division is SQL ``div``), so the plan replays bit-identically in
    DuckDB. The output is one row per stratum — a broadcast-sized
    frame regardless of corpus size; the only corpus-wide work is one
    partial-aggregated groupBy(stratum) over a two-column projection.
    """
    w = F.lit(0).cast("bigint")
    for k, v in sorted(weights_permille.items()):
        w = F.when(F.col(stratum_col) == k, F.lit(v).cast("bigint")).otherwise(w)
    return (
        docs.select(F.col(stratum_col), _n_tokens(text_col).alias("_nt"))
        .groupBy(stratum_col)
        .agg(F.sum("_nt").cast("bigint").alias("tok_total"))
        .withColumn("_w", w)
        .select(
            stratum_col,
            "tok_total",
            F.expr(
                "CASE WHEN tok_total = 0 THEN CAST(0 AS BIGINT) "
                f"ELSE least(CAST(1000 AS BIGINT), ({budget_tokens} * _w) div tok_total) END"
            ).alias("rate_permille"),
        )
    )


def mixture_sample(
    docs: DataFrame,
    weights_permille: dict[str, int],
    budget_tokens: int,
    stratum_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "mix#0",
) -> DataFrame:
    """Apply a token-budget mixture plan: broadcast the one-row-per-
    stratum rate table into an equi-join, then keep a doc iff its md5
    id bucket (0..999) falls below its stratum's rate — the
    stratified_sample filter with rates DERIVED from a token budget
    instead of given. At 100 TB this is one aggregation scan (the
    plan) + one broadcast-join-filter scan: the corpus is never
    shuffled, and the kept set is stable under re-runs, repartitioning,
    and engine swaps (no RNG). Expected kept tokens per stratum ≈
    budget · weight ± hash-sampling noise (docs are kept whole — the
    unit of selection is the document, as in mixture training sets).
    """
    plan = mixture_plan(docs, weights_permille, budget_tokens, stratum_col, text_col)
    return _apply_rate_plan(docs, plan, stratum_col, id_col, salt)


def temperature_mixture_plan(
    docs: DataFrame,
    budget_tokens: int,
    alpha: float = 0.5,
    stratum_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Temperature (α) mixture plan — the multilingual-LM rebalancing
    rule (exponent-smoothed source weights, as popularized by
    XLM-R-style α-sampling): target token share of stratum s ∝
    tok_total_s^α. α=1 keeps natural proportions, α→0 flattens toward
    uniform (upweighting small sources); the derived rates feed the
    same md5-bucket keep filter as ``mixture_sample``.

    Float boundary: pow() is quantized to integer micro-units
    per-stratum BEFORE the normalizing sum (so the normalizer is an
    exact BIGINT — no float-summation-order hazard, the dsir_scores
    discipline); the wanted-token target is then one double ratio
    rounded straight to BIGINT (exact up to 2^53 ≈ 9e15 tokens), and
    the permille rate is pure integer arithmetic. Plan shape =
    mixture_plan: one partial-aggregated groupBy(stratum) over a
    two-column projection, ≤|strata| output rows, then a bounded
    partition-less window for the normalizer.
    """
    w_all = Window.partitionBy()
    tots = (
        docs.select(F.col(stratum_col), _n_tokens(text_col).alias("_nt"))
        .groupBy(stratum_col)
        .agg(F.sum("_nt").cast("bigint").alias("tok_total"))
    )
    pw_micro = (
        F.round(
            F.lit(1e6) * F.pow(F.col("tok_total").cast("double"), F.lit(float(alpha)))
        )
        .cast("bigint")
    )
    want = F.round(
        F.lit(float(budget_tokens))
        * F.col("_pw")
        / F.sum("_pw").over(w_all)
    ).cast("bigint")
    tots = tots.withColumn("_pw", pw_micro)
    return tots.withColumn("_want", want).select(
        stratum_col,
        "tok_total",
        F.when(F.col("tok_total") == 0, F.lit(0).cast("bigint"))
        .otherwise(
            F.least(
                F.lit(1000).cast("bigint"),
                F.expr("(1000 * _want) div tok_total"),
            )
        )
        .alias("rate_permille"),
    )


def temperature_mixture_sample(
    docs: DataFrame,
    budget_tokens: int,
    alpha: float = 0.5,
    stratum_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "mix#0",
) -> DataFrame:
    """Apply a temperature mixture plan: broadcast rate join + the
    deterministic md5-bucket keep filter (the mixture_sample shape —
    corpus never shuffled, layout/engine-stable kept set)."""
    plan = temperature_mixture_plan(docs, budget_tokens, alpha, stratum_col, text_col)
    return _apply_rate_plan(docs, plan, stratum_col, id_col, salt)


def training_shards(
    docs: DataFrame,
    n_shards: int,
    epoch: int = 0,
    id_col: str = "doc_id",
    salt: str = "ord#",
) -> DataFrame:
    """Deterministic global training-order shuffle + shard assignment
    (the last stage of a training-set build): shuffle key =
    60-bit md5(salt‖epoch‖'#'‖id), ``shard = key % n_shards``,
    ``pos`` = rank of the key within its shard (id tie-break). A new
    epoch is a new salt — a full reshuffle with zero coordinated RNG
    state, reproducible on any engine/cluster shape.

    Scale: one exchange keyed on shard; the within-shard rank is a
    sort of n/n_shards rows per task. n_shards is chosen from the
    target shard FILE size (~256 MB → 10⁵–10⁶ shards at 100 TB), so
    each sort task sees at most a few hundred MB — the same bound as
    any sort-based shuffle, with AQE free to coalesce small shards.
    Because the key is a uniform hash, shards are balanced by
    construction (no skewed-key hotspot regardless of doc-id layout).
    """
    h = F.md5(F.concat(F.lit(f"{salt}{epoch}#"), F.col(id_col).cast("string")))
    hkey = F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint")
    w = Window.partitionBy("shard").orderBy("_hkey", id_col)
    return (
        docs.select(F.col(id_col), hkey.alias("_hkey"))
        .withColumn("shard", (F.col("_hkey") % n_shards).cast("int"))
        .withColumn("pos", (F.row_number().over(w) - 1).cast("bigint"))
        .drop("_hkey")
    )
