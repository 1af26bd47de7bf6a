"""Large-scale training-data pipeline operators over ``documents`` and
``embeddings`` (task brief: dedup, similarity search, text analysis,
multimodal plumbing). These extend the reference's record pipeline with
the dataset-curation ops a 100 TB corpus job needs; all are shuffled on
explicit keys and designed so the only O(n²) work happens inside
LSH-candidate buckets, never globally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import (
    CYRILLIC_CLASS,
    HAN_CLASS,
    HANGUL_CLASS,
    KANA_CLASS,
    n_chars_in,
    ws_tokens,
)


def _ensure_parallelism(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Compute-heavy per-row ops (hashing every shingle/token) must not
    inherit a 1-file input's single partition: a 100 TB table arrives
    well-split, but a small dimension file would serialize the whole
    stage. Repartition ONLY when the input has fewer partitions than
    cores — never an unconditional shuffle."""
    par = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df

# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------

def normalized_fp(text_col: str):
    """md5 over whitespace-normalized lowercase text — THE exact-dup
    fingerprint (``fingerprint``, ``dedup_incremental``, the ingest
    index all share this one definition so stored fingerprints stay
    comparable across operators and engine versions)."""
    return F.md5(F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "))


def exact_dedup_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup via content hash: one aggregation, map-side partial.
    At scale this is a single shuffle on a 128-bit hash — the cheapest
    possible full-corpus dedup."""
    return docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.md5(F.col(text_col))).alias("n_distinct"),
    )


def dedup_keep_first(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup keeping the lowest id per normalized fingerprint
    (deterministic winner ⇒ reproducible corpus)."""
    fp = F.md5(F.lower(F.trim(F.col(text_col))))
    return (
        docs.withColumn("fp", fp)
        .groupBy("fp")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )


def fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 over whitespace-normalized lowercase
    text (the cheap rolling-hash analog; stable across runs/engines)."""
    return docs.select(F.col(id_col), normalized_fp(text_col).alias("fingerprint"))


def _shingles(toks, k: int = 3):
    """Word k-shingles as an array column (built-ins only):
    tokens[i:i+k] joined by space, via transform over index range.

    ``toks`` must be a MATERIALIZED token-array column (a bound
    attribute, e.g. ``F.col("_toks")`` after a select), never the
    inline ``ws_tokens(...)`` expression: HOF lambdas re-evaluate
    outer expressions per element (CLAUDE.md gotcha), so an inline
    tokenizer here re-tokenizes the document once per shingle —
    measured 7-10x slower on the shingle explode at sf1.0 (r6)."""
    n = F.greatest(F.size(toks) - (k - 1), F.lit(0))
    idx = F.sequence(F.lit(0), n - 1)
    return F.when(
        n > 0,
        F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(k)]))
        ),
    ).otherwise(F.array().cast("array<string>"))


def _md5_hasher(col, seed: int):
    """Engine-portable shingle hash: first 15 hex digits of
    md5(value + '#' + seed) as a 60-bit bigint — identical in Spark
    and DuckDB (the simhash_md5 trick applied to minhash)."""
    return F.conv(
        F.substring(F.md5(F.concat(col, F.lit(f"#{seed}"))), 1, 15), 16, 10
    ).cast("bigint")


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    shingle_k: int = 3,
    hasher=None,
) -> DataFrame:
    """MinHash signatures from word shingles.

    Shape: explode to (doc_id, shingle) rows, hash each shingle with
    ``num_hashes`` seeds (one cheap projection), then ONE groupBy(doc)
    taking per-seed mins + collect_set(shingle). This is the plan that
    scales: hashing is map-side, the single shuffle is keyed on doc_id.
    (A pure array-expression variant — array_min(transform(...)) × 32 —
    recomputes the shingle extraction per seed per row: measured ~300×
    slower. Column lambdas re-evaluate outer expressions per element.)

    Docs with fewer than ``shingle_k`` tokens produce no shingles and
    are absent from the output (they cannot be near-dup candidates).

    The ``shingles`` output column holds the seed-0 HASH of each
    distinct shingle, not the string (r6): exact-Jaccard verification
    only needs set intersection/union sizes, which are identical on
    the hashed sets absent a 60/64-bit collision inside one candidate
    pair's sets (astronomically unlikely; the md5-twin full-chain
    oracles stay green). Hashed sets collect/persist/shuffle longs
    instead of ~20-char strings and make the verify-stage
    array_intersect integer comparisons.
    """
    hasher = hasher or (lambda c, seed: F.xxhash64(c, F.lit(seed)))
    sh_rows = (
        _ensure_parallelism(docs)
        .select(F.col(id_col), ws_tokens(F.col(text_col)).alias("_toks"))
        .select(F.col(id_col), F.explode(_shingles(F.col("_toks"), shingle_k)).alias("shingle"))
    )
    # Per-occurrence hashing with the seed-0 hash projected once (it
    # feeds both min(_h0) and the verify set). A hash-distinct-
    # shingles-then-join-back variant was measured (r6): it only wins
    # with the hash table force-broadcast (3.6 s -> 2.5 s at sf1.0 on
    # the md5 twin), which bakes a bench-scale assumption into a
    # corpus-scale operator — under AQE's shuffle-then-convert it is
    # 3x SLOWER. Kept per-occurrence: one corpus shuffle, map-side
    # partial mins.
    sh_rows = sh_rows.select(
        F.col(id_col), F.col("shingle"), hasher(F.col("shingle"), 0).alias("_h0v")
    )
    mins = [F.min("_h0v").alias("_h0")] + [
        F.min(hasher(F.col("shingle"), i)).alias(f"_h{i}") for i in range(1, num_hashes)
    ]
    agg = sh_rows.groupBy(id_col).agg(*mins, F.collect_set("_h0v").alias("shingles"))
    return agg.select(
        F.col(id_col),
        F.col("shingles"),
        F.array(*[F.col(f"_h{i}") for i in range(num_hashes)]).alias("signature"),
    )


def _banded_buckets(
    sigs: DataFrame, id_col: str, num_hashes: int, bands: int, bucket_by_values: bool
) -> DataFrame:
    """(id, band, bucket) rows from a signature frame — band → bucket
    WITHOUT carrying the shingle arrays (keeps the exploded exchange
    narrow: 3 columns, not 8× duplicated arrays). Default bucket =
    xxhash64 of the band's signature slice (64-bit exchange key);
    ``bucket_by_values`` joins on the raw slice array instead — the
    engine-portable variant the DuckDB oracle can reproduce (same
    candidates modulo astronomically-unlikely xxhash64 slice
    collisions)."""
    rows = num_hashes // bands

    def bucket_expr(b: int):
        slice_cols = [F.col("signature")[b * rows + r] for r in range(rows)]
        return F.array(*slice_cols) if bucket_by_values else F.xxhash64(*slice_cols)

    return sigs.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), bucket_expr(b).alias("bucket"))
                    for b in range(bands)
                ]
            )
        ).alias("lsh"),
    ).select(id_col, "lsh.band", "lsh.bucket")


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    min_jaccard: float = 0.5,
    max_bucket_size: int = 1000,
    hasher=None,
    bucket_by_values: bool = False,
) -> DataFrame:
    """MinHash + LSH near-duplicate pairs:

    shingle → minhash (projection) → band → bucket self-join (the only
    shuffle, on band hash — candidate generation is O(candidates), not
    O(n²)) → exact shingle-set Jaccard verification of candidates.

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b.

    Mega-bucket guard: a bucket of B docs yields B²/2 candidates, so
    one boilerplate bucket (empty pages, license headers) can dwarf the
    rest of the job at corpus scale. Buckets larger than
    ``max_bucket_size`` are DROPPED before the self-join (standard
    web-dedup practice: members of a mega-bucket still co-occur in
    their other, more selective bands). AQE skew-join backstops what
    remains.
    """
    # Materialize signatures ONCE: the signature expression is ~32
    # array transforms over the shingle set — without a persist the
    # band self-join recomputes it on BOTH sides (measured 300×
    # slow-down). At 100 TB this persist becomes an intermediate
    # signatures table.
    sigs = minhash_signatures(docs, id_col, text_col, num_hashes, shingle_k, hasher).persist()

    banded = _banded_buckets(sigs, id_col, num_hashes, bands, bucket_by_values)

    # mega-bucket guard (see docstring): per-(band,bucket) count as a
    # WINDOW over the key the self-join shuffles on anyway — one
    # exchange per join side, no aggregate+join branch. (r3 shipped
    # the aggregate+join variant; because `banded` is unpersisted, the
    # whole guard chain re-ran on BOTH self-join sides and the bench
    # measured it ~1.8× over the unguarded r2 plan — VERDICT r3 #4.
    # The window's partitioning also feeds the self-join directly.)
    banded = (
        banded.withColumn(
            "_bn", F.count(F.lit(1)).over(Window.partitionBy("band", "bucket"))
        )
        .filter(F.col("_bn") <= max_bucket_size)
        .drop("_bn")
        # materialize the guarded banded rows once (narrow: id, band,
        # bucket): without this the explode+window guard re-runs on
        # both self-join sides (from the sigs cache, but still a full
        # window pass each — r6)
        .persist()
    )

    cand = (
        banded.alias("a")
        .join(banded.alias("b"), on=["band", "bucket"], how="inner")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )

    # join the shingle sets back only for the deduped candidates
    sh = sigs.select(F.col(id_col), F.col("shingles"))
    pairs = cand.join(sh.withColumnRenamed(id_col, "doc_a").withColumnRenamed("shingles", "sh_a"), "doc_a").join(
        sh.withColumnRenamed(id_col, "doc_b").withColumnRenamed("shingles", "sh_b"), "doc_b"
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        pairs.withColumn("jaccard", F.when(union > 0, inter / union).otherwise(F.lit(0.0)))
        .filter(F.col("jaccard") >= min_jaccard)
        .select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard"))
    )


def dedup_incremental(
    new_docs: DataFrame,
    existing_docs: DataFrame | None,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    min_jaccard: float = 0.5,
    max_bucket_size: int = 1000,
    hasher=None,
    bucket_by_values: bool = False,
    broadcast_new: bool = True,
    existing_sigs: DataFrame | None = None,
    existing_fps: DataFrame | None = None,
    cache_handle: list | None = None,
) -> DataFrame:
    """Incremental dedup: check a NEW ingest batch against an EXISTING
    corpus without re-deduplicating the corpus — the continuous-ingest
    shape at 100 TB (a daily crawl batch vs the accumulated corpus).

    Per new doc, two independent signals:
      * ``exact_dup`` — its whitespace-normalized md5 fingerprint
        already exists in the corpus (semi-join on the fingerprint);
      * ``n_near`` / ``first_match`` — count and smallest id of
        existing docs sharing an LSH band bucket AND verified at
        shingle-Jaccard ≥ ``min_jaccard`` (same banded MinHash as
        minhash_lsh_pairs, but an ASYMMETRIC new×existing join, never
        a self-join).
    ``kept`` = neither signal fired. Intra-batch duplicates are the
    batch's own curate_corpus pass — this operator's contract is
    strictly new-vs-existing.

    Scale shape: the existing side's signatures + guarded banded
    buckets are the INCREMENTAL INDEX — at corpus scale they are
    computed once per corpus version (a persisted table) and reused
    across ingest batches, so the per-batch cost is one scan of the
    index against the (broadcast, ``broadcast_new``) new batch: the
    existing corpus is never shuffled per batch. The mega-bucket
    guard is the same window count over the banded key as the
    self-join variant; candidate verification joins shingle sets for
    the candidate pairs only.

    Caching contract: the signature frames are persisted for in-call
    reuse (they feed both the banded buckets and the verify join).
    Pass ``existing_sigs`` (= ``minhash_signatures(corpus, ...)``,
    persisted or read from a table by the caller) to reuse the corpus
    index across ingest batches instead of re-persisting it per call;
    pass a list as ``cache_handle`` to receive every frame THIS call
    persisted so a long-lived session can ``unpersist()`` them after
    materializing the result — without it, repeated calls accumulate
    cached signature tables in executor storage memory.

    With BOTH ``existing_sigs`` and ``existing_fps`` (a frame with an
    ``_fp`` column of ``normalized_fp`` values, e.g. the stored ingest
    index), the existing corpus TEXT is never read: the per-batch cost
    is one scan of the index only — pass ``existing_docs=None``. This
    is the continuous-ingest fast path (``streaming.ingest_dedup_stream``).
    """
    if existing_docs is None and (existing_sigs is None or existing_fps is None):
        raise ValueError(
            "existing_docs=None requires both existing_sigs and existing_fps"
        )
    norm = normalized_fp(text_col)
    new_ids = new_docs.select(F.col(id_col))
    ex_fp = (
        existing_fps.select(F.col("_fp"))
        if existing_fps is not None
        else existing_docs.select(norm.alias("_fp"))
    )
    exact = (
        new_docs.select(F.col(id_col), norm.alias("_fp"))
        .join(ex_fp.dropDuplicates(["_fp"]), "_fp", "left_semi")
        .select(id_col)
        .withColumn("_exact", F.lit(1))
    )

    sigs_n = minhash_signatures(
        new_docs, id_col, text_col, num_hashes, shingle_k, hasher
    ).persist()
    if cache_handle is not None:
        cache_handle.append(sigs_n)
    if existing_sigs is not None:
        sigs_e = existing_sigs
    else:
        sigs_e = minhash_signatures(
            existing_docs, id_col, text_col, num_hashes, shingle_k, hasher
        ).persist()
        if cache_handle is not None:
            cache_handle.append(sigs_e)
    banded_n = _banded_buckets(sigs_n, id_col, num_hashes, bands, bucket_by_values)
    banded_e = (
        _banded_buckets(sigs_e, id_col, num_hashes, bands, bucket_by_values)
        .withColumn(
            "_bn", F.count(F.lit(1)).over(Window.partitionBy("band", "bucket"))
        )
        .filter(F.col("_bn") <= max_bucket_size)
        .drop("_bn")
    )
    if broadcast_new:
        banded_n = F.broadcast(banded_n)
    cand = (
        banded_e.withColumnRenamed(id_col, "_ex_id")
        .join(banded_n.withColumnRenamed(id_col, "_new_id"), ["band", "bucket"])
        .select("_new_id", "_ex_id")
        .dropDuplicates(["_new_id", "_ex_id"])
    )
    pairs = cand.join(
        sigs_n.select(F.col(id_col).alias("_new_id"), F.col("shingles").alias("_sh_n")),
        "_new_id",
    ).join(
        sigs_e.select(F.col(id_col).alias("_ex_id"), F.col("shingles").alias("_sh_e")),
        "_ex_id",
    )
    inter = F.size(F.array_intersect("_sh_n", "_sh_e")).cast("double")
    union = F.size(F.array_union("_sh_n", "_sh_e")).cast("double")
    near = (
        pairs.withColumn(
            "_j", F.when(union > 0, inter / union).otherwise(F.lit(0.0))
        )
        .filter(F.col("_j") >= min_jaccard)
        .groupBy("_new_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_near"),
            F.min("_ex_id").alias("first_match"),
        )
        .withColumnRenamed("_new_id", id_col)
    )
    return (
        new_ids.join(exact, id_col, "left")
        .join(near, id_col, "left")
        .select(
            id_col,
            F.coalesce("_exact", F.lit(0)).cast("int").alias("exact_dup"),
            F.coalesce("n_near", F.lit(0).cast("bigint")).alias("n_near"),
            F.coalesce("first_match", F.lit(-1).cast("bigint")).alias("first_match"),
            F.when(
                (F.coalesce("_exact", F.lit(0)) == 0) & F.col("n_near").isNull(),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .cast("int")
            .alias("kept"),
        )
    )


def _token_rows(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, tok) rows from distinct whitespace tokens — the map-side
    explode shared by every SimHash variant. Docs with NULL text
    produce no rows (they can't be near-dup candidates)."""
    return _ensure_parallelism(docs).select(
        F.col(id_col),
        F.explode(F.array_distinct(ws_tokens(F.col(text_col)))).alias("tok"),
    )


def _simhash_from_token_hashes(hashed: DataFrame, id_col: str, bits: int) -> DataFrame:
    """Shared SimHash vote/pack stage: (id, th) token-hash rows → ONE
    groupBy(id) with ``bits`` conditional-sum votes (map-side partial
    agg), then sign bits packed into a bigint. This is the plan shape
    that scales — each token is hashed exactly once. (r1's
    array-expression variant evaluated the token hashing once per bit:
    column lambdas re-evaluate outer expressions per element — the
    repo's documented ~300× gotcha. Deleted per VERDICT r1.)

    Bits are disjoint, so XOR-combining the shifted sign bits equals
    addition while staying safe for bit 63 under ANSI mode."""
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("th"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"_v{j}")
        for j in range(bits)
    ]
    agg = hashed.groupBy(id_col).agg(*votes)
    sim = None
    for j in range(bits):
        bit = F.when(F.col(f"_v{j}") > 0, F.lit(1).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
        term = F.shiftleft(bit, j)
        sim = term if sim is None else sim.bitwiseXOR(term)
    return agg.select(F.col(id_col), sim.alias("simhash"))


def simhash64(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash over word tokens (xxhash64 production variant):
    explode → one groupBy — same scale shape as minhash/simhash_md5,
    via the shared vote/pack stage."""
    hashed = _token_rows(docs, id_col, text_col).select(id_col, F.xxhash64("tok").alias("th"))
    return _simhash_from_token_hashes(hashed, id_col, 64)


def simhash_md5(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 32) -> DataFrame:
    """Engine-portable SimHash: token hash = first 15 hex digits of
    md5 (60 bits, identical in any engine) through the shared
    vote/pack stage. Used by the oracle-checked ``simhash_md5`` query;
    ``simhash64`` is the faster xxhash64 production variant."""
    th = F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("bigint")
    hashed = _token_rows(docs, id_col, text_col).select(id_col, th.alias("th"))
    return _simhash_from_token_hashes(hashed, id_col, bits)


def simhash_neardup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 8,
    n_bands: int = 4,
    simhash_fn=None,
    bits: int = 64,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """SimHash near-duplicate search: band the ``bits``-bit simhash
    into ``n_bands`` equal blocks — any pair within Hamming distance
    n_bands−1 shares at least one identical band (pigeonhole), so a
    band-equality self-join generates candidates without O(n²); then
    verify exact Hamming ≤ ``max_hamming`` via bit_count(xor).
    With ``max_hamming ≤ n_bands − 1`` the candidate set is COMPLETE
    (no recall loss) — that configuration is what the DuckDB oracle
    checks against a brute-force Hamming join.

    Mega-bucket guard (VERDICT r2 item 2 — the minhash `_bn` pattern):
    one boilerplate block value shared by B near-identical docs (empty
    pages, license headers) makes the band self-join B²/2 — blocks with
    more than ``max_bucket_size`` members are dropped BEFORE the join.
    Recall caveat this guard accepts: docs that agree on a dropped
    block can still meet via their other blocks unless they are
    near-identical in every band (the true-duplicate case exact dedup
    catches upstream, and the pigeonhole completeness claim then holds
    only for blocks under the guard — the oracle config keeps the
    guard non-binding).

    ``simhash_fn`` picks the hash stage (default ``simhash64``;
    ``simhash_md5`` for the engine-portable twin). Same shuffle shape
    as the MinHash LSH plan: one band-keyed join.
    Returns (doc_a, doc_b, hamming).
    """
    sims = (simhash_fn or simhash64)(docs, id_col, text_col).persist()
    block = bits // n_bands
    banded = sims.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("simhash"), b * block)
                        .bitwiseAND(F.lit((1 << block) - 1))
                        .alias("block"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("lsh"),
    ).select(id_col, "simhash", "lsh.band", "lsh.block")
    # window-count guard — same rationale as minhash_lsh_pairs
    banded = (
        banded.withColumn(
            "_bn", F.count(F.lit(1)).over(Window.partitionBy("band", "block"))
        )
        .filter(F.col("_bn") <= max_bucket_size)
        .drop("_bn")
    )
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), on=["band", "block"], how="inner")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.col("a.simhash").alias("h_a"),
            F.col("b.simhash").alias("h_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def char_ngrams(text_col: str, n: int = 3):
    """Distinct character n-grams as an array column (built-ins only);
    texts shorter than ``n`` produce an empty array."""
    col = F.col(text_col)
    positions = F.sequence(F.lit(1), F.length(col) - (n - 1))
    return F.when(
        F.length(col) >= n,
        F.array_distinct(F.transform(positions, lambda i: col.substr(i, F.lit(n)))),
    ).otherwise(F.array().cast("array<string>"))


def ngram_jaccard_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Character n-gram Jaccard similarity for the given candidate
    pairs (doc_a, doc_b) — the exact-verify stage any fuzzy-dedup
    candidate generator (MinHash bands, SimHash blocks, blocking keys)
    feeds into. Two broadcast-or-shuffle joins to attach the gram
    sets, then pure array arithmetic — no UDF, no all-pairs work.
    Returns (doc_a, doc_b, jaccard)."""
    g = _ensure_parallelism(docs).select(F.col(id_col), char_ngrams(text_col, n).alias("grams"))
    ga = g.select(F.col(id_col).alias("doc_a"), F.col("grams").alias("ga"))
    gb = g.select(F.col(id_col).alias("doc_b"), F.col("grams").alias("gb"))
    joined = pairs.join(ga, "doc_a").join(gb, "doc_b")
    inter = F.size(F.array_intersect("ga", "gb")).cast("double")
    union = F.size(F.array_union("ga", "gb")).cast("double")
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return joined.select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD 2003)
# ---------------------------------------------------------------------------

def _positional_shingles(docs: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """(id, pos, shingle) rows preserving order and duplicates — the
    positional variant of ``_shingles`` (winnowing is position-aware,
    so no array_distinct here). The token array is materialized in a
    first select so the shingle lambda reads a bound attribute, not
    the tokenizer expression (same per-element recompute gotcha as
    ``_shingles`` — r6)."""
    toks = F.col("_toks")
    n = F.greatest(F.size(toks) - (k - 1), F.lit(0))
    arr = F.when(
        n > 0,
        F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(k)]),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        _ensure_parallelism(docs)
        .select(F.col(id_col), ws_tokens(F.col(text_col)).alias("_toks"))
        .select(F.col(id_col), F.posexplode(arr).alias("pos", "shingle"))
    )


def winnow_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    w: int = 4,
    hasher=None,
) -> DataFrame:
    """Robust winnowing document fingerprints (the MOSS algorithm —
    Schleimer/Wilkerson/Aiken, "Winnowing: Local Algorithms for
    Document Fingerprinting", SIGMOD 2003): hash every word
    ``k``-shingle, slide a window of ``w`` consecutive hashes, and
    select each window's minimum (rightmost on ties). Guarantees: any
    shared substring of ≥ w+k-1 tokens yields ≥1 shared fingerprint,
    and the selected density is ~2/(w+1) — position-aware, unlike
    MinHash (set-level) or SimHash (bit-level).

    Shape: positional shingle explode (map-side) → ONE exchange on
    ``id_col`` feeding two window functions (rightmost-min-of-frame
    via ``min(struct(hash, -pos))``, plus the per-doc gram count) →
    distinct. Whole chain is codegen built-ins; the md5 ``hasher``
    twin reproduces bit-for-bit in DuckDB (full-chain oracle).

    Windows shorter than ``w`` (docs with < w shingles) contribute the
    rightmost-min over the whole doc, so every doc with ≥ k tokens
    gets ≥1 fingerprint. Returns (id, fp_pos, fp_hash) distinct rows.
    """
    hasher = hasher or (lambda c, seed: F.xxhash64(c, F.lit(seed)))
    rows = _positional_shingles(docs, id_col, text_col, k).select(
        F.col(id_col), F.col("pos"), hasher(F.col("shingle"), 0).alias("h")
    )
    frame = (
        Window.partitionBy(id_col).orderBy("pos").rowsBetween(-(w - 1), Window.currentRow)
    )
    sel = rows.select(
        F.col(id_col),
        F.col("pos"),
        F.min(F.struct(F.col("h"), (-F.col("pos")).alias("np"))).over(frame).alias("s"),
        F.count(F.lit(1)).over(Window.partitionBy(id_col)).alias("n"),
    )
    return (
        sel.filter((F.col("pos") >= w - 1) | (F.col("pos") == F.col("n") - 1))
        .select(
            F.col(id_col),
            (-F.col("s.np")).alias("fp_pos"),
            F.col("s.h").alias("fp_hash"),
        )
        .distinct()
    )


def winnow_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    w: int = 4,
    min_shared: int = 2,
    max_postings: int = 500,
    hasher=None,
) -> DataFrame:
    """Near-duplicate candidate pairs from shared winnowing
    fingerprints: docs sharing ≥ ``min_shared`` distinct fingerprint
    hashes (each shared hash witnesses a shared token run — the
    plagiarism-detection notion of overlap, robust to reordering of
    non-overlapping parts).

    Scale shape mirrors ``minhash_lsh_pairs``: the posting-list join is
    keyed on the fingerprint hash; hyper-common fingerprints
    (boilerplate runs) are dropped by a WINDOW count over the join key
    itself (> ``max_postings`` docs ⇒ drop — one exchange that the
    self-join then reuses, no aggregate+join branch; see the minhash
    mega-bucket guard note). Returns (doc_a, doc_b, n_shared).
    """
    fps = winnow_fingerprints(docs, id_col, text_col, k, w, hasher)
    posting = fps.select(F.col(id_col), F.col("fp_hash")).distinct()
    posting = (
        posting.withColumn(
            "_pn", F.count(F.lit(1)).over(Window.partitionBy("fp_hash"))
        )
        .filter(F.col("_pn") <= max_postings)
        .drop("_pn")
        # materialize ONCE: the self-join otherwise recomputes the
        # whole fingerprint chain (explode -> hash -> two windows ->
        # distinct -> guard) on its broadcast build side — measured
        # ~2x the query at sf1.0 (r6). At corpus scale this persist is
        # the stored fingerprint-posting table.
        .persist()
    )
    return (
        posting.alias("a")
        .join(posting.alias("b"), on="fp_hash", how="inner")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def duplicate_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 16,
    hasher=None,
) -> DataFrame:
    """Exact duplicated-substring spans (the ExactSubstr dedup of Lee
    et al., "Deduplicating Training Data Makes Language Models Better",
    ACL 2022, re-expressed at token-window granularity): any run of
    ``window`` consecutive tokens that occurs more than once in the
    corpus is a duplicate; for each duplicated window exactly ONE
    occurrence — the globally smallest (id, pos) — is the keeper, and
    every other occurrence is marked. Marked windows overlapping or
    touching within a doc merge into maximal spans (gaps-and-islands),
    so the output is the minimal span manifest a strip pass needs.

    Scale shape: positional ``window``-token shingles (map-side
    explode, the winnowing machinery) → ONE exchange on the window
    hash where a sort-free ``min(struct(id, pos))`` window aggregate
    elects the keeper (a hyper-common boilerplate window is a large
    hash partition, but the pass over it is linear — no self-join, so
    no mega-bucket blowup) → one exchange on ``id_col`` for the span
    merge. No UDFs; the md5 ``hasher`` twin reproduces the whole chain
    in DuckDB (full-chain oracle).

    Returns (id, span_start, span_end, n_dup_windows): token-index
    spans, ``span_end`` exclusive, disjoint and non-adjacent per doc.
    """
    hasher = hasher or (lambda c, seed: F.xxhash64(c, F.lit(seed)))
    rows = _positional_shingles(docs, id_col, text_col, window).select(
        F.col(id_col),
        F.col("pos").cast("bigint").alias("pos"),
        hasher(F.col("shingle"), 0).alias("h"),
    )
    keeper = F.min(F.struct(F.col(id_col).alias("i"), F.col("pos").alias("p"))).over(
        Window.partitionBy("h")
    )
    dup = (
        rows.withColumn("_k", keeper)
        .filter(~((F.col("_k.i") == F.col(id_col)) & (F.col("_k.p") == F.col("pos"))))
        .select(id_col, "pos")
    )
    wd = Window.partitionBy(id_col).orderBy("pos")
    prev_end = F.max(F.col("pos") + window).over(
        wd.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = dup.select(
        F.col(id_col),
        F.col("pos"),
        F.when(prev_end.isNull() | (F.col("pos") > prev_end), 1)
        .otherwise(0)
        .alias("_new"),
    )
    return (
        flagged.withColumn(
            "_sid", F.sum("_new").over(wd.rowsBetween(Window.unboundedPreceding, 0))
        )
        .groupBy(id_col, "_sid")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + window).cast("bigint").alias("span_end"),
            F.count(F.lit(1)).cast("bigint").alias("n_dup_windows"),
        )
        .drop("_sid")
    )


def strip_duplicate_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 16,
    hasher=None,
    spans: DataFrame | None = None,
) -> DataFrame:
    """Rebuild each doc's text with its duplicated spans removed —
    keep-first ExactSubstr dedup: the keeper occurrence (globally
    smallest (id, pos) per window, see ``duplicate_spans``) retains
    its text; every other occurrence's maximal span is cut at token
    granularity. Pass a precomputed ``spans`` frame to reuse a
    manifest across passes.

    Shape: span manifest → per-doc ``collect_list`` (spans per doc are
    few and disjoint) → broadcast-eligible doc-keyed LEFT join back to
    the corpus → higher-order filter over the token array (index-aware
    lambda + ``exists`` over the span array; JVM-side, no UDF).
    Rebuilding joins kept tokens with single spaces — intra-doc
    whitespace runs are normalized, the same contract as
    ``paragraph_dedup`` reassembly.

    Returns the input columns with ``text_col`` rewritten plus
    ``n_removed_tokens`` (0 for untouched docs).
    """
    if spans is None:
        spans = duplicate_spans(docs, id_col, text_col, window, hasher)
    sp = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans"),
        F.sum(F.col("span_end") - F.col("span_start")).alias("_n_cut"),
    )
    toks = ws_tokens(F.col(text_col))
    kept = F.filter(
        toks,
        lambda t, i: ~F.exists(
            F.col("_spans"),
            lambda s: (i.cast("bigint") >= s["span_start"])
            & (i.cast("bigint") < s["span_end"]),
        ),
    )
    out_cols = docs.columns
    return (
        docs.join(sp, on=id_col, how="left")
        .withColumn(
            text_col,
            F.when(F.col("_spans").isNull(), F.col(text_col)).otherwise(
                F.array_join(kept, " ")
            ),
        )
        .withColumn(
            "n_removed_tokens",
            F.coalesce(F.col("_n_cut"), F.lit(0)).cast("bigint"),
        )
        .select(*out_cols, "n_removed_tokens")
    )


# ---------------------------------------------------------------------------
# Similarity search (ANN over embeddings)
# ---------------------------------------------------------------------------

def cosine_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k: broadcast the query vectors against the
    partitioned corpus — the exact-baseline plan (one broadcast join,
    no shuffle until the final per-query top-k). All arithmetic in
    double via built-in ``zip_with``/``aggregate`` (JVM-side; no UDF).

    Returns (q_id, neighbor_id, rank). The scale path swaps the corpus
    side for an IVF/LSH-bucketed pre-filter (`ivf_topk`)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    norm = lambda c: F.sqrt(F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))  # noqa: E731
    # norms are per-VECTOR, so compute them once per corpus/query row
    # BEFORE the pair fan-out — the old shape re-ran both norm
    # traversals per candidate pair (|queries| x per corpus row),
    # measured ~2x the whole query at sf1.0 (r6). Same expression on
    # the same array => bit-identical sim values.
    base = emb.select(F.col(id_col), v.alias("v")).withColumn("nv", norm(F.col("v")))
    q = base.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("q_id"), F.col("v").alias("qv"), F.col("nv").alias("nq")
    )
    dot = F.aggregate(F.zip_with("v", "qv", lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x)
    pairs = (
        base.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("q_id"))
        .withColumn("sim", dot / (F.col("nv") * F.col("nq")))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.col(id_col))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", F.col(id_col).alias("neighbor_id"), "rank")
    )


def xxhash_direction(i, j: int):
    """Default sign-LSH hyperplane component: xxhash64(dim, plane)
    parity scaled to ±1 — cheap, deterministic, model-free."""
    return F.pmod(F.xxhash64(i, F.lit(j)), F.lit(2)).cast("double") * 2.0 - 1.0


def md5_direction(i, j: int):
    """Engine-portable hyperplane component: md5 first-byte parity of
    'dim#plane' — reproducible in DuckDB for the oracle twin."""
    h = F.conv(
        F.substring(F.md5(F.concat(i.cast("string"), F.lit(f"#{j}"))), 1, 2), 16, 10
    ).cast("int")
    return F.pmod(h, F.lit(2)).cast("double") * 2.0 - 1.0


def ivf_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_probe_bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    direction_fn=None,
) -> DataFrame:
    """LSH-bucketed ANN (the scale path): corpus and queries are
    sign-hashed on ``n_probe_bits`` random hyperplanes (deterministic
    seeds); candidates = same bucket (plus all when bucket is empty of
    k). Recall < 1 by construction — exactness is `cosine_topk`'s job.

    Implementation note: hyperplane h_j uses xxhash64(dim, j) scaled to
    ±1 as a cheap deterministic pseudo-random direction, so the bucket
    id is computable by both the corpus scan and the query side without
    a trained model artifact.
    """
    direction_fn = direction_fn or xxhash_direction
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = emb.select(F.col(id_col), v.alias("v"))

    def bucket(col):
        def bit(j: int):
            proj = F.aggregate(
                F.zip_with(
                    col,
                    F.sequence(F.lit(0), F.size(col) - 1),
                    lambda x, i: x * direction_fn(i, j),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            return F.when(proj > 0, F.lit(1 << j)).otherwise(F.lit(0))

        out = bit(0)
        for j in range(1, n_probe_bits):
            out = out + bit(j)
        return out

    norm = lambda c: F.sqrt(F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))  # noqa: E731
    # per-vector norms computed once per row, not per candidate pair
    # (same rationale + bit-identity argument as cosine_topk — r6)
    corpus = base.withColumn("bucket", bucket(F.col("v"))).withColumn(
        "nv", norm(F.col("v"))
    )
    # multi-probe LSH: each query probes its own bucket plus every
    # bucket at Hamming distance 1 — the standard recall lever that
    # keeps the candidate set ~(1+bits)/2^bits of the corpus.
    probes = F.array(
        F.col("bucket"), *[F.col("bucket").bitwiseXOR(F.lit(1 << j)) for j in range(n_probe_bits)]
    )
    q = (
        corpus.filter(F.col(id_col).isin(query_ids))
        .select(
            F.col(id_col).alias("q_id"),
            F.col("v").alias("qv"),
            F.col("nv").alias("nq"),
            F.explode(probes).alias("qbucket"),
        )
    )
    dot = F.aggregate(F.zip_with("v", "qv", lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x)
    pairs = (
        corpus.join(F.broadcast(q), on=F.col("bucket") == F.col("qbucket"), how="inner")
        .filter(F.col(id_col) != F.col("q_id"))
        .withColumn("sim", dot / (F.col("nv") * F.col("nq")))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.col(id_col))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", F.col(id_col).alias("neighbor_id"), "rank")
    )


def dedup_clusters(pairs: DataFrame, max_iter: int = 20) -> DataFrame:
    """Connected components over near-duplicate pairs → cluster ids
    (keep one doc per cluster for corpus dedup). Iterative min-label
    propagation with lineage cuts per round; converges in
    O(log(diameter)) rounds for the short chains LSH produces.

    Scale note: each round is one shuffle join on the edge list. For
    web-scale graphs swap in the large-star/small-star algorithm
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    same DataFrame shape, fewer rounds on skewed degree distributions.
    Returns (doc_id, cluster_id = min doc_id in component).
    """
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).union(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
    edges = edges.distinct().localCheckpoint()
    labels = (
        edges.select(F.col("src").alias("id")).distinct().withColumn("cluster_id", F.col("id"))
    ).localCheckpoint()
    for _ in range(max_iter):
        nbr = (
            edges.join(labels, edges["dst"] == labels["id"], "inner")
            .groupBy("src")
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        # carry the old label through the checkpoint so the changed
        # check is a filter on the materialized frame, not a second
        # join against the previous labels
        new_labels = (
            labels.join(nbr, labels["id"] == nbr["src"], "left")
            .select(
                F.col("id"),
                F.col("cluster_id").alias("_old"),
                F.least(F.col("cluster_id"), F.coalesce(F.col("nbr_min"), F.col("cluster_id"))).alias(
                    "cluster_id"
                ),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.filter(F.col("cluster_id") != F.col("_old")).limit(1).count()
        )
        labels = new_labels.drop("_old")
        if changed == 0:
            break
    return labels.select(F.col("id").alias("doc_id"), "cluster_id")


def dedup_clusters_star(pairs: DataFrame, max_iter: int = 20, stats: dict | None = None) -> DataFrame:
    """Connected components via alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    the production CC for web-scale near-dup graphs: each round rewires
    nodes DIRECTLY toward their component minimum, so convergence is
    O(log n) rounds even on skewed degree distributions and long
    chains, where plain min-label propagation needs O(diameter) rounds
    (see ``dedup_clusters``). Each half-round is one groupBy + one
    join on the edge list; lineage is cut per round.

    large-star: every neighbor v > u attaches to min(Γ(u) ∪ {u});
    small-star: every neighbor v ≤ u (plus u) attaches to min(Γ⁻(u) ∪ {u}).
    Fixpoint = union of stars centered at component minima.

    Returns (doc_id, cluster_id = min doc_id in component) for every
    node appearing in ``pairs`` — identical output contract to
    ``dedup_clusters`` (equality-tested)."""
    def canon(df: DataFrame) -> DataFrame:
        return (
            df.filter(F.col("x") != F.col("y"))
            .select(F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b"))
            .distinct()
        )

    edges = canon(
        pairs.select(F.col("doc_a").alias("x"), F.col("doc_b").alias("y"))
    ).localCheckpoint()
    rounds = 0
    converged = False
    for _ in range(max_iter):
        rounds += 1
        # large-star over the symmetric neighbor view
        sym = edges.unionByName(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
        mins = sym.groupBy("a").agg(F.min("b").alias("mn"))
        ls = canon(
            sym.join(mins, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("x"), F.least(F.col("mn"), F.col("a")).alias("y"))
        )
        # small-star on the canonical (lo=a < hi=b) orientation:
        # group by hi; every lo-neighbor and hi itself attach to the
        # minimum lo-neighbor
        minsS = ls.groupBy("b").agg(F.min("a").alias("mn"))
        ss = canon(
            ls.join(minsS, "b")
            .select(F.col("a").alias("x"), F.col("mn").alias("y"))
            .unionByName(minsS.select(F.col("b").alias("x"), F.col("mn").alias("y")))
        ).localCheckpoint()
        # convergence in ONE job (r6 — the count + anti-join pair cost
        # two scheduler round-trips per iteration, which dominates on
        # small graphs): both sides are canonical DISTINCT edge sets,
        # so they are equal iff no (a, b) appears in exactly one side
        # of the union-all — an exact set-equality test.
        converged = (
            ss.unionByName(edges)
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("_c"))
            .filter(F.col("_c") == 1)
            .limit(1)
            .count()
            == 0
        )
        edges = ss
        if converged:
            break
    if not converged:
        # ADVICE r2: a silent fall-through here hands callers labels
        # that may not be component minima — surface it loudly (the
        # star iteration converges in O(log n) rounds, so hitting
        # max_iter means something is pathologically wrong)
        import warnings

        warnings.warn(
            f"dedup_clusters_star: NOT converged after {rounds} rounds "
            "(max_iter reached) — cluster_id values may not be component minima",
            RuntimeWarning,
            stacklevel=2,
        )
    if stats is not None:
        stats["rounds"] = rounds
        stats["converged"] = converged
    sym = edges.unionByName(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
    return (
        sym.groupBy("a")
        .agg(F.min("b").alias("mn"))
        .select(F.col("a").alias("doc_id"), F.least("a", "mn").alias("cluster_id"))
    )


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bands: int = 4,
    band_bits: int | None = None,
    target_bucket_size: int = 1000,
    max_bucket_size: int = 1000,
    exact: bool = False,
    direction_fn=None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the semantic-dedup stage
    of a training-data pipeline). Default path: MULTI-BAND sign-LSH —
    ``n_bands`` independent bands of ``band_bits`` hyperplane sign bits
    each; a pair is a candidate when it collides in ANY band
    (OR-amplification, the recall lever a single-band hash lacks), then
    exact cosine verifies. ``exact=True`` is the brute-force baseline
    (broadcastable only for small corpora; used by the oracle-checked
    query).

    Scale design (VERDICT r2 item 1 — this replaces the fixed-16-bucket
    single-band plan):
      * bucket count per band is 2**band_bits; when ``band_bits`` is
        None it is sized from the corpus so the EXPECTED bucket holds
        ~``target_bucket_size`` docs — bits ≈ log2(n / target) — which
        keeps the within-bucket self-join O(n · target) instead of
        O(n²/constant);
      * the ``max_bucket_size`` pre-join guard (same `_bn` pattern as
        ``minhash_lsh_pairs``) drops degenerate mega-buckets (e.g. a
        zero-vector pileup) before they explode the self-join; members
        still meet in their other, more selective bands;
      * plan shape is identical to the minhash path: one narrow
        (id, band, bucket) explode, one band-keyed self-join, exact
        verify only on deduped candidates.

    ``direction_fn`` picks the hyperplane family (default
    ``xxhash_direction``; ``md5_direction`` for the engine-portable
    DuckDB oracle twin). Band b uses hyperplanes b*band_bits+r so the
    bands are independent.

    Returns (vec_a, vec_b, cos) with vec_a < vec_b, cos ≥ threshold.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x))
    base = emb.select(F.col(id_col), v.alias("v"), norm.alias("nrm"))

    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    cos = dot / (F.col("a.nrm") * F.col("b.nrm"))

    if exact:
        pairs = base.alias("a").join(
            F.broadcast(base.alias("b")), F.col(f"a.{id_col}") < F.col(f"b.{id_col}"), "inner"
        )
        return (
            pairs.select(
                F.col(f"a.{id_col}").alias("vec_a"),
                F.col(f"b.{id_col}").alias("vec_b"),
                cos.alias("cos"),
            )
            .filter(F.col("cos") >= threshold)
            .select("vec_a", "vec_b", F.round("cos", 4).alias("cos"))
        )

    direction_fn = direction_fn or xxhash_direction
    if band_bits is None:
        # corpus-scaled bucket bits: 2^bits buckets ≈ n / target size.
        # One count() job — at 100 TB this is the same O(scan-metadata)
        # cardinality estimate any LSH planner needs; pass band_bits
        # explicitly to skip it.
        import math

        n = emb.count()
        band_bits = max(2, min(24, math.ceil(math.log2(max(n, 2) / max(target_bucket_size, 1)))))

    base = _ensure_parallelism(base).persist()

    def _projector(j: int):
        # exact 2-arity lambda: a default-arg capture (lambda x, i, j=j)
        # reads as a 3-arg lambda to Spark's HOF binder (CLAUDE.md gotcha)
        return lambda x, i: x * direction_fn(i, j)

    def band_bucket(col, b: int):
        """Packed sign bits of band b (hyperplanes b*band_bits+r)."""
        out = None
        for r in range(band_bits):
            proj = F.aggregate(
                F.zip_with(
                    col,
                    F.sequence(F.lit(0), F.size(col) - 1),
                    _projector(b * band_bits + r),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bit = F.when(proj > 0, F.lit(1 << r)).otherwise(F.lit(0))
            out = bit if out is None else out + bit
        return out

    # narrow (id, band, bucket) rows — the vector itself never enters
    # the exploded exchange (it is joined back only for verified
    # candidates, exactly like the minhash shingle-set join-back)
    banded = base.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), band_bucket(F.col("v"), b).alias("bucket"))
                    for b in range(n_bands)
                ]
            )
        ).alias("lsh"),
    ).select(id_col, "lsh.band", "lsh.bucket")

    # mega-bucket guard (the minhash `_bn` WINDOW pattern): counts ride
    # the same exchange the self-join needs — no aggregate+join branch
    banded = (
        banded.withColumn(
            "_bn", F.count(F.lit(1)).over(Window.partitionBy("band", "bucket"))
        )
        .filter(F.col("_bn") <= max_bucket_size)
        .drop("_bn")
    )

    cand = (
        banded.alias("a")
        .join(banded.alias("b"), on=["band", "bucket"], how="inner")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("vec_a"), F.col(f"b.{id_col}").alias("vec_b"))
        .dropDuplicates(["vec_a", "vec_b"])
    )
    va = base.select(F.col(id_col).alias("vec_a"), F.col("v").alias("_va"), F.col("nrm").alias("_na"))
    vb = base.select(F.col(id_col).alias("vec_b"), F.col("v").alias("_vb"), F.col("nrm").alias("_nb"))
    dot_c = F.aggregate(
        F.zip_with(F.col("_va"), F.col("_vb"), lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    cos_c = dot_c / (F.col("_na") * F.col("_nb"))
    return (
        cand.join(va, "vec_a")
        .join(vb, "vec_b")
        .withColumn("cos", cos_c)
        .filter(F.col("cos") >= threshold)
        .select("vec_a", "vec_b", F.round("cos", 4).alias("cos"))
    )


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 20,
    min_chars: int = 100,
    min_jaccard: float = 0.2,
    num_hashes: int = 8,
    bands: int = 4,
    hasher=None,
    bucket_by_values: bool = False,
    max_bucket_size: int = 1000,
    bench: DataFrame | None = None,
    contamination_n: int = 8,
) -> DataFrame:
    """The end-to-end training-data curation pipeline, composed from
    the individual stages (each separately oracle-checked):

        quality gate (length/diversity thresholds)
        → exact dedup (keep lowest id per normalized fingerprint)
        → MinHash+LSH near-dup clusters → keep one doc per cluster
          (the cluster minimum — deterministic, reproducible corpus)
        → [optional] benchmark decontamination: drop any survivor
          sharing a word ``contamination_n``-gram with a ``bench``
          item (curation.contamination_check — broadcast bench side)

    Returns the kept ``doc_id`` set. Plan shape: two semi-joins +
    the bucketed LSH chain + star-CC — no all-pairs work anywhere, so
    the composition scales exactly as far as its worst stage (the
    banded self-join). Decontamination runs over the SURVIVOR set
    (smallest frame with an identical kept-set result, since dropped
    docs are dropped either way).

    ``max_bucket_size`` defaults to the GUARDED 1000 (VERDICT r2
    item 3: the production composition must keep the mega-bucket guard
    it depends on); only the DuckDB oracle-parity query passes a large
    value explicitly so the full-chain oracle sees every candidate."""
    stats = text_stats(docs, id_col, text_col)
    quality_ids = stats.filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_chars") >= min_chars)
        & (F.col("n_distinct_tokens") * 4 >= F.col("n_tokens"))
    ).select(id_col)
    quality_docs = docs.join(quality_ids, id_col, "left_semi")
    exact_ids = dedup_keep_first(quality_docs, id_col, text_col)
    exact_docs = quality_docs.join(exact_ids, id_col, "left_semi")
    pairs = minhash_lsh_pairs(
        exact_docs,
        id_col,
        text_col,
        num_hashes=num_hashes,
        bands=bands,
        min_jaccard=min_jaccard,
        max_bucket_size=max_bucket_size,
        hasher=hasher,
        bucket_by_values=bucket_by_values,
    )
    clusters = dedup_clusters_star(pairs)
    losers = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id").alias(id_col)
    )
    kept = exact_docs.join(losers, id_col, "left_anti")
    if bench is not None:
        from .curation import contamination_check

        contaminated = contamination_check(
            kept, bench, n=contamination_n, id_col=id_col, text_col=text_col
        ).select(id_col)
        kept = kept.join(contaminated, id_col, "left_anti")
    return kept.select(id_col)


def curate_corpus_semantic(
    docs: DataFrame,
    emb: DataFrame,
    id_col: str = "doc_id",
    emb_id_col: str = "vec_id",
    vec_col: str = "embedding",
    emb_threshold: float = 0.99,
    emb_n_bands: int = 4,
    emb_band_bits: int = 4,
    emb_direction_fn=None,
    emb_max_bucket_size: int = 1000,
    **curate_kwargs,
) -> DataFrame:
    """Text + SEMANTIC curation: the full ``curate_corpus`` chain
    (quality → exact dedup → MinHash near-dup keep-one), then an
    embedding-cosine near-dup stage over the survivors — the
    semantic-dedup pass a multimodal training-data pipeline runs after
    lexical dedup (paraphrases and translations share embeddings, not
    shingles).

    ``emb`` maps ``emb_id_col`` → ``vec_col`` for (at least) the doc
    ids in ``docs``; docs without an embedding pass through the
    semantic stage untouched. Plan shape: the text chain + one
    semi-join to scope embeddings to survivors + the multi-band
    sign-LSH pair stage + star-CC — still no all-pairs work anywhere.
    Keep-one rule matches the text stage: cluster minimum survives.
    Returns the kept ``id_col`` set."""
    kept = curate_corpus(docs, id_col=id_col, **curate_kwargs)
    kept_emb = emb.join(
        kept.select(F.col(id_col).alias(emb_id_col)), emb_id_col, "left_semi"
    )
    pairs = embedding_neardup_pairs(
        kept_emb,
        threshold=emb_threshold,
        id_col=emb_id_col,
        vec_col=vec_col,
        n_bands=emb_n_bands,
        band_bits=emb_band_bits,
        direction_fn=emb_direction_fn,
        max_bucket_size=emb_max_bucket_size,
    )
    clusters = dedup_clusters_star(
        pairs.select(F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b"))
    )
    losers = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id").alias(id_col)
    )
    return kept.join(losers, id_col, "left_anti").select(id_col)


# ---------------------------------------------------------------------------
# Deterministic k-means (SemDeDup-style semantic clustering)
# ---------------------------------------------------------------------------

def _tdiv(s: int, n: int) -> int:
    """Truncate-toward-zero integer division (SQL ``div`` semantics —
    Python's ``//`` floors, which differs on negative sums)."""
    q = abs(s) // n
    return -q if s < 0 else q


def kmeans_fit(
    emb: DataFrame,
    k: int = 4,
    n_assign: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> tuple[list[tuple[int, list[int]]], DataFrame]:
    """Deterministic Lloyd k-means over integer-quantized embeddings —
    the clustering stage of SemDeDup-style semantic dedup (cluster
    first, search near-dups only within clusters) and of IVF index
    builds.

    Everything after quantization (``q_d = round(scale·x_d)`` as
    BIGINT) is EXACT integer arithmetic: distance = Σ(q_d − c_d)²
    (bounded: |q|≤~8·scale, 64 dims → < 2^63), argmin tie-broken on
    the lowest cluster index, and the centroid update is the
    elementwise truncated integer mean. Initial centroids are the k
    vectors with the smallest md5(id) — a uniform, engine-portable
    draw. Determinism is total: the same corpus yields the same
    clusters on any engine or cluster shape, which is what makes the
    full-chain DuckDB oracle (and reproducible corpus builds)
    possible. ``n_assign`` counts ASSIGNMENT passes; updates run
    between them (classic fixed-iteration Lloyd — SemDeDup needs a
    stable partitioning of embedding space, not convergence).

    Scale shape (10^9+ vectors): each assignment is one scan with the
    k centroids inlined as literals — no join, no shuffle; each update
    is one posexplode → (cluster, dim) hash agg returning k·d rows to
    the driver (the canonical Lloyd-on-Spark shape). Clusters that go
    empty simply drop out of the next pass (mirrored by the oracle).

    Literal-inlining ceiling (ADVICE r4): the assignment expression
    grows as k·d literals, and Catalyst plan/codegen costs grow with
    it — fine through k·d ≈ 10⁴ (e.g. 100 cells × 64 dims or 16 × 768);
    beyond that, assignment should switch to a broadcast centroid join
    (explode the centroid table, groupBy-argmin per vector: one extra
    narrow shuffle-free pass but O(1) plan size). The sandbox IVF
    builds sit well under the ceiling, so the literal path — which
    keeps the full-chain DuckDB oracle trivially expressible — is the
    implemented one; treat k·d > ~10⁴ as the cue to add the join
    variant.

    Returns ``(centroids, assigned)``: the final centroid table as a
    Python list of (cluster, quantized-vector) pairs — the IVF probe
    side — and the assignment frame (id_col, ``_q`` quantized vector,
    cluster). ``kmeans_assign`` is the (id, cluster)-only wrapper.
    """
    q = F.transform(
        F.col(vec_col), lambda x: F.round(x * F.lit(float(scale))).cast("long")
    )
    base = emb.select(F.col(id_col), q.alias("_q"))

    init = (
        base.withColumn("_h", F.md5(F.col(id_col).cast("string")))
        .orderBy("_h", id_col)
        .limit(k)
        .select("_q")
        .collect()
    )
    centroids: list[tuple[int, list[int]]] = [(j, list(r["_q"])) for j, r in enumerate(init)]

    def assign_expr(cents):
        structs = []
        for j, cv in cents:
            arr = F.array(*[F.lit(int(v)).cast("long") for v in cv])
            diff = F.zip_with(F.col("_q"), arr, lambda x, c: (x - c) * (x - c))
            dist = F.aggregate(diff, F.lit(0).cast("long"), lambda acc, v: acc + v)
            structs.append(F.struct(dist.alias("d"), F.lit(j).alias("c")))
        return F.array_min(F.array(*structs))["c"]

    assigned = base.withColumn("cluster", assign_expr(centroids))
    for _ in range(n_assign - 1):
        # centroid update stays the posexplode -> (cluster, dim) agg
        # shape: an r6 rewrite to one groupBy with a sum PER DIMENSION
        # was ~1.3 s faster warm but ~1 s slower on the first run
        # (codegen of k x d aggregate buffers), and the bench protocol
        # times first runs — measured cold-A/B in fresh JVMs, kept the
        # small-codegen shape (tests/test_r06_optimizations.py pins
        # the two shapes equal).
        rows = (
            assigned.select("cluster", F.posexplode("_q").alias("_d", "_x"))
            .groupBy("cluster", "_d")
            .agg(F.sum("_x").alias("_s"), F.count(F.lit(1)).alias("_n"))
            .collect()
        )
        by_c: dict[int, dict[int, int]] = {}
        for r in rows:
            by_c.setdefault(r["cluster"], {})[r["_d"]] = _tdiv(int(r["_s"]), int(r["_n"]))
        centroids = [
            (c, [dims[d] for d in sorted(dims)]) for c, dims in sorted(by_c.items())
        ]
        assigned = base.withColumn("cluster", assign_expr(centroids))
    return centroids, assigned


def kmeans_assign(
    emb: DataFrame,
    k: int = 4,
    n_assign: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    """(id, cluster) assignments from ``kmeans_fit`` — see there."""
    _, assigned = kmeans_fit(emb, k, n_assign, id_col, vec_col, scale)
    return assigned.select(id_col, "cluster")


def ivf_kmeans_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_cells: int = 4,
    n_probe: int = 2,
    n_assign: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    """IVF ANN with a deterministic k-means coarse quantizer — the
    classic FAISS IVF-Flat shape re-expressed in DataFrame ops, and
    (unlike float IVF) EXACT end to end: the coarse cells, the probe
    selection, and the final ranking all use the same integer-quantized
    squared-L2, so the whole index+search chain replays in DuckDB.

    Per query: rank the k-means centroids by exact integer distance,
    take the ``n_probe`` nearest cells (computed driver-side over the
    k×d centroid table — the probe step is O(k·d), never a scan), then
    scan ONLY those cells' members (an equi-join of the broadcast
    (q_id, cell) probe table against the cell-keyed assignments) and
    rank candidates by exact distance with id tie-break. Searched
    fraction ≈ n_probe/n_cells of the corpus — the IVF speed/recall
    dial.

    Returns (q_id, neighbor_id, rank, dist).
    """
    cents, assigned = kmeans_fit(emb, n_cells, n_assign, id_col, vec_col, scale)
    spark = emb.sparkSession
    qrows = assigned.filter(F.col(id_col).isin(query_ids)).select(id_col, "_q").collect()
    probe_rows = []
    qvec_rows = []
    for r in qrows:
        qv = list(r["_q"])
        qvec_rows.append((r[id_col], qv))
        dists = sorted(
            (sum((x - c) * (x - c) for x, c in zip(qv, cv)), j) for j, cv in cents
        )
        probe_rows.extend((r[id_col], j) for _, j in dists[:n_probe])
    probes = spark.createDataFrame(probe_rows, "q_id long, cluster int")
    qvecs = spark.createDataFrame(qvec_rows, "q_id long, qv array<bigint>")
    dist = F.aggregate(
        F.zip_with("_q", "qv", lambda x, c: (x - c) * (x - c)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    cand = (
        assigned.join(F.broadcast(probes), "cluster")
        .filter(F.col(id_col) != F.col("q_id"))
        .join(F.broadcast(qvecs), "q_id")
        .withColumn("dist", dist)
    )
    w = Window.partitionBy("q_id").orderBy("dist", F.col(id_col))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", F.col(id_col).alias("neighbor_id"), "rank", "dist")
    )


def semdedup_keep(
    emb: DataFrame,
    clusters: DataFrame,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster_size: int = 10_000,
) -> DataFrame:
    """SemDeDup-style semantic dedup bounded by k-means cells: within
    each cluster, a vector is dropped iff some SMALLER-id member of the
    same cell has cosine ≥ ``threshold`` with it (keep-lowest
    representative — one anti-join, no iterative CC, so the policy is
    closed-form and fully oracle-checkable).

    Scale shape: the ``clusters`` equi-join bounds the quadratic
    verify to cell size — k is sized so cells hold ~|corpus|/k
    vectors; a WINDOW count over the cluster key (the minhash guard
    shape — rides the self-join exchange, never an aggregate+join-
    back) excludes degenerate mega-cells from pairing instead of
    letting one cell go quadratic. Cosine is double via built-in
    zip_with/aggregate — JVM-side, no UDF.

    Returns (cluster, id_col) kept rows.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    norm = F.sqrt(
        F.aggregate(F.transform("v", lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    members = (
        emb.select(F.col(id_col), v.alias("v"))
        .join(clusters, id_col)
        .withColumn("nrm", norm)
    )
    cn = F.count(F.lit(1)).over(Window.partitionBy("cluster"))
    members = members.withColumn("_cn", cn)
    small = members.filter(F.col("_cn") <= max_cluster_size).drop("_cn")
    a = small.select(
        F.col("cluster"),
        F.col(id_col).alias("_ida"),
        F.col("v").alias("_va"),
        F.col("nrm").alias("_na"),
    )
    b = small.select(
        F.col("cluster"),
        F.col(id_col).alias("_idb"),
        F.col("v").alias("_vb"),
        F.col("nrm").alias("_nb"),
    )
    dot = F.aggregate(
        F.zip_with("_va", "_vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    losers = (
        a.join(b, "cluster")
        .filter(F.col("_ida") < F.col("_idb"))
        .filter(dot / (F.col("_na") * F.col("_nb")) >= F.lit(threshold))
        .select(F.col("_idb").alias(id_col))
        .distinct()
    )
    return members.join(losers, id_col, "left_anti").select("cluster", id_col)


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

def text_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc quality/counting stats, integer-exact (oracle-safe):
    token count (whitespace), char count, distinct-token count, and a
    crude stopword hit count (quality-scoring inputs)."""
    toks = ws_tokens(F.col(text_col))
    stop = F.filter(toks, lambda t: t.isin("the", "a", "of", "and", "to", "in"))
    return docs.select(
        F.col(id_col),
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.length(text_col).cast("bigint").alias("n_chars"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct_tokens"),
        F.size(stop).cast("bigint").alias("n_stopwords"),
    )


#: tiny per-language stopword lexicons for the heuristic lang id
LANG_LEXICON = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "fr": ("le", "la", "de", "et", "est", "pas"),
}


def attach_lang(
    docs: DataFrame, text_col: str = "text", out_col: str = "pred_lang"
) -> DataFrame:
    """Heuristic language ID attached as a COLUMN (no join-back), in
    two tiers, all one codegen projection:

    1. **Script detection** (r5): codepoint counts per script class
       (length-difference trick, ``functions.text.n_chars_in``). A
       doc whose letters are majority kana+han with any kana → 'ja';
       majority hangul → 'ko'; majority han → 'zh'; majority
       Cyrillic → 'ru'. This is how real corpus lang-id shortcuts
       non-Latin scripts — no lexicon needed, and it fixes the r4
       gap where every non-Latin doc fell out as 'unk'.
    2. **Stopword lexicon argmax** for Latin-script text: hits per
       tiny per-language lexicon; argmax wins, 'unk' when nothing
       hits. A toy lexicon (the container has no langid lib), but
       the Spark shape — broadcast lexicon → explode-free array
       intersection → argmax — is the real scale pattern.

    Score columns are materialized first (withColumns) so the argmax
    never re-evaluates the token split per reference."""
    toks = ws_tokens(F.lower(F.col(text_col)))

    def score(ws: tuple[str, ...]):
        return F.size(F.filter(toks, lambda t: t.isin(*ws)))

    tmp = {f"_lang_{lang}": score(ws) for lang, ws in LANG_LEXICON.items()}
    # script counts (computed on the raw column — padding irrelevant)
    tmp["_sc_letters"] = n_chars_in(F.col(text_col), r"\p{L}")
    tmp["_sc_han"] = n_chars_in(F.col(text_col), HAN_CLASS)
    tmp["_sc_kana"] = n_chars_in(F.col(text_col), KANA_CLASS)
    tmp["_sc_hangul"] = n_chars_in(F.col(text_col), HANGUL_CLASS)
    tmp["_sc_cyr"] = n_chars_in(F.col(text_col), CYRILLIC_CLASS)
    scored = docs.withColumns(tmp)
    best = F.greatest(*[F.col(f"_lang_{lang}") for lang in LANG_LEXICON])
    nl = F.col("_sc_letters")
    pred = (
        F.when((F.col("_sc_kana") > 0) & (2 * (F.col("_sc_kana") + F.col("_sc_han")) > nl), F.lit("ja"))
        .when(2 * F.col("_sc_hangul") > nl, F.lit("ko"))
        .when(2 * F.col("_sc_han") > nl, F.lit("zh"))
        .when(2 * F.col("_sc_cyr") > nl, F.lit("ru"))
        .when(best <= 0, F.lit("unk"))
    )
    for lang in LANG_LEXICON:  # first max wins, fixed order
        pred = pred.when(F.col(f"_lang_{lang}") == best, F.lit(lang))
    return scored.withColumn(out_col, pred).drop(*tmp)


def lang_id_ngram(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, pred_lang) projection of ``attach_lang`` — see there."""
    return attach_lang(docs, text_col).select(F.col(id_col), "pred_lang")


def token_count_bpe_ish(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish regex count
    (runs of letters / digits / single punctuation), both exact ints."""
    from .curation import _n_tokens  # single source for the token regex

    ws = F.size(ws_tokens(F.col(text_col))).cast("bigint")
    return docs.select(
        F.col(id_col), ws.alias("n_ws_tokens"), _n_tokens(text_col).alias("n_bpe_tokens")
    )
