"""Search-side primitives over the corpus: inverted term index + BM25
ranking, and log-template mining.

The reference feeds records INTO a search engine (out_opensearch.rb
routes bulk docs to indices); these operators supply the
complementary query capability Spark-side, so a user of the reference
stack can both ingest and search from one engine. Everything is
declarative DataFrame ops — the "inverted index" is a (term, doc, tf)
table produced by one explode + hash aggregate, which at 100 TB is a
bucketed table the scoring join can reuse without reshuffling.

Float boundary (oracle discipline): BM25's idf/length-normalization
are the only floating steps; scores are quantized to integer
micro-units (round(1e6·s), the dsir/lm_ce pattern) before ranking, so
the top-k order is BIGINT-exact and replays cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import tokenize_py, unicode_tokens


def _tokens(text_col: str):
    """Tokenization shared by index build and query side: lower-cased
    Unicode word runs (``[\\p{L}\\p{N}]+`` — dual-dialect RE2/Java)
    with CJK chars as unigram tokens (functions.text). ASCII-identical
    to the r4 ``[^a-z0-9]+`` split; non-Latin documents are now
    findable (the r4 VERDICT top gap)."""
    return unicode_tokens(F.col(text_col))


def term_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Inverted-index postings: one row per (term, doc) with the term
    frequency and the doc's token length. The token array is
    materialized ONCE (CLAUDE.md lambda-recompute gotcha) and the doc
    length rides the exploded rows into the aggregate key — one
    explode + one hash aggregate, no corpus-by-id join. At scale,
    write it bucketed by term so every query's postings lookup is a
    bucket-local scan."""
    return (
        docs.select(F.col(id_col), _tokens(text_col).alias("_t"))
        .select(
            F.col(id_col),
            F.size("_t").alias("dl"),
            F.explode("_t").alias("term"),
        )
        .groupBy("term", id_col, "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
        .select("term", id_col, "tf", "dl")
    )


def bm25_topk(
    docs: DataFrame,
    query: str,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    require_all: bool = False,
) -> DataFrame:
    """BM25 top-k over the corpus for a query string (Robertson/
    Sparck-Jones idf with the +1 floor, as in Lucene):

        idf(t)  = ln(1 + (N - df + 0.5)/(df + 0.5))
        s(d)    = Σ_t idf·tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl))

    Scale shape: the postings table is filtered to the query's terms
    (an ``isin`` over a handful of literals — partition-prunable on a
    term-bucketed index), df is a window count riding those filtered postings, N/avgdl from one corpus-stats row broadcast as
    literals via a cross-join of a 1-row frame, and the final score is
    one groupBy(doc) + top-k window. Nothing quadratic; the corpus
    never shuffles except the (term,doc)-keyed postings build.

    Returns (rank, id_col, score_micro) — score in integer micro-units
    so ranking is exact cross-engine (ties broken by id).
    """
    q_terms = sorted({t for t in _split_query(query)})
    if not q_terms:
        raise ValueError("query has no tokens")
    docs = docs.filter(F.col(text_col).isNotNull())  # null text can never match; keep N consistent with the index stats
    post = term_postings(docs, id_col, text_col)
    stats = docs.select(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size(_tokens(text_col))).alias("avgdl"),
    )
    hits = post.filter(F.col("term").isin(q_terms))
    # df rides the postings as a WINDOW count over the term key instead
    # of a groupBy+join-back: the unpersisted join-back would re-run
    # the whole tokenize+explode chain a second time (the CLAUDE.md
    # banded-guard rule). Ubiquitous-term partitions spill via the
    # window buffer; at 10^12 docs the postings are a materialized
    # bucketed table anyway and this stage reads, not rebuilds.
    hits = hits.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("term")))
    scored = (
        hits.crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "_s",
            F.col("idf")
            * F.col("tf")
            * F.lit(k1 + 1.0)
            / (
                F.col("tf")
                + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy(id_col)
        .agg(
            F.round(F.lit(1e6) * F.sum("_s")).cast("bigint").alias("score_micro"),
            F.countDistinct("term").alias("_nt"),
        )
    )
    if require_all:
        # conjunctive (AND) semantics: keep only docs matching EVERY
        # query term — a post-aggregation filter, no extra shuffle
        scored = scored.filter(F.col("_nt") == len(q_terms))
    scored = scored.drop("_nt")
    # exact two-phase top-k (the quota_top_per_stratum prefilter
    # shape): a common query term can match most of the corpus, so the
    # global ranking window must never see the full match set — each
    # task keeps its local top-k first (a row outside its partition's
    # top-k cannot be in the global top-k), bounding the single-task
    # window to k × num_partitions rows.
    w_local = Window.partitionBy("_pid").orderBy(F.desc("score_micro"), F.col(id_col))
    pre = (
        scored.withColumn("_pid", F.spark_partition_id())
        .withColumn("_lr", F.row_number().over(w_local))
        .filter(F.col("_lr") <= k)
        .drop("_pid", "_lr")
    )
    w = Window.orderBy(F.desc("score_micro"), F.col(id_col))
    return (
        pre.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("rank", id_col, "score_micro")
    )


def _split_query(query: str) -> list[str]:
    return tokenize_py(query)


def tfidf_keywords(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k characteristic terms per document by smoothed TF-IDF
    (keyword extraction / doc labeling for corpus exploration):

        w(t, d) = tf · ln(1 + N/df(t)),  quantized to micro-units

    One postings build (the term_postings shape) with df counted by a
    window over the term key, one per-doc ranking window — at 10^12 docs the window is
    per-document (bounded by doc vocabulary), never global. Ties break
    on the term string for determinism. Returns (id_col, term, rank,
    w_micro)."""
    post = term_postings(docs, id_col, text_col)
    n_docs = F.broadcast(docs.select(F.count(F.lit(1)).alias("n_docs")))
    # df as a window count over term — one tokenize/explode pass total
    # (a groupBy+join-back would rebuild the postings chain twice)
    post = post.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("term")))
    w = Window.partitionBy(id_col).orderBy(F.desc("w_micro"), F.col("term"))
    return (
        post.crossJoin(n_docs)
        .withColumn(
            "w_micro",
            F.round(
                F.lit(1e6)
                * F.col("tf")
                * F.log(F.lit(1.0) + F.col("n_docs") / F.col("df"))
            ).cast("bigint"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "rank", "w_micro")
    )


def template_expr(text_col: str):
    """The template normalization shared by batch mining and the
    streaming drift rollup: whitespace-normalize, collapse every
    digit-bearing token to ``<*>``."""
    norm = F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " ")
    return F.regexp_replace(norm, r"\S*\d\S*", "<*>")


def log_templates(
    docs: DataFrame, id_col: str = "conv_id", text_col: str = "text"
) -> DataFrame:
    """Log-template mining (a Drain-style first pass, closed-form):
    collapse every token containing a digit to ``<*>`` after
    whitespace normalization, then profile each template — event
    count, distinct-source count, and the smallest raw example id as a
    deterministic evidence pointer. Turns a billion raw log lines into
    the few hundred shapes worth alerting on; pure codegen projection
    + one hash aggregate (template key), no Python, no window."""
    template = template_expr(text_col)
    return (
        docs.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), template.alias("template"))
        .groupBy("template")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct(id_col).alias("n_sources"),
            F.min(id_col).alias("first_source"),
        )
    )


# ---------------------------------------------------------------------------
# Incrementally-maintained inverted index (term-bucketed catalog table)
# ---------------------------------------------------------------------------

#: partition count for the term-bucketed postings table
INDEX_BUCKETS = 16


def term_bucket(term: str, n_buckets: int = INDEX_BUCKETS) -> str:
    """Engine-portable bucket of a term (the curation._id_bucket md5
    trick, computable driver-side in pure Python) — the partition a
    term's postings live in."""
    import hashlib

    h = hashlib.md5(f"tb#{term}".encode()).hexdigest()
    return f"tb-{int(h[:15], 16) % n_buckets}"


def term_bucket_expr(term_col: str, n_buckets: int = INDEX_BUCKETS):
    """Spark twin of ``term_bucket`` (bit-identical assignment)."""
    h = F.md5(F.concat(F.lit("tb#"), F.col(term_col)))
    n = F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint") % n_buckets
    return F.concat(F.lit("tb-"), n.cast("string"))


def index_batch(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = INDEX_BUCKETS,
) -> tuple[DataFrame, DataFrame]:
    """One ingest batch → (postings rows, corpus-stats row) for the
    incremental index: postings carry their term-bucket partition key;
    the stats side is ONE row (doc count + total token length) so
    exact BM25 normalization stays maintainable by appending — sums
    merge, averages do not. Both frames are ready for
    ``append_to_sink`` under an idempotence marker."""
    post = term_postings(docs, id_col, text_col).withColumn(
        "_index", term_bucket_expr("term", n_buckets)
    )
    stats = docs.select(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(_tokens(text_col))).alias("sum_dl"),
    ).withColumn("_index", F.lit("stats"))
    return post, stats


def search_index(
    spark,
    catalog,
    query: str,
    k: int = 10,
    table: str = "postings",
    stats_table: str = "search_stats",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    n_buckets: int = INDEX_BUCKETS,
    id_type: str = "long",
) -> DataFrame:
    """BM25 over the INCREMENTALLY-maintained index: reads ONLY the
    term-bucket partitions the query's terms hash to (manifest-level
    pruning via ``SinkCatalog.read(partitions=...)``) plus the 2-column
    stats table — the corpus text is never touched, so query cost is
    O(postings of the query terms), not O(corpus). Scores are
    identical to ``bm25_topk`` on the same corpus (parity-tested
    across a multi-batch streamed build)."""
    q_terms = sorted({t for t in _split_query(query)})
    if not q_terms:
        raise ValueError("query has no tokens")
    buckets = sorted({term_bucket(t, n_buckets) for t in q_terms})
    try:
        post = catalog.read(spark, table, partitions=buckets)
        st_raw = catalog.read(spark, stats_table)
    except FileNotFoundError:
        # no postings for these terms yet, or the stats append of the
        # very first batch hasn't landed — an empty index, not an error.
        # (Between a batch's two appends a query may score one batch's
        # postings against the previous stats — skew bounded by one
        # micro-batch and self-healing on the next commit.)
        return spark.createDataFrame(
            [], f"rank int, {id_col} {id_type}, score_micro long"
        )
    st = st_raw.agg(
        F.sum("n_docs").alias("n_docs"),
        (F.sum("sum_dl") / F.sum("n_docs")).alias("avgdl"),
    )
    hits = post.filter(F.col("term").isin(q_terms)).withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
    )
    scored = (
        hits.crossJoin(F.broadcast(st))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "_s",
            F.col("idf")
            * F.col("tf")
            * F.lit(k1 + 1.0)
            / (
                F.col("tf")
                + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy(id_col)
        .agg(F.round(F.lit(1e6) * F.sum("_s")).cast("bigint").alias("score_micro"))
    )
    w_local = Window.partitionBy("_pid").orderBy(F.desc("score_micro"), F.col(id_col))
    pre = (
        scored.withColumn("_pid", F.spark_partition_id())
        .withColumn("_lr", F.row_number().over(w_local))
        .filter(F.col("_lr") <= k)
        .drop("_pid", "_lr")
    )
    w = Window.orderBy(F.desc("score_micro"), F.col(id_col))
    return (
        pre.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("rank", id_col, "score_micro")
    )
