"""Training-data corpus curation job: [domain blocklist →]
[PII redaction →] [paragraph dedup →] [ExactSubstr span strip →]
quality gate → exact dedup → MinHash near-dup dedup (keep one doc per
cluster) [→ benchmark decontamination] [→ DSIR target-domain top-k
selection], writing the curated corpus + a stats line. The
batch-mode composition of the dataset/curation operators
(operators/dataset.py:curate_corpus, operators/curation.py).

    spark-submit --py-files dist/fposs.zip jobs/curate_corpus.py \\
        --input <documents parquet> --output <curated dir> \\
        [--redact-pii] [--bench <benchmark parquet: bench_id, text>] \\
        [--min-tokens 20 --min-chars 100 --min-jaccard 0.5]

With ``--redact-pii`` the masked text is what gets fingerprinted,
shingled, and WRITTEN (docs differing only in PII spans dedup
together, and no raw PII reaches the output corpus).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str]) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--min-tokens", type=int, default=20)
    p.add_argument("--min-chars", type=int, default=100)
    p.add_argument("--min-jaccard", type=float, default=0.5)
    p.add_argument("--num-hashes", type=int, default=32)
    p.add_argument("--bands", type=int, default=8)
    p.add_argument("--redact-pii", action="store_true",
                   help="mask PII before dedup; the output corpus is redacted")
    p.add_argument("--blocklist", default=None,
                   help="domain-blocklist parquet (column: domain); docs citing "
                        "a blocked domain (subdomain-aware) are dropped FIRST")
    p.add_argument("--paragraph-dedup", action="store_true",
                   help="strip corpus-wide repeated paragraphs (keep first "
                        "occurrence) before the quality gate")
    p.add_argument("--paragraph-sep", default="\n",
                   help="paragraph separator for --paragraph-dedup")
    p.add_argument("--strip-dup-spans", type=int, default=0, metavar="W",
                   help="ExactSubstr dedup: cut every duplicated run of W "
                        "consecutive tokens except its first corpus occurrence "
                        "(0 = off; 50 is the Lee et al. 2022 setting)")
    p.add_argument("--bench", default=None,
                   help="benchmark parquet (bench_id, text) for decontamination")
    p.add_argument("--contamination-n", type=int, default=8)
    p.add_argument("--dsir-target", default=None,
                   help="target-domain parquet (doc_id, text); after curation, "
                        "keep only the --dsir-keep docs with the highest DSIR "
                        "importance score vs this target distribution")
    p.add_argument("--dsir-keep", type=int, default=100_000)
    p.add_argument("--dsir-buckets", type=int, default=4096)
    p.add_argument("--keep-langs", default=None,
                   help="comma-separated predicted languages to keep "
                        "(heuristic lang id over the FINAL text, after any "
                        "mutation; 'unk' may be listed). A pure column "
                        "filter — no join-back.")
    p.add_argument("--keep-cols", default=None,
                   help="comma-separated columns to KEEP through a text "
                        "mutation (--redact-pii / --paragraph-dedup / "
                        "--strip-dup-spans) even "
                        "though they are not recomputed; by default every "
                        "column that is neither provenance (doc_id, source, "
                        "url, domain) nor recomputed (n_chars, n_tokens, "
                        "fingerprint) is dropped so nothing stale is written")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from fluent_plugin_opensearch_spark.operators.curation import (
        dsir_scores,
        filter_blocked_domains,
        paragraph_dedup,
        redact_text,
    )
    from fluent_plugin_opensearch_spark.operators.dataset import (
        curate_corpus,
        strip_duplicate_spans,
    )

    spark = SparkSession.builder.appName("curate-corpus").getOrCreate()
    docs = spark.read.parquet(args.input)
    n_in = docs.count()
    if args.blocklist:
        # source filter FIRST (cheapest gate — drops whole docs before
        # any hashing/shingling work touches them)
        docs = filter_blocked_domains(docs, spark.read.parquet(args.blocklist))
    text_mutated = False
    if args.redact_pii:
        # in-place column replacement — a pure projection, NOT a
        # join-back of a (doc_id, redacted) frame against the corpus
        docs = redact_text(docs)
        text_mutated = True
    if args.paragraph_dedup:
        # strip cross-doc boilerplate paragraphs (corpus-wide
        # keep-first) BEFORE the quality gate, so a page that is
        # mostly repeated boilerplate is judged on its unique content
        deduped = paragraph_dedup(docs, sep=args.paragraph_sep)
        docs = docs.drop("text").join(
            deduped.select("doc_id", "text"), "doc_id", "inner"
        )
        text_mutated = True
    if args.strip_dup_spans:
        # ExactSubstr pass AFTER paragraph dedup (paragraphs catch the
        # structured boilerplate cheaply; the window pass catches
        # duplicated runs that cross paragraph boundaries or never
        # align to separators) and BEFORE the quality gate, so a doc
        # that is mostly copied text is judged on what remains
        docs = strip_duplicate_spans(docs, window=args.strip_dup_spans).drop(
            "n_removed_tokens"
        )
        text_mutated = True
    n_lang_dropped = None
    if args.keep_langs:
        from fluent_plugin_opensearch_spark.operators.dataset import attach_lang

        langs = [x.strip() for x in args.keep_langs.split(",") if x.strip()]
        # language judged on the FINAL text (post-redaction/strip), as
        # an attached column — one projection + filter, never a
        # (doc_id, pred) join-back against the corpus. The dropped
        # count is ONE aggregate over the tagged frame (r5, ADVICE r4:
        # the previous before/after .count() pair re-executed the
        # whole upstream mutation chain twice for one stat; an observe
        # metric can't be used here — the frame self-joins inside
        # curate_corpus, duplicating the CollectMetrics node).
        tagged = attach_lang(docs)
        agg = tagged.agg(
            F.count(F.lit(1)).alias("n_pre"),
            F.count(F.when(F.col("pred_lang").isin(langs), 1)).alias("n_kept"),
        ).first()
        n_lang_dropped = agg["n_pre"] - agg["n_kept"]
        docs = tagged.filter(F.col("pred_lang").isin(langs)).drop("pred_lang")
    dropped_stale: list[str] = []
    if text_mutated:
        # every text-DERIVED metadata column must be recomputed (or
        # dropped) after any text mutation (redaction / paragraph
        # strip), not just n_chars — a stale fingerprint/token count
        # would describe the pre-mutation text (ADVICE r3). Recompute
        # the ones we know how to; DROP every other non-provenance
        # column (we cannot know an arbitrary input column is NOT
        # text-derived — lang, n_stopwords, quality scores, cached
        # signatures all are). --keep-cols is the caller's assertion
        # that a named column is text-independent.
        from fluent_plugin_opensearch_spark.functions.text import ws_tokens

        recompute = {
            "n_chars": F.length("text").cast("bigint"),
            "n_tokens": F.size(ws_tokens(F.col("text"))).cast("bigint"),
            # same definition as operators/dataset.py:fingerprint
            "fingerprint": F.md5(
                F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
            ),
        }
        provenance = {"doc_id", "text", "source", "url", "domain"}
        keep_extra = {
            c.strip() for c in (args.keep_cols or "").split(",") if c.strip()
        }
        for c in docs.columns:
            if c in recompute:
                docs = docs.withColumn(c, recompute[c])
        dropped_stale = [
            c for c in docs.columns
            if c not in recompute and c not in provenance and c not in keep_extra
        ]
        if dropped_stale:
            docs = docs.drop(*dropped_stale)
    bench = spark.read.parquet(args.bench) if args.bench else None
    kept_ids = curate_corpus(
        docs,
        min_tokens=args.min_tokens,
        min_chars=args.min_chars,
        min_jaccard=args.min_jaccard,
        num_hashes=args.num_hashes,
        bands=args.bands,
        bench=bench,
        contamination_n=args.contamination_n,
    )
    curated = docs.join(kept_ids, "doc_id", "left_semi")
    if args.dsir_target:
        # target-domain selection LAST (on the deduped, decontaminated
        # survivors): score desc, doc_id tiebreak — deterministic.
        # orderBy+limit is a distributed TakeOrdered (per-partition
        # top-k then a k-row merge), not a global sort.
        target = spark.read.parquet(args.dsir_target)
        scores = dsir_scores(curated, target, buckets=args.dsir_buckets)
        keep = (
            scores.orderBy(F.col("dsir_score_micro").desc(), F.col("doc_id"))
            .limit(args.dsir_keep)
            .select("doc_id")
        )
        curated = curated.join(keep, "doc_id", "left_semi")
    curated.write.mode("overwrite").parquet(args.output)
    n_out = spark.read.parquet(args.output).count()
    stats = {"input_docs": n_in, "kept_docs": n_out, "dropped": n_in - n_out}
    if n_lang_dropped is not None:
        stats["lang_dropped"] = n_lang_dropped
    if dropped_stale:
        stats["dropped_stale_cols"] = sorted(dropped_stale)
    print(json.dumps(stats))


if __name__ == "__main__":
    main(sys.argv[1:])
