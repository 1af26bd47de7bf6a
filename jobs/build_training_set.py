"""Training-set assembly job — the stage AFTER curation: turn a
curated corpus into epoch-ready training shards.

    [deterministic train/val/test split + holdout decontamination →]
    [LM cross-entropy quality gate → DSIR target-domain selection →]
    token-budget mixture sampling → deterministic epoch shuffle +
    shard assignment → shard-partitioned parquet (rows in training
    order) [+ optional sequence-packing span sidecar]

    spark-submit --py-files dist/fposs.zip jobs/build_training_set.py \\
        --input <curated documents parquet> --output <dir> \\
        [--splits '{"train": 900, "val": 50, "test": 50}' \\
         --decontaminate-ngram 8] \\
        [--max-ce-micro 15000000 [--lm-ref <parquet>]] \\
        [--dsir-target <parquet> --dsir-keep 100000 [--dsir-buckets 4096]] \\
        [--weights '{"web": 600, "code": 250}' --budget-tokens 2000000] \\
        [--n-shards 64] [--epoch 0] [--pack-budget 4096]

The quality/importance stages (r5, VERDICT r4 #7) make the full
curate → score → split → mix → shard → pack pipeline one CLI: the CE
gate drops high-perplexity docs under a hashed-n-gram reference LM
(fit on --lm-ref, else on the corpus itself) and runs on the TRAIN
side only, after decontamination (scoring dropped docs would waste
the corpus scan); DSIR then keeps the --dsir-keep docs most like the
target domain (broadcast weight table, one corpus shuffle) — both
identical to the standalone operators the oracles check.

Layout written under --output:
    shards/shard=K/...parquet   rows (pos, doc_id, text, n_tokens)
                                sorted by pos within each file
                                (the train split when --splits given)
    splits/split=val/... etc    holdout splits, verbatim rows
    packs/...parquet            (doc_id, start_off, first_pack,
                                last_pack, n_packs) at --pack-budget
                                tokens per context window (optional)

Scale shape (100 TB): the mixture is one aggregation scan + one
broadcast-join filter (corpus never shuffled); the shard assignment is
ONE hash exchange keyed on shard with the within-shard rank riding the
same partitioning; the write sorts n/n_shards rows per task — size
--n-shards for ~256 MB shard files and every stage stays bounded.
Everything is md5-keyed: re-running any step on any cluster shape
reproduces byte-identical shard membership and order.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str]) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--splits", default=None,
                   help="JSON {split: permille} summing to 1000, must "
                        "include 'train'; holdout splits are written "
                        "under <output>/splits and the rest of the job "
                        "runs on train only")
    p.add_argument("--decontaminate-ngram", type=int, default=0,
                   help="with --splits: drop train docs sharing any "
                        "word n-gram of this size with a holdout doc")
    p.add_argument("--max-ce-micro", type=int, default=None,
                   help="drop docs whose per-feature LM cross-entropy "
                        "(micro-nats) exceeds this — the CCNet-style "
                        "perplexity quality gate")
    p.add_argument("--lm-ref", default=None,
                   help="parquet corpus to fit the reference LM on "
                        "(default: the input corpus itself)")
    p.add_argument("--dsir-target", default=None,
                   help="parquet of target-domain docs (doc_id, text): "
                        "keep only the --dsir-keep docs with the highest "
                        "DSIR importance score")
    p.add_argument("--dsir-keep", type=int, default=100_000)
    p.add_argument("--dsir-buckets", type=int, default=4096)
    p.add_argument("--weights", default=None,
                   help="JSON {source: permille-of-budget}; with "
                        "--budget-tokens enables mixture sampling")
    p.add_argument("--budget-tokens", type=int, default=None)
    p.add_argument("--stratum-col", default="source")
    p.add_argument("--n-shards", type=int, default=64)
    p.add_argument("--epoch", type=int, default=0)
    p.add_argument("--pack-budget", type=int, default=None,
                   help="also write the concat-then-chunk span sidecar "
                        "at this many tokens per context window")
    args = p.parse_args(argv)
    if (args.weights is None) != (args.budget_tokens is None):
        p.error("--weights and --budget-tokens must be given together")
    if args.decontaminate_ngram and not args.splits:
        p.error("--decontaminate-ngram requires --splits")
    if args.lm_ref and args.max_ce_micro is None:
        p.error("--lm-ref requires --max-ce-micro")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from fluent_plugin_opensearch_spark.operators.curation import (
        _n_tokens,
        contamination_check,
        mixture_plan,
        mixture_sample,
        pack_sequences,
        split_corpus,
        training_shards,
    )

    spark = SparkSession.builder.appName("build-training-set").getOrCreate()
    docs = spark.read.parquet(args.input)
    n_in = docs.count()

    split_stats = None
    if args.splits:
        splits = {k: int(v) for k, v in json.loads(args.splits).items()}
        if "train" not in splits:
            p.error("--splits must include a 'train' entry")
        tagged = split_corpus(docs, splits)
        holdout = tagged.filter(F.col("split") != "train")
        holdout.write.mode("overwrite").partitionBy("split").parquet(
            f"{args.output}/splits"
        )
        split_stats = {
            r["split"]: r["n"]
            for r in tagged.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        train = tagged.filter(F.col("split") == "train").drop("split")
        if args.decontaminate_ngram:
            # holdout is a bounded fraction of the corpus but NOT an
            # eval-suite-sized table — don't broadcast its n-grams;
            # the check degrades to a hash join on the gram, still
            # linear (contamination_check docstring sizes the knob)
            # persist: the n-gram explode+join is the job's most
            # expensive stage and feeds BOTH the count and the
            # anti-join — without the cache it would run twice
            # (CLAUDE.md: an unpersisted join re-ran a whole chain at
            # 1.7x). The cached set is one small row per contaminated
            # doc.
            contam = contamination_check(
                train,
                holdout.select(F.col("doc_id").alias("bench_id"), "text"),
                n=args.decontaminate_ngram,
                broadcast_bench=False,
            ).persist()
            n_leaked = contam.count()  # materializes the cache
            train = train.join(contam.select("doc_id"), "doc_id", "left_anti")
            split_stats["train_dropped_contaminated"] = n_leaked
        docs = train

    # running doc count — each stage's dropped stat costs ONE count of
    # its (small) keep set, never a before/after pair re-running the
    # upstream chain twice (the curate-job ADVICE-r4 lesson)
    n_now = n_in
    if split_stats is not None:
        n_now = split_stats["train"] - split_stats.get("train_dropped_contaminated", 0)
    quality_stats = {}
    if args.max_ce_micro is not None:
        from fluent_plugin_opensearch_spark.operators.curation import lm_cross_entropy

        lm_ref = spark.read.parquet(args.lm_ref) if args.lm_ref else None
        ce = lm_cross_entropy(docs, lm_ref)
        keep = ce.filter(F.col("ce_micro") <= args.max_ce_micro).select("doc_id")
        n_keep = keep.count()
        quality_stats["ce_dropped"] = n_now - n_keep
        n_now = n_keep
        docs = docs.join(keep, "doc_id", "left_semi")
    if args.dsir_target:
        from fluent_plugin_opensearch_spark.operators.curation import dsir_scores

        target = spark.read.parquet(args.dsir_target)
        scores = dsir_scores(docs, target, buckets=args.dsir_buckets)
        # orderBy+limit is a distributed TakeOrdered (per-partition
        # top-k then a k-row merge), not a global sort
        keep = (
            scores.orderBy(F.col("dsir_score_micro").desc(), F.col("doc_id"))
            .limit(args.dsir_keep)
            .select("doc_id")
        )
        n_keep = keep.count()  # ≤ --dsir-keep rows
        quality_stats["dsir_dropped"] = n_now - n_keep
        docs = docs.join(keep, "doc_id", "left_semi")

    plan_rows = None
    if args.weights:
        weights = {k: int(v) for k, v in json.loads(args.weights).items()}
        plan_rows = [
            r.asDict()
            for r in mixture_plan(
                docs, weights, args.budget_tokens, stratum_col=args.stratum_col
            ).collect()
        ]  # one row per stratum — broadcast-sized by construction
        docs = mixture_sample(
            docs, weights, args.budget_tokens, stratum_col=args.stratum_col
        )

    order = training_shards(docs, args.n_shards, epoch=args.epoch)
    # Observation rides the write job itself — zero-kept detection
    # costs no extra scan (vs a count() that would re-run the join).
    from pyspark.sql import Observation

    obs = Observation("shards_written")
    sharded = (
        docs.select("doc_id", "text", _n_tokens("text").alias("n_tokens"))
        .join(order, "doc_id", "inner")
        .observe(obs, F.count(F.lit(1)).alias("n"))
        .repartition("shard")
        .sortWithinPartitions("shard", "pos")
    )
    sharded.write.mode("overwrite").partitionBy("shard").parquet(
        f"{args.output}/shards"
    )
    n_written = int(obs.get["n"])

    if args.pack_budget and n_written:
        pack_sequences(docs, budget=args.pack_budget).write.mode(
            "overwrite"
        ).parquet(f"{args.output}/packs")

    if n_written:
        out = spark.read.parquet(f"{args.output}/shards")
        prof = out.groupBy("shard").agg(
            F.count(F.lit(1)).alias("n"), F.sum("n_tokens").alias("tok")
        )
        sizes = [r["n"] for r in prof.collect()]
    else:
        # an empty partitioned write leaves a _SUCCESS-only dir that
        # spark.read.parquet cannot infer a schema from — don't try
        sizes = []
    stats = {
        "input_docs": n_in,
        "kept_docs": int(sum(sizes)),
        "n_shards_written": len(sizes),
        "shard_docs_min": int(min(sizes)) if sizes else 0,
        "shard_docs_max": int(max(sizes)) if sizes else 0,
        "epoch": args.epoch,
    }
    if split_stats is not None:
        stats["splits"] = split_stats
    stats.update(quality_stats)
    if plan_rows is not None:
        stats["mixture_plan"] = plan_rows
        zero = [
            r[args.stratum_col] for r in plan_rows
            if r["rate_permille"] == 0 and weights.get(r[args.stratum_col], 0) > 0
        ]
        if zero:
            # budget·weight < tok_total·1000⁻¹ rounds a stratum's keep
            # rate to 0‰ — surface it; silence here looks like data loss
            stats["zero_rate_strata"] = sorted(zero)
    print(json.dumps(stats))


if __name__ == "__main__":
    main(sys.argv[1:])
