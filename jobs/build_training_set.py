"""Training-set assembly job — the stage AFTER curation: turn a
curated corpus into epoch-ready training shards.

    [deterministic train/val/test split + holdout decontamination →]
    token-budget mixture sampling → deterministic epoch shuffle +
    shard assignment → shard-partitioned parquet (rows in training
    order) [+ optional sequence-packing span sidecar]

    spark-submit --py-files dist/fposs.zip jobs/build_training_set.py \\
        --input <curated documents parquet> --output <dir> \\
        [--splits '{"train": 900, "val": 50, "test": 50}' \\
         --decontaminate-ngram 8] \\
        [--weights '{"web": 600, "code": 250}' --budget-tokens 2000000] \\
        [--n-shards 64] [--epoch 0] [--pack-budget 4096]

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
