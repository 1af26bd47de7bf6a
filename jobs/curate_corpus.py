"""Training-data corpus curation job: quality gate → exact dedup →
MinHash near-dup dedup (keep one doc per cluster), writing the curated
corpus + a stats line. The batch-mode composition of the dataset
operators (operators/dataset.py:curate_corpus).

    spark-submit --py-files dist/fposs.zip jobs/curate_corpus.py \\
        --input <documents parquet> --output <curated dir> \\
        [--min-tokens 20 --min-chars 100 --min-jaccard 0.5]
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
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from fluent_plugin_opensearch_spark.operators.dataset import curate_corpus

    spark = SparkSession.builder.appName("curate-corpus").getOrCreate()
    docs = spark.read.parquet(args.input)
    n_in = docs.count()
    kept_ids = curate_corpus(
        docs,
        min_tokens=args.min_tokens,
        min_chars=args.min_chars,
        min_jaccard=args.min_jaccard,
        num_hashes=args.num_hashes,
        bands=args.bands,
    )
    curated = docs.join(kept_ids, "doc_id", "left_semi")
    curated.write.mode("overwrite").parquet(args.output)
    n_out = spark.read.parquet(args.output).count()
    print(json.dumps({"input_docs": n_in, "kept_docs": n_out, "dropped": n_in - n_out}))


if __name__ == "__main__":
    main(sys.argv[1:])
