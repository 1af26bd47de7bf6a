"""Search job — the read-side complement to jobs/run_pipeline.py:
query the routed sink tables the pipeline wrote (BM25 ranking) or
mine their log templates.

    spark-submit --py-files dist/fposs.zip jobs/search_logs.py \\
        --warehouse <sink catalog dir> [--table sink] \\
        --query "timeout error" [--k 10] [--text-col text] \\
        | or: --templates [--id-col conv_id]

Reads the CURRENT snapshot through ``SinkCatalog.read`` (never raw
version dirs — uncommitted/orphan data stays invisible); pass
``--version N`` to time-travel to a retained snapshot. Prints one
JSON line: ranked hits (doc id, index, score) or the template
profile.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str]) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--warehouse", required=True)
    p.add_argument("--table", default="sink")
    p.add_argument("--version", type=int, default=None,
                   help="time-travel to a retained snapshot version")
    p.add_argument("--query", default=None, help="BM25 query string")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="_id")
    p.add_argument("--all-terms", action="store_true",
                   help="conjunctive search: only docs containing every query term")
    p.add_argument("--templates", action="store_true",
                   help="mine log templates instead of searching")
    args = p.parse_args(argv)
    if bool(args.query) == args.templates:
        p.error("exactly one of --query or --templates is required")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from fluent_plugin_opensearch_spark.operators.search import bm25_topk, log_templates
    from fluent_plugin_opensearch_spark.sinks.writer import SinkCatalog

    spark = SparkSession.builder.appName("search-logs").getOrCreate()
    cat = SinkCatalog(args.warehouse)
    docs = cat.read(spark, args.table, version=args.version)

    if args.templates:
        rows = (
            log_templates(docs, id_col=args.id_col, text_col=args.text_col)
            .orderBy(F.desc("n_events"), "template")
            .collect()
        )
        print(json.dumps({
            "table": args.table,
            "templates": [r.asDict() for r in rows],
        }))
        return

    hits = bm25_topk(
        docs, args.query, k=args.k, id_col=args.id_col, text_col=args.text_col,
        require_all=args.all_terms,
    )
    # attach the routed index of each hit as the evidence pointer
    meta = docs.select(F.col(args.id_col), F.col("_index")).dropDuplicates([args.id_col])
    out = (
        hits.join(meta, args.id_col, "left")
        .orderBy("rank")
        .collect()
    )
    print(json.dumps({
        "table": args.table,
        "query": args.query,
        "hits": [r.asDict() for r in out],
    }))


if __name__ == "__main__":
    main(sys.argv[1:])
