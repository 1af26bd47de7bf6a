"""Production job entrypoint (north_star: "launched with spark-submit
--py-files on multi-executor clusters").

    python tools/package.py                       # builds dist/fposs.zip
    spark-submit --py-files dist/fposs.zip \\
        jobs/run_pipeline.py \\
        --input  <transcripts table/path> \\
        --warehouse <sink catalog dir> \\
        --logstash-prefix logs --batch-id run-2026-08-16 \\
        [--streaming --checkpoint <dir>]

On a real cluster ``--input`` is the Iceberg transcripts table
(``spark.read.table``); the sandbox uses parquet paths. The job is
idempotent per ``--batch-id`` (checkpoint manifest) and emits per-sink
metrics + lineage to the warehouse.
"""

from __future__ import annotations

import argparse
import json
import sys


def parse_args(argv: list[str]) -> argparse.Namespace:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="transcripts parquet path or table name")
    p.add_argument("--warehouse", required=True, help="sink catalog base dir")
    p.add_argument("--batch-id", default=None)
    p.add_argument("--manifest", default=None, help="checkpoint manifest path (resume)")
    p.add_argument("--logstash-prefix", default="logs")
    p.add_argument("--index-name", default="fluentd")
    p.add_argument("--no-logstash", action="store_true")
    p.add_argument("--target-index-key", default=None)
    p.add_argument("--id-key", default=None)
    p.add_argument("--write-operation", default="index")
    p.add_argument(
        "--target-index-affinity",
        action="store_true",
        help="route update/upsert to the index where the doc already lives (R5)",
    )
    p.add_argument("--retry-tag", default=None)
    p.add_argument("--salt-buckets", type=int, default=0)
    p.add_argument("--sink-partitions", type=int, default=0)
    p.add_argument(
        "--compact-after",
        action="store_true",
        help="run sink compaction (collapse multi-version partitions) after the batch",
    )
    p.add_argument("--streaming", action="store_true")
    p.add_argument("--checkpoint", default=None, help="streaming checkpoint dir")
    p.add_argument(
        "--available-now",
        action="store_true",
        help="streaming: drain the current backlog then stop (bounded run)",
    )
    return p.parse_args(argv)


def main(argv: list[str]) -> None:
    args = parse_args(argv)

    from pyspark.sql import SparkSession

    from fluent_plugin_opensearch_spark import CheckpointManifest, PipelineConfig, run_batch
    from fluent_plugin_opensearch_spark.sinks.writer import SinkCatalog

    spark = SparkSession.builder.appName("transcript-pipeline").getOrCreate()
    cfg = PipelineConfig(
        logstash_format=not args.no_logstash,
        logstash_prefix=args.logstash_prefix,
        index_name=args.index_name,
        target_index_key=args.target_index_key,
        id_key=args.id_key,
        write_operation=args.write_operation,
        target_index_affinity=args.target_index_affinity,
        retry_tag=args.retry_tag,
        salt_buckets=args.salt_buckets,
        sink_partitions=args.sink_partitions,
    )
    catalog = SinkCatalog(args.warehouse)

    if args.streaming:
        from fluent_plugin_opensearch_spark.streaming.stream import (
            read_transcript_stream,
            start_pipeline_stream,
        )

        q = start_pipeline_stream(
            spark,
            read_transcript_stream(spark, args.input),
            cfg,
            catalog,
            args.checkpoint or f"{args.warehouse}/_checkpoints",
            available_now=args.available_now,
        )
        q.awaitTermination()
        print(json.dumps({"streaming": True, "batches": len(q._pipeline_metrics)}))
        return

    transcripts = (
        spark.read.table(args.input) if "/" not in args.input else spark.read.parquet(args.input)
    )
    manifest = CheckpointManifest(args.manifest) if args.manifest else None
    metrics = run_batch(spark, transcripts, cfg, catalog, batch_id=args.batch_id, manifest=manifest)
    if args.compact_after:
        metrics["compacted_partitions"] = catalog.compact(spark, "sink")
    print(json.dumps(metrics))


if __name__ == "__main__":
    main(sys.argv[1:])
