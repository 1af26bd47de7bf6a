"""Sink maintenance job — the periodic compaction/retention pass a
long-running ingest deployment schedules (the Iceberg
rewrite_data_files + expire_snapshots pair, on the sandbox catalog):

    spark-submit --py-files dist/fposs.zip jobs/maintain_sinks.py \\
        --warehouse <sink catalog dir> [--tables sink,hh_rollup] \\
        [--max-versions 1] [--keep-snapshots 1 | 0=drop history] \\
        [--delete-ids a1,b2 | --delete-ids @ids.txt] [--dry-run]

Per table: collapse partitions fragmented across more than
``--max-versions`` version dirs into one fresh version (atomic
commit), optionally trim the snapshot log to ``--keep-snapshots``
entries, then vacuum unreferenced version dirs. Prints one JSON line
with per-table counts. ``--dry-run`` reports what would be done
without touching anything.

Retention is OPT-IN (r5, ADVICE r4): by default the snapshot log is
left at its existing length — a plain maintenance run must never trim
a history-keeping writer's log to one entry and let the vacuum GC the
released version dirs. Dropping history is the explicit act of
passing ``--keep-snapshots N`` (0 = drop all history).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv: list[str]) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--warehouse", required=True)
    p.add_argument("--tables", default=None,
                   help="comma-separated; default: every table dir with a manifest")
    p.add_argument("--max-versions", type=int, default=1)
    p.add_argument("--keep-snapshots", type=int, default=None,
                   help="historical snapshot-log entries to retain. Default: "
                        "preserve the existing log length (expire_snapshots is "
                        "skipped entirely). Dropping history is explicit: pass "
                        "a number (0 = drop all). The current state is always "
                        "readable regardless.")
    p.add_argument("--delete-ids", default=None,
                   help="comma-separated _id values OR @/path/to/file "
                        "(one id per line) to bulk-delete from each "
                        "selected table BEFORE compaction — the "
                        "right-to-be-forgotten pass (partition-scoped "
                        "rewrite, absent ids are not_found-idempotent). "
                        "Requires an explicit --tables list. NOTE: on a "
                        "table with a retained snapshot log the deleted "
                        "rows stay time-travelable until expiry — the "
                        "report carries snapshots_retaining_deleted when "
                        "so; combine with --keep-snapshots 0 for physical "
                        "purge in this same invocation (expiry runs after "
                        "the delete stage).")
    p.add_argument("--dry-run", action="store_true")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from fluent_plugin_opensearch_spark.sinks.writer import SinkCatalog

    if args.delete_ids and not args.tables:
        p.error("--delete-ids requires an explicit --tables list "
                "(a blanket delete across every table must be spelled out)")
    del_ids: list[str] = []
    if args.delete_ids:
        if args.delete_ids.startswith("@"):
            with open(args.delete_ids[1:]) as f:
                del_ids = [ln.strip() for ln in f if ln.strip()]
        else:
            del_ids = [i.strip() for i in args.delete_ids.split(",") if i.strip()]

    cat = SinkCatalog(args.warehouse)
    if args.tables:
        tables = [t.strip() for t in args.tables.split(",") if t.strip()]
        missing = [
            t for t in tables
            if not os.path.exists(os.path.join(args.warehouse, t, "_manifest.json"))
        ]
        if missing:
            # an unknown name would synthesize an empty manifest and
            # report a healthy zero-count pass for a table that was
            # never maintained — fail loudly instead
            p.error(f"no manifest for table(s): {', '.join(sorted(missing))}")
    else:
        tables = sorted(
            d for d in os.listdir(args.warehouse)
            if os.path.exists(os.path.join(args.warehouse, d, "_manifest.json"))
        )

    report: dict[str, dict] = {}
    spark = None
    for table in tables:
        frag = cat.fragmented(table, args.max_versions)
        pre_snapshots = len(cat.manifest(table).get("snapshots", []))
        entry = {"fragmented_partitions": len(frag)}
        if args.dry_run:
            entry["snapshots_retained"] = pre_snapshots
            entry["would_expire"] = (
                0 if args.keep_snapshots is None
                else max(0, pre_snapshots - args.keep_snapshots)
            )
            if del_ids:
                entry["would_delete_ids"] = len(del_ids)
            report[table] = entry
            continue
        if del_ids:
            from fluent_plugin_opensearch_spark.sinks.writer import delete_ids

            if spark is None:
                spark = SparkSession.builder.appName("maintain-sinks").getOrCreate()
            entry["delete"] = delete_ids(spark, del_ids, cat, table)
        if frag:
            if spark is None:
                spark = SparkSession.builder.appName("maintain-sinks").getOrCreate()
            entry["compacted_partitions"] = cat.compact(
                spark, table, max_versions=args.max_versions
            )
        if args.keep_snapshots is not None:
            entry["expired_snapshots"] = cat.expire_snapshots(
                table, keep=args.keep_snapshots
            )
        entry["vacuumed_dirs"] = cat.vacuum(table)
        # post-maintenance state, so the report never claims history
        # that was just expired
        entry["snapshots_retained"] = len(cat.manifest(table).get("snapshots", []))
        report[table] = entry
    print(json.dumps({"warehouse": args.warehouse, "tables": report}))


if __name__ == "__main__":
    main(sys.argv[1:])
