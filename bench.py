"""Benchmark harness (driver contract): runs the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line.

``value`` is the BASELINE.json metric — parsed+routed turns/sec through
the full pipeline (parse → enrich → route → split → per-sink counts)
over a deterministic synthesized transcripts table
(``$SPARK_GRAFT_BENCH_ROWS`` rows, default 2M, with hot-conversation
skew). ``queries`` carries per-query wall seconds at the sf dir.

Two-parallelism scaling evidence (north_rule) is produced by
``tools/scaling_bench.py`` which subprocess-runs this file at two CPU
counts and writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from fluent_plugin_opensearch_spark import PipelineConfig, build, split_streams, synthesize_transcripts  # noqa: E402
from fluent_plugin_opensearch_spark.plans.queries import QUERIES  # noqa: E402
from fluent_plugin_opensearch_spark.session import get_spark  # noqa: E402

#: queries timed per round (coverage across pipeline + dataset ops)
BENCH_QUERIES = [
    "route_logstash_counts",
    "parse_extract",
    "time_key_parse",
    "enrich_role_counts",
    "genid_sha256",
    "error_taxonomy",
    "affinity_routing",
    "per_conv_stats",
    "conv_gaps",
    "dedup_exact",
    "minhash_lsh_pairs",
    "simhash64",
    "text_stats",
    "ann_cosine_topk",
]

CFG = PipelineConfig(logstash_format=True, logstash_prefix="logs")


def force(df) -> int:
    """Execute the plan; cheap-but-total materialization (no driver
    collect of payloads — counts only, like a sink write minus IO)."""
    return df.count()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    bench_rows = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "2000000"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1

    spark = get_spark(cpus, shuffle_partitions=2 * cpus, app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # ---- per-query timings at the sf dir ----
    qtimes: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        force(QUERIES[name](spark, sf_dir))
        qtimes[name] = round(time.time() - t0, 3)

    # ---- pipeline throughput on synthesized transcripts ----
    t = synthesize_transcripts(spark, bench_rows, n_convs=max(bench_rows // 200, 100))
    t = t.persist()
    n = t.count()  # materialize input outside the timed window
    t0 = time.time()
    good, dlq = split_streams(build(t, CFG, spark), CFG)
    routed = force(good.groupBy("_index").agg(F.count(F.lit(1)).alias("routed_rows")))
    dlq_n = force(dlq.groupBy("dlq_reason").agg(F.count(F.lit(1)).alias("n")))
    elapsed = time.time() - t0
    t.unpersist()
    turns_per_sec = n / elapsed

    print(
        json.dumps(
            {
                "metric": "parsed+routed turns/sec (full pipeline over synthesized transcripts)",
                "value": round(turns_per_sec, 1),
                "unit": "turns/sec",
                "queries": qtimes,
                "sf": sf,
                "pipeline_rows": n,
                "pipeline_sec": round(elapsed, 3),
                "cpus": cpus,
                "sink_groups": routed,
                "dlq_groups": dlq_n,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
