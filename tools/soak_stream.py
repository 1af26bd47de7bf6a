"""Streaming soak evidence (VERDICT r2 item 10 / item 9 of 'Next
round'): drive ONE continuous stream through ≥200 real micro-batches
(maxFilesPerTrigger=1 under an availableNow drain) with periodic
compaction + marker pruning enabled, then report the bounds that matter
for an always-on pipeline:

  * on-disk version-dir count (compact + vacuum must keep it flat, not
    O(#batches));
  * manifest size and retained marker count (marker GC bounds both);
  * snapshot read time + row-count correctness after the churn.

Usage: python tools/soak_stream.py [n_batches] [compact_every]
Writes everything under /tmp/soak_stream_*; prints one JSON line.
Numbers from a recorded run live in PLANS.md §streaming-soak.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, ".")

from fluent_plugin_opensearch_spark import PipelineConfig, SinkCatalog, load_transcripts
from fluent_plugin_opensearch_spark.session import get_spark
from fluent_plugin_opensearch_spark.streaming.stream import (
    TRANSCRIPTS_SCHEMA,
    start_pipeline_stream,
)

CFG = PipelineConfig(logstash_format=True, logstash_prefix="logs")


def main(n_batches: int = 200, compact_every: int = 25) -> dict:
    spark = get_spark(8, 16, app_name="soak-stream")
    root = "/tmp/soak_stream"
    shutil.rmtree(root, ignore_errors=True)
    src, wh, ck = f"{root}/src", f"{root}/wh", f"{root}/ck"

    # n_batches part files (one micro-batch each under
    # maxFilesPerTrigger=1) — written BY Spark so the timestamp_ntz
    # logical type round-trips (pyarrow INT64 timestamps don't)
    t = load_transcripts(spark, "/root/testdata/sf0.001").cache()
    t.repartition(n_batches).write.parquet(src)
    n_files = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    assert n_files >= n_batches * 0.95, f"only {n_files} source files"

    source = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    t0 = time.time()
    q = start_pipeline_stream(
        spark, source, CFG, SinkCatalog(wh), ck,
        available_now=True, compact_every=compact_every,
    )
    q.awaitTermination(3600)
    drain_s = time.time() - t0
    batches = len(q._pipeline_metrics)

    cat = SinkCatalog(wh)
    m = cat.manifest("sink")
    live_versions = {v for vs in m["partitions"].values() for v in vs}
    on_disk = [d for d in os.listdir(cat.path("sink")) if d.startswith("v_")]
    manifest_bytes = os.path.getsize(os.path.join(cat.path("sink"), "_manifest.json"))

    t1 = time.time()
    sink_rows = cat.read(spark, "sink").count()
    read_s = time.time() - t1

    from fluent_plugin_opensearch_spark import build, split_streams

    good, _ = split_streams(build(t, CFG, spark), CFG)
    expected = good.count()

    report = {
        "micro_batches": batches,
        "drain_sec": round(drain_s, 1),
        "sec_per_batch": round(drain_s / max(batches, 1), 2),
        "live_version_dirs": len(live_versions),
        "on_disk_version_dirs": len(on_disk),
        "markers_retained": len(m.get("markers", [])),
        "manifest_bytes": manifest_bytes,
        "snapshot_read_sec": round(read_s, 2),
        "sink_rows": sink_rows,
        "expected_rows": expected,
        "rows_exact": sink_rows == expected,
        "compact_every": compact_every,
    }
    print(json.dumps(report))
    assert sink_rows == expected, "soak lost or duplicated rows"
    assert len(on_disk) <= compact_every + 2, "version dirs grew unbounded"
    assert len(m.get("markers", [])) <= 64, "marker GC failed to bound the set"
    return report


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 200,
        int(sys.argv[2]) if len(sys.argv) > 2 else 25,
    )
