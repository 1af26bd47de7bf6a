"""Continuous-mode state-eviction soak (VERDICT r3 #7): run the two
custom stateful operators — the sessionizer and the Misra-Gries
heavy-hitter sketch — under a real ``processingTime`` trigger with
``evict_state=True``, and prove the state store stays BOUNDED while
keys churn (every micro-batch introduces fresh conv ids / fresh hour
windows; old ones idle out past the processing-time timeout).

This is the complement of tools/soak_stream.py (which drains 200
batches under availableNow, where timers must stay OFF — the CLAUDE.md
gotcha): here timers are ON, so the assertion is about state SIZE over
wall-clock, not output parity:

  * numRowsTotal (state rows) must plateau well below the total number
    of distinct keys fed — a NoTimeout run grows ~linearly forever;
  * numRowsRemoved must be > 0 (evictions actually fired);
  * the run must terminate cleanly on stop() (no timer wedge).

Usage: python tools/soak_continuous.py [n_files] [convs_per_file]
Writes under /tmp/soak_continuous_*; prints one JSON line per phase.
Recorded numbers live in PLANS.md §streaming-soak.
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from datetime import datetime, timedelta

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from fluent_plugin_opensearch_spark.session import get_spark  # noqa: E402
from fluent_plugin_opensearch_spark.streaming.stream import (  # noqa: E402
    heavy_hitters_sketch_stream,
    sessionize_stream,
)

SOAK_SCHEMA = "conv_id string, turn_idx int, ts timestamp"


def _write_source(spark, src: str, n_files: int, convs_per_file: int) -> int:
    """n_files parquet files, each with a DISJOINT fresh set of conv
    ids and advancing event hours — the churn that makes eviction
    measurable. Returns total distinct convs fed."""
    base = datetime(2024, 1, 1)
    rows = []
    for i in range(n_files):
        for j in range(convs_per_file):
            conv = f"soak-{i:04d}-{j:02d}"
            for t in range(3):
                rows.append((conv, t, base + timedelta(hours=i // 10, minutes=i % 10, seconds=t)))
    df = spark.createDataFrame(rows, SOAK_SCHEMA)
    # file index IS the partition index → one fresh key-set per file
    (
        df.repartition(n_files, F.substring("conv_id", 6, 4))
        .write.mode("overwrite")
        .parquet(src)
    )
    return n_files * convs_per_file


def _drive(q, max_sec: float, settle_batches: int = 4) -> dict:
    """Poll state-operator metrics until the source is exhausted (batch
    ids stop advancing) or ``max_sec`` elapses; return the series."""
    series: list[dict] = []
    seen_batches: set[int] = set()
    idle_polls = 0
    t0 = time.time()
    while time.time() - t0 < max_sec and idle_polls < settle_batches * 4:
        time.sleep(1.0)
        p = q.lastProgress
        if not p or not p.get("stateOperators"):
            continue
        b = p["batchId"]
        if b in seen_batches:
            idle_polls += 1
            continue
        idle_polls = 0
        seen_batches.add(b)
        so = p["stateOperators"][0]
        series.append(
            {
                "batch": b,
                "rows_total": so.get("numRowsTotal"),
                "rows_removed": so.get("numRowsRemoved", 0),
                "input_rows": p.get("numInputRows"),
            }
        )
    q.stop()
    q.awaitTermination(60)
    return {
        "batches": len(series),
        "wall_sec": round(time.time() - t0, 1),
        "state_rows_series": [s["rows_total"] for s in series],
        "peak_state_rows": max((s["rows_total"] for s in series), default=0),
        "final_state_rows": series[-1]["rows_total"] if series else 0,
        "total_removed": sum(s["rows_removed"] or 0 for s in series),
    }


def main(n_files: int = 180, convs_per_file: int = 20) -> None:
    spark = get_spark(8, 16, app_name="soak-continuous")
    spark.sparkContext.setLogLevel("ERROR")
    root = "/tmp/soak_continuous"
    shutil.rmtree(root, ignore_errors=True)
    src = f"{root}/src"
    total_keys = _write_source(spark, src, n_files, convs_per_file)

    def source():
        return (
            spark.readStream.schema(SOAK_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    # --- phase 1: sessionizer, 1-minute gap => 60 s processing-time
    # timeout; fresh convs per file, so steady state ≈ keys seen in the
    # trailing 60 s, far below total_keys -------------------------------
    sess = sessionize_stream(source(), gap_minutes=1, watermark="30 days", evict_state=True)
    q1 = (
        sess.writeStream.format("noop")
        .option("checkpointLocation", f"{root}/ck_sess")
        .trigger(processingTime="1 second")
        .start()
    )
    r1 = _drive(q1, max_sec=330)
    r1.update(phase="sessionize_evict", total_keys_fed=total_keys)
    print(json.dumps(r1))

    # --- phase 2: MG sketch, hour windows churn (one new window per 10
    # files), 1-minute eviction; state = O(capacity) per LIVE window ----
    hh = heavy_hitters_sketch_stream(
        source(), capacity=8, watermark="30 days",
        evict_state=True, evict_after_minutes=1,
    )
    q2 = (
        hh.writeStream.format("noop")
        .option("checkpointLocation", f"{root}/ck_hh")
        .trigger(processingTime="1 second")
        .start()
    )
    r2 = _drive(q2, max_sec=330)
    n_windows = (n_files + 9) // 10
    r2.update(phase="mg_sketch_evict", total_windows_fed=n_windows)
    print(json.dumps(r2))

    # --- the bounds that matter --------------------------------------
    assert r1["total_removed"] > 0, "sessionizer: no state was ever evicted"
    assert r1["final_state_rows"] < 0.6 * total_keys, (
        f"sessionizer state {r1['final_state_rows']} not bounded vs {total_keys} keys fed"
    )
    assert r2["total_removed"] > 0, "MG sketch: no window state was ever evicted"
    assert r2["final_state_rows"] < n_windows, (
        f"MG state {r2['final_state_rows']} >= windows fed {n_windows} (no eviction?)"
    )
    print(json.dumps({"soak_continuous": "PASS"}))
    spark.stop()


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 180,
        int(sys.argv[2]) if len(sys.argv) > 2 else 20,
    )
