"""10× scale-evidence run with stage-level shuffle/spill accounting.

Runs the flagship pipeline (sinks on) over an 80M-row token table at
local[32] with the Spark EVENT LOG enabled, then parses the JSON event log
(SparkListenerTaskEnd → Task Metrics) for byte-level totals: shuffle
read/write, memory/disk spill, input/output. Evidence for BASELINE.md's
"would the sf0.1 plan survive 10×" section — a scan-shaped pipeline should
show shuffle bytes tiny relative to input (only the count aggregates
shuffle) and zero spill.

Usage: python tools/sf1_stats.py [rows] (default 80_000_000)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from opentelemetry_collector_contrib_spark.plans.pipeline import run_pipeline  # noqa: E402
from opentelemetry_collector_contrib_spark.session import get_spark  # noqa: E402
from opentelemetry_collector_contrib_spark.sources.tokens import write_tokens_parquet  # noqa: E402


def parse_event_log(log_dir: str) -> dict:
    tot = {
        "shuffle_read_bytes": 0,
        "shuffle_write_bytes": 0,
        "memory_spill_bytes": 0,
        "disk_spill_bytes": 0,
        "input_bytes": 0,
        "output_bytes": 0,
        "tasks": 0,
        "peak_execution_memory_max": 0,
    }
    paths = []
    for root, _dirs, files in os.walk(log_dir):  # event log v2 nests a dir
        paths += [os.path.join(root, f) for f in files if "appstatus" not in f]
    for path in paths:
        with open(path) as fh:
            for line in fh:
                if '"SparkListenerTaskEnd"' not in line:
                    continue
                ev = json.loads(line)
                m = ev.get("Task Metrics")
                if not m:
                    continue
                tot["tasks"] += 1
                tot["memory_spill_bytes"] += m.get("Memory Bytes Spilled", 0)
                tot["disk_spill_bytes"] += m.get("Disk Bytes Spilled", 0)
                tot["input_bytes"] += m.get("Input Metrics", {}).get("Bytes Read", 0)
                tot["output_bytes"] += m.get("Output Metrics", {}).get("Bytes Written", 0)
                srm = m.get("Shuffle Read Metrics", {})
                tot["shuffle_read_bytes"] += srm.get("Local Bytes Read", 0) + srm.get(
                    "Remote Bytes Read", 0
                )
                tot["shuffle_write_bytes"] += m.get("Shuffle Write Metrics", {}).get(
                    "Shuffle Bytes Written", 0
                )
                tot["peak_execution_memory_max"] = max(
                    tot["peak_execution_memory_max"], m.get("Peak Execution Memory", 0)
                )
    return tot


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 80_000_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    cache = os.path.join(REPO, ".bench_data", f"tokens_{rows}")
    t0 = time.time()
    write_tokens_parquet(cache, rows, seed=42)
    print(f"data ready in {time.time() - t0:.0f}s", file=sys.stderr)

    log_dir = tempfile.mkdtemp(prefix="sf1_eventlog_")
    spark = get_spark(
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        app_name="sf1stats",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "24g"),
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            "spark.eventLog.compress": "false",  # parse as plain JSON lines
        },
    )

    out = f"/tmp/sf1stats_out_{int(t0)}"
    t0 = time.time()
    run_pipeline(spark, cache, out, write_sinks=True)
    wall = time.time() - t0
    spark.stop()
    time.sleep(2)  # let the event log flush/close

    tot = parse_event_log(log_dir)
    result = {
        "rows": rows,
        "wall_sec": round(wall, 1),
        "rows_per_sec": round(rows / wall, 1),
        **tot,
    }
    for k in ("shuffle_read_bytes", "shuffle_write_bytes", "input_bytes", "output_bytes"):
        result[k.replace("_bytes", "_gb")] = round(result[k] / 2**30, 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
