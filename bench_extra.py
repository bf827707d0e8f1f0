#!/usr/bin/env python
"""Round-6 optimization harness (bench.py is FROZEN for measurement; this
file exists so per-query isolation runs, repeats, and plan captures don't
touch it — guide §1.4 noop-sink methodology).

Usage:
  python bench_extra.py [--sf DIR] [--repeats N] [--queries a,b,c]
                        [--plans OUTDIR] [--tag LABEL] [--json OUT]

Times every catalog query with a noop-format write (full materialization,
no driver collect), best-of-N repeats, and optionally writes
``.explain("formatted")`` for each query to OUTDIR/<query>_<tag>.txt.
Prints one JSON line {"sf":..., "queries": {name: best_sec}, "raw": {...}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from opentelemetry_collector_contrib_spark.plans import catalog  # noqa: E402
from opentelemetry_collector_contrib_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--queries", default="")
    ap.add_argument("--plans", default="")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--json", default="")
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        app_name="bench_extra",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    # same warmup as bench.py: executor pool + parquet reader + Arrow workers
    from pyspark.sql import functions as SF

    @SF.pandas_udf("long")
    def _warm(s):
        return s

    spark.read.parquet(f"{args.sf}/events.parquet").limit(10).select(
        _warm(SF.col("event_id"))
    ).write.format("noop").mode("overwrite").save()

    names = [q.strip() for q in args.queries.split(",") if q.strip()] or list(
        catalog.QUERIES.keys()
    )
    best: dict[str, float] = {}
    raw: dict[str, list[float]] = {}
    for name in names:
        fn = catalog.QUERIES[name]
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            try:
                plan = fn(spark, args.sf)._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                )
                with open(os.path.join(args.plans, f"{name}_{args.tag}.txt"), "w") as f:
                    f.write(plan)
            except Exception as e:  # plan capture must not break timing
                print(f"plan capture {name} failed: {e}", file=sys.stderr)
        walls = []
        for i in range(args.repeats):
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            t0 = time.time()
            try:
                fn(spark, args.sf).write.format("noop").mode("overwrite").save()
                walls.append(round(time.time() - t0, 3))
            except Exception as e:
                print(f"query {name} failed: {str(e).splitlines()[0][:160]}", file=sys.stderr)
                walls.append(-1.0)
                break
        spark.sparkContext.setJobDescription(None)
        raw[name] = walls
        best[name] = min(walls) if walls else -1.0
        print(f"query {name}: {walls} -> {best[name]}", file=sys.stderr, flush=True)

    out = {"sf": args.sf, "repeats": args.repeats, "queries": best, "raw": raw}
    line = json.dumps(out)
    print(line)
    if args.json:
        with open(args.json, "w") as f:
            f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
