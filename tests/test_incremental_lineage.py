"""Per-file incremental pipeline: the filelog poll-cycle checkpoint contract
(fingerprint per file, resume skips committed files, delta counts additive).

Reference: fileconsumer/internal/checkpoint/checkpoint.go:24-44 (save per
poll), reader.go:30-40 (per-file record), countconnector counter.go:39-127
(monotonic delta sums per flush).
"""

import glob
import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.plans.pipeline import (
    run_pipeline,
    run_pipeline_incremental,
)
from opentelemetry_collector_contrib_spark.sources.tokens import write_tokens_parquet


@pytest.fixture(scope="module")
def chunks(tmp_path_factory):
    """Three parquet chunk files, staged as separate 'arriving' files."""
    root = tmp_path_factory.mktemp("inc")
    src = write_tokens_parquet(str(root / "src"), n=6000, seed=7, chunk=2000)
    parts = sorted(glob.glob(os.path.join(src, "*.parquet")))
    assert len(parts) == 3
    return root, parts


def _arrive(inp, parts):
    os.makedirs(inp, exist_ok=True)
    for p in parts:
        shutil.copy(p, os.path.join(inp, os.path.basename(p)))


def test_incremental_processes_only_new_files(spark, chunks):
    root, parts = chunks
    inp, out = str(root / "in1"), str(root / "out1")

    _arrive(inp, parts[:2])
    m1 = run_pipeline_incremental(spark, inp, out)
    assert m1["files_processed"] == 2
    first_total = m1["rows_routed"] + m1["rows_errors"]
    assert first_total == 4000

    # nothing new → no-op poll
    m2 = run_pipeline_incremental(spark, inp, out)
    assert m2.get("skipped") and m2["files_processed"] == 0

    # third file arrives → only it is processed
    _arrive(inp, parts[2:])
    m3 = run_pipeline_incremental(spark, inp, out)
    assert m3["files_processed"] == 1
    assert m3["rows_routed"] + m3["rows_errors"] == 2000

    # routed sink accumulated everything exactly once
    assert spark.read.parquet(os.path.join(out, "routed")).count() == 6000


def test_incremental_totals_match_batch_run(spark, chunks):
    root, parts = chunks
    inp, out_inc, out_batch = str(root / "in2"), str(root / "out_inc"), str(root / "out_batch")

    _arrive(inp, parts[:1])
    run_pipeline_incremental(spark, inp, out_inc)
    _arrive(inp, parts[1:])
    run_pipeline_incremental(spark, inp, out_inc)

    run_pipeline(spark, inp, out_batch)

    # summing the per-flush DELTA counts reproduces the batch totals
    inc = (
        spark.read.parquet(os.path.join(out_inc, "counts_delta"))
        .groupBy("route_id", "severity_text")
        .agg(F.sum("count").alias("count"))
    )
    batch = spark.read.parquet(os.path.join(out_batch, "counts"))
    a = {(r.route_id, r.severity_text): r["count"] for r in inc.collect()}
    b = {(r.route_id, r.severity_text): r["count"] for r in batch.collect()}
    assert a == b

    # per-file lineage records exist with row accounting
    recs = [
        json.load(open(os.path.join(out_inc, "_lineage", f)))
        for f in os.listdir(os.path.join(out_inc, "_lineage"))
        if f.startswith("file@")
    ]
    assert len(recs) == 3
    assert sum(r["rows_in"] for r in recs) == 6000
