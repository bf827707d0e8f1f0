"""spanpruning processor parity tests.

Reference: ``processor/spanpruningprocessor`` — leaf spans grouped by
(name, kind, status, tracestate, group_by_attributes, parent span name)
collapse into one summary span per group (template = longest-duration
member; aggregation.go:142-196), parents whose children all aggregated
recurse up to max_parent_depth, selective pruning via OTTL conditions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.pruning import span_pruning

SCHEMA = (
    "trace_id string, span_id string, parent_span_id string, name string, "
    "kind string, status_code string, start_ns long, end_ns long, "
    "attributes map<string,string>"
)


def _trace(spark, extra=()):
    """root -> handler -> 6 identical db queries (leaves) + 1 http leaf."""
    rows = [
        ("t1", "root", "", "GET /", "SERVER", "OK", 0, 1000, {}),
        ("t1", "h1", "root", "handler", "INTERNAL", "OK", 10, 900, {}),
    ]
    for i in range(6):
        rows.append(
            ("t1", f"q{i}", "h1", "SELECT users", "CLIENT", "OK",
             100 + i * 10, 100 + i * 10 + 50 + i, {"db.operation": "select"})
        )
    rows.append(("t1", "x1", "h1", "http call", "CLIENT", "OK", 500, 600, {}))
    rows.extend(extra)
    return spark.createDataFrame(rows, SCHEMA)


def test_leaf_groups_collapse_to_summary(spark):
    out = span_pruning(
        _trace(spark), group_by_attributes=["db.*"], min_spans_to_aggregate=5,
        max_parent_depth=0,
    ).collect()
    names = sorted(r["name"] for r in out)
    # 6 db leaves -> 1 summary; root/handler/http survive
    assert names == ["GET /", "SELECT users", "handler", "http call"]
    s = next(r for r in out if r["name"] == "SELECT users")
    assert s["aggregation.is_summary"] is True
    assert s["aggregation.span_count"] == 6
    assert s["aggregation.duration_min_ns"] == 50
    assert s["aggregation.duration_max_ns"] == 55
    assert s["aggregation.duration_total_ns"] == sum(50 + i for i in range(6))
    # summary spans the earliest start to the latest end
    assert s["start_ns"] == 100 and s["end_ns"] == 100 + 50 + 55
    # template is the longest-duration member, parent preserved
    assert s["parent_span_id"] == "h1"
    # deterministic fresh span id, 16 hex chars
    assert len(s["span_id"]) == 16 and s["span_id"] not in {f"q{i}" for i in range(6)}


def test_min_spans_threshold(spark):
    out = span_pruning(
        _trace(spark), group_by_attributes=["db.*"], min_spans_to_aggregate=7,
        max_parent_depth=0,
    ).collect()
    assert len(out) == 9  # nothing aggregated: 6 < 7


def test_group_by_attribute_splits_groups(spark):
    # different db.operation values must not merge
    extra = [
        ("t1", f"w{i}", "h1", "SELECT users", "CLIENT", "OK", 700 + i, 720 + i,
         {"db.operation": "write"})
        for i in range(5)
    ]
    out = span_pruning(
        _trace(spark, extra), group_by_attributes=["db.*"],
        min_spans_to_aggregate=5, max_parent_depth=0,
    )
    sums = out.filter(F.col("`aggregation.is_summary`")).collect()
    assert len(sums) == 2
    assert sorted(s["aggregation.span_count"] for s in sums) == [5, 6]
    # without the attribute in the key they merge into one group of 11
    merged = span_pruning(
        _trace(spark, extra), group_by_attributes=[],
        min_spans_to_aggregate=5, max_parent_depth=0,
    ).filter(F.col("`aggregation.is_summary`")).collect()
    assert len(merged) == 1 and merged[0]["aggregation.span_count"] == 11


def test_parent_aggregation(spark):
    # two handlers each with 5 identical leaves; with depth 1 the handlers
    # (all children aggregated, same name/kind/status, not root) also merge,
    # and the leaf summaries re-parent onto the handler summary
    rows = [("t2", "root", "", "GET /", "SERVER", "OK", 0, 10_000, {})]
    for h in ("h1", "h2"):
        rows.append(("t2", h, "root", "handler", "INTERNAL", "OK", 10, 5000, {}))
        for i in range(5):
            rows.append(
                ("t2", f"{h}q{i}", h, "SELECT users", "CLIENT", "OK",
                 100 + i, 200 + i, {})
            )
    df = spark.createDataFrame(rows, SCHEMA)
    out = span_pruning(df, min_spans_to_aggregate=5, max_parent_depth=1).collect()
    by_name = {}
    for r in out:
        by_name.setdefault(r["name"], []).append(r)
    assert len(by_name["GET /"]) == 1  # root untouched
    assert len(by_name["handler"]) == 1  # two handlers -> one summary
    hsum = by_name["handler"][0]
    assert hsum["aggregation.is_summary"] and hsum["aggregation.span_count"] == 2
    assert hsum["parent_span_id"] == "root"
    # the leaf summaries (one per handler — parent NAME is in the leaf key
    # but both handlers share it, so leaves merged per (trace, parent name):
    # 10 leaves -> 1 summary) point at the handler summary
    lsums = by_name["SELECT users"]
    assert len(lsums) == 1 and lsums[0]["aggregation.span_count"] == 10
    assert lsums[0]["parent_span_id"] == hsum["span_id"]
    # depth 0 leaves handlers alone
    out0 = span_pruning(df, min_spans_to_aggregate=5, max_parent_depth=0).collect()
    assert sum(1 for r in out0 if r["name"] == "handler") == 2


def test_roots_never_aggregate(spark):
    rows = [
        ("t%d" % i, "r%d" % i, "", "job", "INTERNAL", "OK", 0, 100, {})
        for i in range(6)
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    # roots are leaves here (no children) BUT they are roots of distinct
    # traces — group key includes trace id, so no cross-trace merging
    out = span_pruning(df, min_spans_to_aggregate=2, max_parent_depth=1).collect()
    assert len(out) == 6 and not any(r["aggregation.is_summary"] for r in out)


def test_selective_pruning_conditions(spark):
    rows = []
    for t, svc in (("ta", "prune-me"), ("tb", "keep-whole")):
        rows.append((t, "root", "", "GET /", "SERVER", "OK", 0, 1000, {"svc": svc}))
        for i in range(5):
            rows.append((t, f"q{i}", "root", "SELECT", "CLIENT", "OK",
                         10 + i, 20 + i, {"svc": svc}))
    df = spark.createDataFrame(rows, SCHEMA)
    out = span_pruning(
        df, conditions=['attributes["svc"] == "prune-me"'],
        min_spans_to_aggregate=5, max_parent_depth=0,
    ).collect()
    ta = [r for r in out if r["trace_id"] == "ta"]
    tb = [r for r in out if r["trace_id"] == "tb"]
    assert len(ta) == 2  # root + summary
    assert len(tb) == 6  # untouched
    assert not any(r["aggregation.is_summary"] for r in tb)


def test_outlier_analysis_iqr(spark):
    rows = [("t3", "root", "", "GET /", "SERVER", "OK", 0, 100_000, {})]
    for i in range(19):
        rows.append(("t3", f"q{i}", "root", "SELECT", "CLIENT", "OK", 0, 100 + i, {}))
    rows.append(("t3", "slow", "root", "SELECT", "CLIENT", "OK", 0, 50_000, {}))
    df = spark.createDataFrame(rows, SCHEMA)
    out = span_pruning(
        df, min_spans_to_aggregate=5, max_parent_depth=0,
        enable_outlier_analysis=True, outlier_method="iqr",
    ).filter(F.col("`aggregation.is_summary`")).collect()
    assert len(out) == 1
    s = out[0]
    assert s["aggregation.span_count"] == 20
    assert 100 <= s["aggregation.duration_median_ns"] <= 120
    assert s["aggregation.outlier_count"] == 1  # the 50ms query


def test_determinism(spark):
    df = _trace(spark).repartition(8)
    kw = dict(group_by_attributes=["db.*"], min_spans_to_aggregate=5, max_parent_depth=1)
    a = sorted(map(str, span_pruning(df, **kw).collect()))
    b = sorted(map(str, span_pruning(df, **kw).collect()))
    assert a == b


def test_span_pruning_in_collector_config(spark):
    from opentelemetry_collector_contrib_spark.plans.collector_config import (
        load_collector_config,
    )

    cfg = {
        "receivers": {"inmem": {}},
        "processors": {
            "span_pruning": {
                "group_by_attributes": ["db.*"],
                "min_spans_to_aggregate": 5,
                "max_parent_depth": 0,
            }
        },
        "exporters": {},
        "service": {
            "pipelines": {
                "traces/in": {
                    "receivers": ["inmem"],
                    "processors": ["span_pruning"],
                    "exporters": [],
                }
            }
        },
    }
    t = load_collector_config(spark, cfg, receiver_frames={"inmem": _trace(spark)})
    out = t.frames["traces/in"].collect()
    assert sum(1 for r in out if r["aggregation.is_summary"]) == 1
    assert len(out) == 4
