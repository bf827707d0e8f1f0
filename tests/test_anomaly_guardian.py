"""isolationforest + cardinalityguardian processor parity tests.

References: ``processor/isolationforestprocessor`` (scoring
isolation_forest.go:242-270, outputs processor.go:439-445, modes
config.go:135) and ``processor/cardinalityguardianprocessor``
(delta detection processor.go:755-805, enforcement processor.go:411-478,
reaggregation.go merge semantics).
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators import anomaly
from opentelemetry_collector_contrib_spark.operators.metrics import (
    OVERFLOW_SENTINEL,
    cardinality_guardian,
)

# ------------------------------------------------------------------ iforest


def _blob(seed=3, n=400, outliers=4):
    rng = np.random.default_rng(seed)
    X = rng.normal(0.0, 1.0, size=(n, 2))
    X[:outliers] = rng.normal(14.0, 0.3, size=(outliers, 2))  # planted far cluster
    return X


def test_iforest_numpy_separates_planted_outliers():
    X = _blob()
    trees, sub = anomaly.fit_isolation_forest(X, forest_size=60, subsample_size=128, seed=5)
    s = anomaly.score_isolation_forest(X, trees, sub)
    assert s.shape == (400,)
    assert np.all((s >= 0) & (s <= 1))
    # every planted outlier outscores every inlier
    assert s[:4].min() > s[4:].max()


def test_iforest_score_formula_normalization():
    # a point isolated at depth 0 in every tree has score 2^0 = 1-ish upper
    # bound; identical points (no splits possible) get c(leaf)/c(sub) ~ 1 →
    # score ~ 0.5 (the iForest "no distinction" point, Liu et al. §3)
    X = np.zeros((64, 2))
    trees, sub = anomaly.fit_isolation_forest(X, forest_size=20, subsample_size=32, seed=1)
    s = anomaly.score_isolation_forest(X, trees, sub)
    assert np.allclose(s, 0.5, atol=0.12)


def test_iforest_c_normalizer():
    assert anomaly._c(1) == 0.0
    assert anomaly._c(2) == 1.0
    # c(n) ≈ 2 ln(n-1) + 2γ − 2(n−1)/n grows logarithmically
    assert 6.0 < anomaly._c(256) < 12.0
    assert anomaly._c(256) < anomaly._c(1024)


def test_iforest_enrich_mode(spark):
    X = _blob(seed=11)
    rows = [(i, float(x), float(y)) for i, (x, y) in enumerate(X)]
    df = spark.createDataFrame(rows, "id int, fx double, fy double").repartition(4)
    out = anomaly.isolation_forest(
        df, ["fx", "fy"], mode="enrich", forest_size=60, subsample_size=128,
        window_size=400, anomaly_threshold=None, contamination_rate=0.01, seed=5,
    )
    got = {r["id"]: r for r in out.collect()}
    assert len(got) == 400
    flagged = {i for i, r in got.items() if r[anomaly.FLAG_COL]}
    assert set(range(4)) <= flagged
    assert len(flagged) <= 12  # ~1% contamination of 400 + approx-percentile slack


def test_iforest_filter_and_both_modes(spark):
    X = _blob(seed=11)
    rows = [(i, float(x), float(y)) for i, (x, y) in enumerate(X)]
    df = spark.createDataFrame(rows, "id int, fx double, fy double")
    kept = anomaly.isolation_forest(
        df, ["fx", "fy"], mode="filter", forest_size=60, subsample_size=128,
        window_size=400, anomaly_threshold=0.62, seed=5,
    )
    ids = {r["id"] for r in kept.select("id").collect()}
    assert ids.isdisjoint(range(4))
    assert anomaly.SCORE_COL not in kept.columns
    both = anomaly.isolation_forest(
        df, ["fx", "fy"], mode="both", forest_size=60, subsample_size=128,
        window_size=400, anomaly_threshold=0.62, seed=5,
    )
    assert anomaly.SCORE_COL in both.columns
    assert {r["id"] for r in both.select("id").collect()} == ids


def test_iforest_deterministic(spark):
    X = _blob(seed=2, n=100, outliers=2)
    df = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(X)],
        "id int, fx double, fy double",
    )
    kw = dict(mode="enrich", forest_size=30, subsample_size=64, window_size=100,
              anomaly_threshold=0.6, seed=9)
    a = anomaly.isolation_forest(df, ["fx", "fy"], **kw)
    b = anomaly.isolation_forest(df, ["fx", "fy"], **kw)
    sa = sorted((r["id"], round(r[anomaly.SCORE_COL], 12)) for r in a.collect())
    sb = sorted((r["id"], round(r[anomaly.SCORE_COL], 12)) for r in b.collect())
    assert sa == sb


def test_iforest_per_entity_models(spark):
    # service A lives near 0; service B near 100. A point at 100 is NORMAL
    # for B but anomalous for A — only a per-entity model distinguishes.
    rng = np.random.default_rng(4)
    rows = [("A", i, float(v)) for i, v in enumerate(rng.normal(0, 1, 300))]
    rows += [("B", i, float(v)) for i, v in enumerate(rng.normal(100, 1, 300))]
    rows.append(("A", 900, 100.0))  # anomalous for A
    df = spark.createDataFrame(rows, "service string, id int, fv double").repartition(8)
    out = anomaly.isolation_forest(
        df, ["fv"], mode="enrich", forest_size=50, subsample_size=128,
        window_size=400, anomaly_threshold=0.62, group_keys=["service"], seed=5,
    )
    got = out.filter(F.col(f"`{anomaly.FLAG_COL}`")).select("service", "id").collect()
    assert ("A", 900) in {(r["service"], r["id"]) for r in got}
    # B's points at ~100 must NOT be mass-flagged by a global 0-centred model
    b_flagged = [r for r in got if r["service"] == "B"]
    assert len(b_flagged) < 30


def test_log_anomaly_features(spark):
    df = spark.createDataFrame(
        [("svc1", "2024-01-01 00:00:00", 9, "hello"),
         ("svc1", "2024-01-01 00:00:05", 13, "a much longer error body"),
         ("svc2", "2024-01-01 00:00:07", 5, "x")],
        "service string, observed_timestamp string, severity_number int, body string",
    )
    out = anomaly.log_anomaly_features(df, source_col="service").collect()
    by = {(r["service"], r["severity_number"]): r for r in out}
    assert by[("svc1", 13)]["timestamp_gap"] == 5.0
    assert by[("svc1", 9)]["timestamp_gap"] == 0.0  # first-of-source
    assert by[("svc2", 5)]["timestamp_gap"] == 0.0
    assert by[("svc1", 13)]["message_length"] == 24.0


def test_categorical_encode_range(spark):
    df = spark.createDataFrame([("a",), ("b",), ("a",)], "s string")
    vals = [r["e"] for r in df.select(anomaly.categorical_encode(F.col("s")).alias("e")).collect()]
    assert all(0.0 <= v < 1.0 for v in vals)
    assert vals[0] == vals[2] and vals[0] != vals[1]


# --------------------------------------------------------- cardinalityguardian


def _metric_rows():
    """Epoch 0 (ts 0-299): error.type has 3 values. Epoch 1 (ts 300-599):
    error.type explodes to 40 new values; region stays at 2."""
    rows = []
    for i in range(30):
        rows.append((float(i * 5), "http.latency", {"region": f"r{i % 2}", "error.type": f"e{i % 3}"}, 1.0))
    for i in range(40):
        rows.append((300.0 + i * 5, "http.latency", {"region": f"r{i % 2}", "error.type": f"boom-{i}"}, 1.0))
    return rows


SCHEMA = "ts double, metric_name string, attributes map<string,string>, value double"


def test_guardian_strip_and_reaggregate(spark):
    df = spark.createDataFrame(_metric_rows(), SCHEMA)
    out = cardinality_guardian(
        df, ts_col="ts", epoch_seconds=300, max_delta=10,
        never_drop=["region"], mode="strip_and_reaggregate", exact=True,
    ).collect()
    # epoch 0 survives untouched: 6 identities (2 regions x 3 error types)
    e0 = [r for r in out if all(v.startswith("e") for v in [r["attributes"].get("error.type", "e")])
          and "error.type" in r["attributes"]]
    assert len(e0) == 6
    assert sum(r["value"] for r in e0) == 30.0
    # epoch 1: error.type stripped, merged down to the 2 regions
    e1 = [r for r in out if "error.type" not in r["attributes"]]
    assert len(e1) == 2
    assert sum(r["value"] for r in e1) == 40.0
    assert all(r["points_merged"] == 20 for r in e1)
    assert all("region" in r["attributes"] for r in e1)  # protected label kept


def test_guardian_stable_high_cardinality_not_penalized(spark):
    # 40 DISTINCT values in both epochs: delta-based detection must not
    # strip the SECOND epoch (growth ~0, config.go:26-37) even though the
    # absolute cardinality stays far above the limit. The FIRST epoch of a
    # fresh tracker has an empty previous sketch, so its 40 values all
    # count as new and DO get stripped — the reference's cold-start
    # behavior (shouldDrop: prev=0 until the first rotation).
    rows = []
    for i in range(40):
        rows.append((float(i), "m", {"k": f"v{i}"}, 1.0))
    for i in range(40):
        rows.append((300.0 + i, "m", {"k": f"v{i + 5}"}, 1.0))
    df = spark.createDataFrame(rows, SCHEMA)
    out = cardinality_guardian(
        df, ts_col="ts", epoch_seconds=300, max_delta=10, mode="strip_and_reaggregate",
        exact=True,
    ).collect()
    e1 = [r for r in out if r["ts"] >= 300]
    assert len(e1) == 40 and all("k" in r["attributes"] for r in e1)
    e0 = [r for r in out if r["ts"] < 300]
    assert len(e0) == 1 and e0[0]["value"] == 40.0  # cold-start epoch merged


def test_guardian_tag_only(spark):
    df = spark.createDataFrame(_metric_rows(), SCHEMA)
    out = cardinality_guardian(
        df, ts_col="ts", epoch_seconds=300, max_delta=10, mode="tag_only", exact=True,
    ).collect()
    assert len(out) == 70  # no data mutation beyond the tag
    tagged = [r for r in out if r["attributes"].get("otel.metric.overflow") == "true"]
    untagged = [r for r in out if "otel.metric.overflow" not in r["attributes"]]
    assert len(tagged) == 40 and len(untagged) == 30
    assert all(v.startswith("boom") for r in tagged for v in [r["attributes"]["error.type"]])


def test_guardian_overflow_attribute(spark):
    df = spark.createDataFrame(_metric_rows(), SCHEMA)
    out = cardinality_guardian(
        df, ts_col="ts", epoch_seconds=300, max_delta=10, mode="overflow_attribute",
        exact=True,
    ).collect()
    assert len(out) == 70
    e1 = [r for r in out if r["ts"] >= 300]
    assert all(r["attributes"]["error.type"] == OVERFLOW_SENTINEL for r in e1)
    assert all(r["attributes"]["region"].startswith("r") for r in e1)  # untouched
    e0 = [r for r in out if r["ts"] < 300]
    assert all(r["attributes"]["error.type"].startswith("e") for r in e0)


def test_guardian_metric_override(spark):
    # override lets "http.latency" explode up to 100 new values — no strip
    df = spark.createDataFrame(_metric_rows(), SCHEMA)
    out = cardinality_guardian(
        df, ts_col="ts", epoch_seconds=300, max_delta=10,
        metric_overrides={"http.latency": 100}, mode="strip_and_reaggregate", exact=True,
    ).collect()
    assert all("error.type" in r["attributes"] for r in out)


def test_guardian_gauge_merge_keeps_latest(spark):
    rows = [
        (0.0, "g", {"k": "a"}, 1.0),
        (300.0, "g", {"k": "x1", "r": "east"}, 5.0),
        (310.0, "g", {"k": "x2", "r": "east"}, 7.0),
    ]
    # force k to explode in epoch 1 by adding many new values
    rows += [(320.0 + i, "g", {"k": f"n{i}", "r": "west"}, float(i)) for i in range(30)]
    df = spark.createDataFrame(rows, SCHEMA)
    out = cardinality_guardian(
        df, ts_col="ts", epoch_seconds=300, max_delta=5, metric_type="gauge",
        mode="strip_and_reaggregate", exact=True,
    ).collect()
    east = [r for r in out if r["attributes"].get("r") == "east"]
    assert len(east) == 1 and east[0]["value"] == 7.0 and east[0]["ts"] == 310.0
    west = [r for r in out if r["attributes"].get("r") == "west"]
    assert len(west) == 1 and west[0]["ts"] == 320.0 + 29


def test_guardian_approx_mode_agrees_at_small_cardinality(spark):
    # HLL++ error is ~2%; at these cardinalities the approx and exact paths
    # must make identical strip decisions
    df = spark.createDataFrame(_metric_rows(), SCHEMA)
    a = cardinality_guardian(df, ts_col="ts", epoch_seconds=300, max_delta=10,
                             mode="tag_only", exact=False).collect()
    b = cardinality_guardian(df, ts_col="ts", epoch_seconds=300, max_delta=10,
                             mode="tag_only", exact=True).collect()
    key = lambda r: (r["ts"], tuple(sorted(r["attributes"].items())))
    assert sorted(map(key, a)) == sorted(map(key, b))


# ------------------------------------------------ YAML translator wiring


def test_guardian_in_collector_config(spark):
    from opentelemetry_collector_contrib_spark.plans.collector_config import (
        load_collector_config,
    )

    mf = spark.createDataFrame(_metric_rows(), SCHEMA)
    cfg = {
        "receivers": {"inmem": {}},
        "processors": {
            "cardinality_guardian": {
                "ts_field": "ts",
                "epoch_duration_seconds": 300,
                "max_cardinality_delta_per_epoch": 10,
                "never_drop_labels": ["region"],
                "enforcement_mode": "strip_and_reaggregate",
            }
        },
        "exporters": {},
        "service": {
            "pipelines": {
                "metrics/in": {
                    "receivers": ["inmem"],
                    "processors": ["cardinality_guardian"],
                    "exporters": [],
                }
            }
        },
    }
    t = load_collector_config(spark, cfg, receiver_frames={"inmem": mf})
    out = t.frames["metrics/in"].collect()
    stripped = [r for r in out if "error.type" not in r["attributes"]]
    assert len(stripped) == 2 and sum(r["value"] for r in stripped) == 40.0


def test_isolationforest_in_collector_config(spark):
    from opentelemetry_collector_contrib_spark.plans.collector_config import (
        load_collector_config,
    )

    X = _blob(seed=11)
    df = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(X)],
        "id int, fx double, fy double",
    )
    cfg = {
        "receivers": {"inmem": {}},
        "processors": {
            "isolationforest": {
                "feature_fields": ["fx", "fy"],
                "mode": "enrich",
                "forest_size": 60,
                "subsample_size": 128,
                "window_size": 400,
                "anomaly_threshold": 0.62,
            }
        },
        "exporters": {},
        "service": {
            "pipelines": {
                "logs/in": {
                    "receivers": ["inmem"],
                    "processors": ["isolationforest"],
                    "exporters": [],
                }
            }
        },
    }
    t = load_collector_config(spark, cfg, receiver_frames={"inmem": df})
    out = t.frames["logs/in"]
    assert "anomaly.isolation_score" in out.columns
    flagged = {r["id"] for r in out.filter(F.col("`anomaly.is_anomaly`")).collect()}
    assert set(range(4)) <= flagged
