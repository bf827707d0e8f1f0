"""metricstransform / metricsgeneration / loadbalancing / fan-in units."""

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators import connectors, metrics


@pytest.fixture(scope="module")
def points(spark):
    rows = [
        ("cpu.usage", "host1", 10.0, 5.0),
        ("cpu.usage", "host2", 30.0, 10.0),
        ("mem.usage", "host1", 100.0, 50.0),
    ]
    return spark.createDataFrame(rows, "metric_name string, host string, value double, cap double")


class TestMetricsTransform:
    def test_rename(self, points):
        out = metrics.metrics_transform(points, rename={"cpu.usage": "system.cpu"})
        names = {r.metric_name for r in out.collect()}
        assert names == {"system.cpu", "mem.usage"}

    def test_scale(self, points):
        out = metrics.metrics_transform(points, scale=0.1)
        got = {(r.metric_name, r.host): r.value for r in out.collect()}
        assert got[("cpu.usage", "host1")] == pytest.approx(1.0)

    def test_aggregate_across(self, points):
        out = metrics.metrics_transform(points, aggregate_across=[], agg_type="sum")
        got = {r.metric_name: (r.value, r.points_merged) for r in out.collect()}
        assert got["cpu.usage"] == (40.0, 2)
        assert got["mem.usage"] == (100.0, 1)

    def test_aggregate_mean_keep_label(self, points):
        out = metrics.metrics_transform(points, aggregate_across=["host"], agg_type="mean")
        got = {(r.metric_name, r.host): r.value for r in out.collect()}
        assert got[("cpu.usage", "host1")] == 10.0


class TestMetricsGeneration:
    def test_divide_and_percent(self, points):
        out = metrics.metrics_generation(points, "util", "value", "cap", "divide")
        assert out.filter(F.col("host") == "host2").first().util == pytest.approx(3.0)
        out = metrics.metrics_generation(points, "pct", "value", "cap", "percent")
        assert out.filter(F.col("host") == "host2").first().pct == pytest.approx(300.0)

    def test_divide_by_zero_is_null(self, spark):
        df = spark.createDataFrame([(1.0, 0.0)], "a double, b double")
        out = metrics.metrics_generation(df, "r", "a", "b", "divide")
        assert out.first().r is None


class TestLoadBalancing:
    def test_deterministic_and_bounded(self, points):
        a = connectors.load_balancing_bucket(points, "host", 3).collect()
        b = connectors.load_balancing_bucket(points, "host", 3).collect()
        assert [r.endpoint for r in a] == [r.endpoint for r in b]
        assert all(0 <= r.endpoint < 3 for r in a)

    def test_same_key_same_endpoint(self, spark):
        df = spark.createDataFrame([("k1",), ("k1",), ("k2",)], "k string")
        out = connectors.load_balancing_bucket(df, "k", 16).collect()
        assert out[0].endpoint == out[1].endpoint


class TestFanIn:
    def test_union_by_name_missing_cols(self, spark):
        a = spark.createDataFrame([(1, "x")], "id int, a string")
        b = spark.createDataFrame([(2, "y")], "id int, b string")
        out = connectors.fan_in(a, b)
        assert out.count() == 2
        assert set(out.columns) == {"id", "a", "b"}
