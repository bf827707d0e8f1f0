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


class TestSignalToMetrics:
    """connector/signaltometricsconnector (logs signal): per-batch OTTL
    value/conditions → sum/gauge/histogram aggregations keyed by attribute
    tuples (config/config.go:232-311, aggregator/*.go)."""

    @pytest.fixture(scope="class")
    def logs(self, spark):
        return spark.createDataFrame(
            [
                (1, "GET", 10, {"svc": "a"}),
                (2, "GET", 30, {"svc": "a"}),
                (3, "POST", 100, {"svc": "b"}),
                (4, "POST", 7, {}),  # missing svc attribute
            ],
            "event_id int, method string, latency int, attributes map<string,string>",
        )

    def test_sum_with_conditions_and_default(self, spark, logs):
        from opentelemetry_collector_contrib_spark.operators.connectors import (
            SignalMetricDef,
            signal_to_metrics,
        )

        out = signal_to_metrics(
            logs,
            [
                SignalMetricDef(
                    name="lat.sum",
                    value="latency",
                    metric_type="sum",
                    conditions=['method == "GET"', 'method == "POST"'],
                    attributes=[{"key": "svc", "default_value": "unknown"}],
                )
            ],
        )["lat.sum"]
        got = {r.svc: r.value for r in out.collect()}
        assert got == {"a": 40, "b": 100, "unknown": 7}

    def test_missing_attribute_drops_record(self, spark, logs):
        from opentelemetry_collector_contrib_spark.operators.connectors import (
            SignalMetricDef,
            signal_to_metrics,
        )

        out = signal_to_metrics(
            logs,
            [
                SignalMetricDef(
                    name="n", value="1", metric_type="sum",
                    attributes=[{"key": "svc"}],  # no default, not optional
                )
            ],
        )["n"]
        got = {r.svc: r.value for r in out.collect()}
        assert got == {"a": 2, "b": 1}  # event 4 dropped

    def test_gauge_and_histogram(self, spark, logs):
        from opentelemetry_collector_contrib_spark.operators.connectors import (
            SignalMetricDef,
            signal_to_metrics,
        )

        out = signal_to_metrics(
            logs,
            [
                SignalMetricDef(
                    name="lat.gauge", value="latency", metric_type="gauge",
                    attributes=[{"key": "svc", "default_value": "unknown"}],
                ),
                SignalMetricDef(
                    name="lat.hist", value="latency", metric_type="histogram",
                    buckets=[10, 50],
                ),
            ],
            order_col="event_id",
        )
        g = {r.svc: r.value for r in out["lat.gauge"].collect()}
        # gauge = last-written per tuple (max event_id order)
        assert g == {"a": 30, "b": 100, "unknown": 7}
        h = out["lat.hist"].collect()[0]
        assert h["count"] == 4 and h["sum"] == 147
        assert h["le_10"] == 2 and h["le_50"] == 1 and h["le_inf"] == 1

    def test_ottl_value_expression(self, spark, logs):
        from opentelemetry_collector_contrib_spark.operators.connectors import (
            SignalMetricDef,
            signal_to_metrics,
        )

        out = signal_to_metrics(
            logs,
            [SignalMetricDef(name="d", value="Double(latency) * 2.0", metric_type="sum")],
        )["d"]
        assert out.collect()[0].value == 294.0


class TestServiceGraphAndFriends:
    def test_service_graph_edges(self, spark):
        from opentelemetry_collector_contrib_spark.operators.connectors import (
            service_graph,
        )

        spans = spark.createDataFrame(
            [
                # trace t1: frontend -CLIENT-> backend (server span child)
                ("t1", "s1", None, "CLIENT", "frontend", 30, False),
                ("t1", "s2", "s1", "SERVER", "backend", 20, False),
                # trace t1: backend -CLIENT-> db, db side failed
                ("t1", "s3", "s2", "CLIENT", "backend", 15, False),
                ("t1", "s4", "s3", "SERVER", "db", 12, True),
                # trace t2: frontend -> backend again
                ("t2", "s5", None, "CLIENT", "frontend", 300, False),
                ("t2", "s6", "s5", "SERVER", "backend", 250, False),
                # unmatched client (no server child) produces no edge
                ("t2", "s7", "s6", "CLIENT", "backend", 5, False),
            ],
            "trace_id string, span_id string, parent_span_id string, "
            "span_kind string, service string, duration int, failed boolean",
        )
        out = {
            (r.client_service, r.server_service): r
            for r in service_graph(spans, failed_col="failed", buckets=[50, 100]).collect()
        }
        fe_be = out[("frontend", "backend")]
        assert fe_be.req_total == 2 and fe_be.req_failed_total == 0
        assert fe_be.client_duration_sum == 330 and fe_be.server_duration_sum == 270
        assert fe_be.server_le_50 == 1 and fe_be.server_le_inf == 1
        be_db = out[("backend", "db")]
        assert be_db.req_total == 1 and be_db.req_failed_total == 1
        assert len(out) == 2  # unmatched client never forms an edge

    def test_round_robin(self, spark):
        from opentelemetry_collector_contrib_spark.operators.connectors import (
            round_robin,
        )

        df = spark.createDataFrame([(i,) for i in range(10)], "i int")
        out = round_robin(df, 3, "i")
        got = {r.i: r.endpoint for r in out.collect()}
        assert got == {i: i % 3 for i in range(10)}

    def test_round_robin_bucketed_matches_global(self, spark):
        """order_bucket_span mode: same assignment as the global window
        (unique order col), even modulo distribution, and NO single-
        partition exchange over the data in the plan."""
        from opentelemetry_collector_contrib_spark.operators.connectors import (
            round_robin,
        )

        df = spark.createDataFrame([(i,) for i in range(500)], "i int").repartition(8)
        out = round_robin(df, 7, "i", order_bucket_span=50)
        got = {r.i: r.endpoint for r in out.collect()}
        assert got == {i: i % 7 for i in range(500)}
        counts = sorted(
            r[1] for r in out.groupBy("endpoint").count().collect()
        )
        assert max(counts) - min(counts) <= 1  # even spread
        plan = out._jdf.queryExecution().executedPlan().toString()
        # the data-path window must be keyed by the bucket column (hash
        # exchange), not a global orderBy (single-partition exchange); the
        # per-bucket offsets frame is broadcast
        assert "windowspecdefinition(_rr_bkt" in plan
        assert "BroadcastExchange" in plan

    def test_failover_write(self, spark, tmp_path):
        from opentelemetry_collector_contrib_spark.sources.sinks import failover_write

        df = spark.createDataFrame([(1,)], "v int")
        calls = []

        def bad(d):
            calls.append("bad")
            raise RuntimeError("sink down")

        def good(d):
            calls.append("good")
            d.write.mode("overwrite").parquet(str(tmp_path / "ok"))

        assert failover_write(df, [bad, good]) == 1
        assert calls == ["bad", "good"]
        assert spark.read.parquet(str(tmp_path / "ok")).count() == 1
        import pytest as _pytest

        with _pytest.raises(RuntimeError):
            failover_write(df, [bad, bad])


class TestExceptionsConnector:
    def test_exception_event_counts(self, spark):
        from opentelemetry_collector_contrib_spark.operators.connectors import (
            exceptions_connector,
        )

        spans = spark.createDataFrame(
            [
                ("svc-a", "GET /x", "SERVER", "ERROR", "t1",
                 [{"name": "exception",
                   "attributes": {"exception.type": "IOError", "exception.message": "m"}},
                  {"name": "other", "attributes": {}}]),
                ("svc-a", "GET /x", "SERVER", "ERROR", "t2",
                 [{"name": "exception",
                   "attributes": {"exception.type": "IOError", "exception.message": "n"}}]),
                ("svc-b", "POST /y", "CLIENT", "OK", "t3",
                 [{"name": "exception",
                   "attributes": {"exception.type": "ValueError", "exception.message": "v"}}]),
                # no events at all
                ("svc-b", "POST /y", "CLIENT", "OK", "t4", []),
                # no service name -> skipped entirely (reference semantics)
                (None, "GET /z", "SERVER", "ERROR", "t5",
                 [{"name": "exception", "attributes": {"exception.type": "X"}}]),
            ],
            "service string, span_name string, span_kind string, status_code string, "
            "trace_id string, events array<struct<name:string, attributes:map<string,string>>>",
        )
        out = {
            (r.service_name, r.span_name, r.exception_type): r
            for r in exceptions_connector(
                spans, dimensions=["exception.type"], exemplars=True
            ).collect()
        }
        a = out[("svc-a", "GET /x", "IOError")]
        assert a.exceptions == 2 and a.exemplar_trace == "t2"
        b = out[("svc-b", "POST /y", "ValueError")]
        assert b.exceptions == 1
        assert len(out) == 2  # no-service and no-event spans contribute nothing


    def test_span_attr_fallback_for_dimensions(self, spark):
        """buildDimensionKVs falls back to span attributes when the event
        lacks the key (connector_metrics.go:75-108)."""
        from opentelemetry_collector_contrib_spark.operators.connectors import (
            exceptions_connector,
        )

        spans = spark.createDataFrame(
            [
                ("svc", "GET /x", "SERVER", "ERROR", "t1", {"http.route": "/x"},
                 [{"name": "exception", "attributes": {"exception.type": "E"}}]),
                # event carries the dim -> event value wins over the span's
                ("svc", "GET /x", "SERVER", "ERROR", "t2", {"http.route": "/span"},
                 [{"name": "exception",
                   "attributes": {"exception.type": "E", "http.route": "/event"}}]),
            ],
            "service string, span_name string, span_kind string, status_code string, "
            "trace_id string, span_attributes map<string,string>, "
            "events array<struct<name:string, attributes:map<string,string>>>",
        )
        out = {
            r.http_route: r.exceptions
            for r in exceptions_connector(
                spans, dimensions=["http.route"], span_attrs_col="span_attributes"
            ).collect()
        }
        assert out == {"/x": 1, "/event": 1}


class TestExponentialHistogramZeros:
    def test_zero_values_land_in_zero_bucket(self, spark):
        """OTel exponential histograms account value==0 in the zero-count
        bucket (bucket_idx NULL here) instead of dropping it; negatives are
        dropped (positive-bucket-only subset of the model)."""
        from opentelemetry_collector_contrib_spark.operators.connectors import (
            SignalMetricDef,
            signal_to_metrics,
        )

        logs = spark.createDataFrame(
            [(1, 0), (2, 0), (3, 8), (4, -5)],
            "event_id int, latency int",
        )
        out = signal_to_metrics(
            logs,
            [SignalMetricDef(name="h", value="latency",
                             metric_type="exponential_histogram", scale=0)],
        )["h"]
        got = {r.bucket_idx: r.bucket_count for r in out.collect()}
        assert got == {None: 2, 2: 1}  # two zeros; 8 -> bucket ceil(log2(8))-1=2


class TestDuplicateKeyTolerance:
    def test_otlpjson_duplicate_attribute_keys_keep_last(self, spark):
        """A payload with a repeated attribute key must not abort the job
        (Spark default mapKeyDedupPolicy=EXCEPTION): pcommon maps upsert, so
        the last value wins (reference logs.go:43-79 tolerates such
        payloads)."""
        from opentelemetry_collector_contrib_spark.operators.connectors import (
            otlpjson_logs_connector,
        )

        payload = (
            '{"resourceLogs": [{"resource": {"attributes": ['
            '{"key": "k", "value": {"stringValue": "first"}},'
            '{"key": "k", "value": {"stringValue": "second"}}]},'
            '"scopeLogs": [{"logRecords": [{"body": {"stringValue": "m"},'
            '"attributes": [{"key": "a", "value": {"stringValue": "1"}},'
            '{"key": "a", "value": {"stringValue": "2"}}]}]}]}]}'
        )
        df = spark.createDataFrame(
            [({}, {}, payload, None, None)],
            "resource map<string,string>, attributes map<string,string>, "
            "body string, severity_text string, time_unix_nano long",
        )
        r = otlpjson_logs_connector(df).first()
        assert dict(r.resource) == {"k": "second"}
        assert dict(r.attributes) == {"a": "2"}
