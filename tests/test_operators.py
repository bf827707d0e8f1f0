"""Unit tests for transformer/processor/enrich operators not covered by the
catalog queries (table-driven, mirroring the reference's operatortest)."""

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators import (
    enrich,
    metrics,
    parsers,
    processors,
    transformers,
)


@pytest.fixture(scope="module")
def tiny(spark):
    return spark.createDataFrame(
        [
            ("r1", "ERROR", "auth", {"a": "1", "secret_key": "tok-abc", "b": "x"}, "10.0.1.5", ["u", "v"]),
            ("r2", "info", "db", {"a": "2", "b": "y"}, "10.0.2.9", ["w"]),
        ],
        "id string, sev string, comp string, attributes map<string,string>, ip string, items array<string>",
    )


class TestTransformers:
    def test_add_move_copy_remove_retain(self, tiny):
        df = transformers.add(tiny, "env", "prod")
        df = transformers.copy(df, "comp", "component_copy")
        df = transformers.move(df, "comp", "component")
        df = transformers.remove(df, "ip")
        df = transformers.retain(df, "id", "env", "component", "component_copy")
        assert df.columns == ["id", "env", "component", "component_copy"]
        r = df.filter(F.col("id") == "r1").first()
        assert r.env == "prod" and r.component == "auth" and r.component_copy == "auth"

    def test_flatten_struct(self, spark):
        df = spark.createDataFrame([(1, {"x": "a", "y": "b"})], "id int, s struct<x:string,y:string>")
        out = transformers.flatten(df, "s")
        assert set(out.columns) == {"id", "x", "y"}

    def test_assign_keys(self, tiny):
        out = transformers.assign_keys(tiny.filter("id='r1'"), "items", ["k1", "k2"], "m")
        assert out.first().m == {"k1": "u", "k2": "v"}

    def test_unquote(self, spark):
        df = spark.createDataFrame([('"hi"',), ("'yo'",), ("bare",)], "v string")
        got = [r.v for r in transformers.unquote(df, "v").collect()]
        assert got == ["hi", "yo", "bare"]

    def test_filter_drop(self, tiny):
        out = transformers.filter_drop(tiny, F.col("sev") == "ERROR")
        assert [r.id for r in out.collect()] == ["r2"]

    def test_router_drops_unmatched_without_default(self, tiny):
        out = transformers.router(tiny, [("hot", F.col("sev") == "ERROR")], default=None)
        assert [r.id for r in out.collect()] == ["r1"]

    def test_router_first_match_wins(self, tiny):
        out = transformers.router(
            tiny,
            [("first", F.col("sev") == "ERROR"), ("second", F.col("comp") == "auth")],
        )
        assert out.filter("id='r1'").first().route_id == "first"


class TestParsers:
    def test_json_array_parser(self, spark):
        """parser/jsonarray/parser.go:29 — array line → slice; header mode
        zips keys like assign_keys."""
        df = spark.createDataFrame([('["1","debug","ok"]',), ("not json",)], "body string")
        out = parsers.json_array_parser(df, "body", out="arr")
        rows = out.orderBy("body").collect()
        assert rows[0].arr == ["1", "debug", "ok"] and rows[0]._parse_error is False
        assert rows[1].arr is None and rows[1]._parse_error is True
        hdr = parsers.json_array_parser(
            df.limit(1), "body", out="m", header=["id", "sev", "msg"]
        ).first()
        assert hdr.m == {"id": "1", "sev": "debug", "msg": "ok"}

    def test_csv_header_attribute(self, spark):
        """csv/config.go:41: header carried in a per-row attribute — dynamic
        headers yield a map keyed by that row's header tokens."""
        df = spark.createDataFrame(
            [("1,deb,ok", "id,sev,msg"), ("2,y", "a,b"), ("3,too,many,cols", "k1,k2")],
            "body string, hdr string",
        )
        out = parsers.csv_parser(df, parse_from="body", header_attribute="hdr", out="m")
        rows = {r.body: r for r in out.collect()}
        assert rows["1,deb,ok"].m == {"id": "1", "sev": "deb", "msg": "ok"}
        assert rows["2,y"].m == {"a": "2", "b": "y"}
        assert rows["3,too,many,cols"]._parse_error is True  # field/header mismatch
        with pytest.raises(ValueError):
            parsers.csv_parser(df, header=["a"], header_attribute="hdr")

    def test_uri_query_params_map(self, spark):
        """parseutils.ParseURI: the query string also parses into a map."""
        df = spark.createDataFrame(
            [("https://h/p?uid=7&x=1",), ("https://h/p",)], "url string"
        )
        out = {r.url: r for r in parsers.uri_parser(df, "url").collect()}
        assert out["https://h/p?uid=7&x=1"].uri_query_params == {"uid": "7", "x": "1"}
        assert out["https://h/p"].uri_query_params is None

    def test_scope_name_parser(self, tiny):
        """parser/scope/parser.go:24 — copy field → scope name."""
        out = parsers.scope_name_parser(tiny, "comp")
        assert [r.scope_name for r in out.orderBy("id").collect()] == ["auth", "db"]


class TestProcessors:
    def test_attributes_actions_insert_update_upsert_delete(self, tiny):
        df = tiny.select("id", "comp")
        df = processors.attributes_actions(
            df,
            [
                {"action": "insert", "key": "new", "value": "n1"},
                {"action": "insert", "key": "comp", "value": "IGNORED"},  # present → no-op
                {"action": "update", "key": "comp", "value": "updated"},
                {"action": "upsert", "key": "up", "value": "u1"},
                {"action": "delete", "key": "id"},
            ],
        )
        r = df.first()
        assert r.new == "n1" and r.comp == "updated" and r.up == "u1"
        assert "id" not in df.columns

    def test_attributes_extract_and_convert(self, spark):
        df = spark.createDataFrame([("user=alice code=42",)], "body string")
        df = processors.attributes_actions(
            df, [{"action": "extract", "key": "body", "pattern": r"user=(?P<user>\w+) code=(?P<code>\d+)"}]
        )
        df = processors.attributes_actions(df, [{"action": "convert", "key": "code", "converted_type": "int"}])
        r = df.first()
        assert r.user == "alice" and r.code == 42

    def test_redaction_allow_and_mask(self, tiny):
        out = processors.redaction(
            tiny, allowed_keys=["a", "secret_key"], blocked_values=[r"^tok-"]
        )
        r1 = out.filter("id='r1'").first().attributes
        # maskValue masks the MATCHED portion (processor.go:345-368): the
        # "tok-" prefix matched, the rest of the value survives
        assert r1 == {"a": "1", "secret_key": "****abc"}
        r2 = out.filter("id='r2'").first().attributes
        assert r2 == {"a": "2"}

    def test_sampler_deterministic_and_proportional(self, spark):
        df = spark.range(20000).withColumnRenamed("id", "doc_id")
        a = {r.doc_id for r in processors.probabilistic_sampler(df, 25.0, "doc_id").collect()}
        b = {r.doc_id for r in processors.probabilistic_sampler(df, 25.0, "doc_id").collect()}
        assert a == b  # consistent decisions (logsprocessor.go:39-117)
        assert 0.23 < len(a) / 20000 < 0.27
        # sampled set at 10% is a subset of 25% (consistent thresholding)
        c = {r.doc_id for r in processors.probabilistic_sampler(df, 10.0, "doc_id").collect()}
        assert c <= a

    def test_sampler_modes_compose(self, spark):
        """sampler_mode.go: equalizing raises to a fixed threshold;
        proportional scales the incoming probability."""
        from pyspark.sql import functions as F

        df = spark.range(40000).withColumnRenamed("id", "doc_id")
        # stage 1: 50% hash_seed writes sampling_threshold
        s1 = processors.probabilistic_sampler(df, 50.0, "doc_id")
        assert 0.48 < s1.count() / 40000 < 0.52
        # equalizing to 50% after a 50% stage is a no-op (threshold equal)
        eq = processors.probabilistic_sampler(
            s1, 50.0, "doc_id", mode="equalizing", threshold_col="sampling_threshold"
        )
        assert eq.count() == s1.count()
        # proportional 50% of the 50% ⇒ ~25% of the original
        pr = processors.probabilistic_sampler(
            s1, 50.0, "doc_id", mode="proportional", threshold_col="sampling_threshold"
        )
        assert 0.22 < pr.count() / 40000 < 0.28
        # thresholds only ever rise (updateThreshold contract)
        bad = pr.filter(F.col("sampling_threshold") < F.lit(int(0.5 * (1 << 56)))).count()
        assert bad == 0

    def test_redaction_summary_attrs(self, spark):
        """processor.go:416-437 + :584-589: redaction.{redacted,masked,
        allowed,ignored} diagnostic attributes at summary=debug."""
        df = spark.createDataFrame(
            [(1, {"keep": "x", "drop1": "y", "drop2": "z", "tok": "secret-1",
                  "ign": "w", "ok": "public-1"})],
            "id int, attributes map<string,string>",
        )
        out = processors.redaction(
            df,
            allowed_keys=["keep", "tok", "ok"],
            blocked_values=[r"secret-\d+"],
            ignored_keys=["ign"],
            allowed_values=[r"public-.*"],
            summary="debug",
        ).first()["attributes"]
        assert out["keep"] == "x" and "drop1" not in out and "drop2" not in out
        assert out["tok"] == "****" and out["ok"] == "public-1" and out["ign"] == "w"
        assert out["redaction.redacted.keys"] == "drop1,drop2"
        assert out["redaction.redacted.count"] == "2"
        assert out["redaction.masked.keys"] == "tok"
        assert out["redaction.masked.count"] == "1"
        assert out["redaction.allowed.keys"] == "ok"
        assert out["redaction.ignored.count"] == "1"
        assert "redaction.ignored.keys" not in out
        # info level: counts only
        info = processors.redaction(
            df, allowed_keys=["keep", "tok", "ok"], blocked_values=[r"secret-\d+"],
            ignored_keys=["ign"], allowed_values=[r"public-.*"], summary="info",
        ).first()["attributes"]
        assert "redaction.redacted.keys" not in info
        assert info["redaction.redacted.count"] == "2"

    def test_redaction_masks_matched_substring(self, spark):
        """maskValue masks the MATCHED portion, not the whole value."""
        df = spark.createDataFrame(
            [(1, {"msg": "card 4111-2222 used"})], "id int, attributes map<string,string>"
        )
        out = processors.redaction(df, blocked_values=[r"\d{4}-\d{4}"]).first()["attributes"]
        assert out["msg"] == "card **** used"

    def test_unroll(self, tiny):
        out = processors.unroll(tiny.select("id", "items"), "items")
        assert out.count() == 3


class TestEnrich:
    def test_set_if_absent_semantics(self, spark):
        facts = spark.createDataFrame(
            [("a", "keep-me"), ("b", None)], "source string, k8s_pod_name string"
        )
        dim = spark.createDataFrame(
            [("a", "pod-a"), ("b", "pod-b")], "source string, k8s_pod_name string"
        )
        out = enrich.broadcast_lookup(facts, dim, "source")
        got = {r.source: r.k8s_pod_name for r in out.collect()}
        # existing value NOT overwritten (processor.go:287-291)
        assert got == {"a": "keep-me", "b": "pod-b"}

    def test_lookup_miss_keeps_nulls(self, spark):
        facts = spark.createDataFrame([("zz",)], "source string")
        dim = spark.createDataFrame([("a", "x")], "source string, team string")
        out = enrich.broadcast_lookup(facts, dim, "source")
        assert out.first().team is None

    def test_resource_detection_override(self, spark):
        df = spark.createDataFrame([("x", None), ("y", "keep")], "id string, cloud string")
        out = enrich.resource_detection(df, {"cloud": "aws", "region": "us-east-1"})
        got = {r.id: (r.cloud, r.region) for r in out.collect()}
        assert got == {"x": ("aws", "us-east-1"), "y": ("keep", "us-east-1")}
        out2 = enrich.resource_detection(df, {"cloud": "aws"}, override=True)
        assert {r.cloud for r in out2.collect()} == {"aws"}

    def test_geoip_range_lookup(self, spark):
        facts = spark.createDataFrame([("10.0.1.5",), ("10.0.9.1",)], "ip string")
        # 10.0.1.0/24 = [167772416, 167772671]
        ranges = spark.createDataFrame(
            [(167772416, 167772671, "us", "iad")], "ip_lo long, ip_hi long, country string, dc string"
        )
        out = enrich.geoip_range_lookup(facts, "ip", ranges)
        got = {r.ip: r.country for r in out.collect()}
        assert got == {"10.0.1.5": "us", "10.0.9.1": None}

    def test_plan_uses_broadcast_join(self, spark):
        facts = spark.range(1000).withColumn(
            "source", F.when(F.col("id") % 2 == 0, "a").otherwise("b")
        )
        dim = spark.createDataFrame([("a", "x"), ("b", "y")], "source string, team string")
        out = enrich.broadcast_lookup(facts, dim, "source")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan


class TestMetrics:
    def test_metric_start_time_reset_epochs(self, spark):
        """metricstarttimeprocessor true_reset_point: start re-anchors at a
        counter reset; subtract_initial_point also rebases values."""
        rows = [
            ("s1", 1, 10.0), ("s1", 2, 15.0), ("s1", 3, 5.0), ("s1", 4, 9.0),
            ("s2", 1, 3.0),
        ]
        df = spark.createDataFrame(rows, "series string, ts long, value double")
        out = {
            (r.series, r.ts): r.start_timestamp
            for r in metrics.metric_start_time(df, ["series"], "ts", "value").collect()
        }
        assert out[("s1", 1)] == 1 and out[("s1", 2)] == 1
        assert out[("s1", 3)] == 3 and out[("s1", 4)] == 3  # reset at ts=3
        assert out[("s2", 1)] == 1
        sub = {
            (r.series, r.ts): r.value
            for r in metrics.metric_start_time(
                df, ["series"], "ts", "value", strategy="subtract_initial_point"
            ).collect()
        }
        assert sub[("s1", 1)] == 0.0 and sub[("s1", 2)] == 5.0
        assert sub[("s1", 3)] == 0.0 and sub[("s1", 4)] == 4.0

    def test_delta_roundtrip(self, spark):
        rows = [("s1", i, float(v)) for i, v in enumerate([10, 13, 13, 20])]
        rows += [("s2", i, float(v)) for i, v in enumerate([5, 6])]
        df = spark.createDataFrame(rows, "series string, ts long, value double")
        d = metrics.cumulative_to_delta(df, ["series"], "ts", "value")
        got = {(r.series, r.ts): r.delta for r in d.collect()}
        assert got == {("s1", 1): 3.0, ("s1", 2): 0.0, ("s1", 3): 7.0, ("s2", 1): 1.0}
        # delta→cumulative over the deltas rebuilds the original minus base
        c = metrics.delta_to_cumulative(d.select("series", "ts", F.col("delta").alias("value")), ["series"], "ts", "value")
        s1 = {r.ts: r.cumulative for r in c.filter("series='s1'").collect()}
        assert s1 == {1: 3.0, 2: 3.0, 3: 10.0}

    def test_delta_to_rate(self, spark):
        import datetime

        t0 = datetime.datetime(2026, 1, 1)
        rows = [("s", t0, 0.0), ("s", t0 + datetime.timedelta(seconds=10), 50.0)]
        df = spark.createDataFrame(rows, "series string, ts timestamp, value double")
        out = metrics.delta_to_rate(df, ["series"], "ts", "value").collect()
        assert len(out) == 1 and abs(out[0].rate_per_s - 5.0) < 1e-9


class TestKafkaPlumbing:
    def test_kafka_payload_shape(self, tiny):
        """kafkaexporter message shaping: binary key/value, JSON value body."""
        import json

        from opentelemetry_collector_contrib_spark.sources import sinks

        out = sinks.kafka_payload(tiny.select("id", "sev", "comp"), key_col="id")
        assert out.columns == ["key", "value"]
        assert dict(out.dtypes) == {"key": "binary", "value": "binary"}
        r = out.orderBy("key").first()
        assert bytes(r.key) == b"r1"
        assert json.loads(bytes(r.value)) == {"sev": "ERROR", "comp": "auth"}

    def test_kafka_exporter_gated_without_broker(self, tiny):
        import pytest as _pytest

        from opentelemetry_collector_contrib_spark.sources import sinks

        with _pytest.raises(RuntimeError, match="kafka sink needs"):
            sinks.kafka_exporter(tiny.select("id"), "localhost:9", "t")
