"""Extended OTTL editors/converters + syslog parser + sink tests."""

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.functions.ottl import transform_processor
from opentelemetry_collector_contrib_spark.operators.parsers import syslog_parser


@pytest.fixture(scope="module")
def mdf(spark):
    return spark.createDataFrame(
        [({"a": "1", "b": "2"}, {"b": "20", "c": "30"}, "10.1.2.3", "http://h:8080/p/q?x=1", "snake case-Value")],
        "m map<string,string>, src map<string,string>, ip string, url string, txt string",
    )


class TestExtendedEditors:
    def test_merge_maps_upsert(self, mdf):
        out = transform_processor(mdf, ["merge_maps(m, src, \"upsert\")"])
        assert out.first().m == {"a": "1", "b": "20", "c": "30"}

    def test_merge_maps_insert(self, mdf):
        out = transform_processor(mdf, ["merge_maps(m, src, \"insert\")"])
        assert out.first().m == {"a": "1", "b": "2", "c": "30"}

    def test_merge_maps_update(self, mdf):
        out = transform_processor(mdf, ["merge_maps(m, src, \"update\")"])
        assert out.first().m == {"a": "1", "b": "20"}

    def test_stringify_all(self, spark):
        df = spark.createDataFrame([({"x": 1, "y": 2},)], "m map<string,int>")
        out = transform_processor(df, ["stringify_all(m)"])
        assert out.first().m == {"x": "1", "y": "2"}

    def test_flatten_struct(self, spark):
        df = spark.createDataFrame([(1, ("a", "b"))], "id int, s struct<x:string,y:string>")
        out = transform_processor(df, ["flatten(s)"])
        assert set(out.columns) == {"id", "x", "y"}


class TestExtendedConverters:
    def test_extract_patterns(self, spark):
        df = spark.createDataFrame([("user=bob code=7",)], "body string")
        out = transform_processor(
            df, ['set(m, ExtractPatterns(body, "user=(?P<user>\\\\w+) code=(?P<code>\\\\d+)"))']
        )
        assert out.first().m == {"user": "bob", "code": "7"}

    def test_extract_grok_patterns(self, spark):
        df = spark.createDataFrame([("10.1.2.3 GET /x 200",)], "body string")
        out = transform_processor(
            df, ['set(m, ExtractGrokPatterns(body, "%{IPV4:ip} %{WORD:verb} %{NOTSPACE:path} %{INT:status}"))']
        )
        assert out.first().m == {"ip": "10.1.2.3", "verb": "GET", "path": "/x", "status": "200"}

    def test_parse_json_map(self, spark):
        df = spark.createDataFrame([('{"k":"v","n":"2"}',)], "body string")
        out = transform_processor(df, ["set(m, ParseJSON(body))"])
        assert out.first().m == {"k": "v", "n": "2"}

    def test_url_parts(self, mdf):
        out = transform_processor(mdf, ["set(u, URL(url))"])
        u = out.first().u
        assert (u.scheme, u.host, u.path, u.query) == ("http", "h", "/p/q", "x=1")

    @pytest.mark.parametrize(
        "cidr,expected", [("10.1.0.0/16", True), ("10.2.0.0/16", False), ("0.0.0.0/0", True)]
    )
    def test_is_in_cidr(self, mdf, cidr, expected):
        out = transform_processor(mdf, [f'set(hit, IsInCidr(ip, "{cidr}"))'])
        assert out.first().hit is expected

    def test_case_conversions(self, spark):
        df = spark.createDataFrame([("myVariable Name",)], "t string")
        out = transform_processor(
            df,
            ['set(s, ToSnakeCase(t))', 'set(c, ToCamelCase(t))', 'set(l, ConvertCase(t, "lower"))'],
        )
        r = out.first()
        assert r.s == "my_variable_name" and r.c == "MyVariableName" and r.l == "myvariable name"


class TestSyslogParser:
    def test_rfc5424(self, spark):
        line = '<165>1 2026-01-02T03:04:05.123456Z host01 app 1234 ID47 - hello world'
        df = spark.createDataFrame([(line,), ("garbage",)], "body string")
        out = syslog_parser(df, protocol="rfc5424").collect()
        r = out[0]
        assert r.hostname == "host01" and r.appname == "app" and r.message == "hello world"
        assert r.severity_number == 10 and r.facility == 20  # 165 = 20*8+5 notice
        assert r.timestamp is not None and not r._parse_error
        assert out[1]._parse_error

    def test_rfc5424_structured_data(self, spark):
        r"""SD elements parse into the nested map (parser.go:115 via
        go-syslog): multi-element, escaped \" and \] in values, empty param
        list, NILVALUE -> null."""
        from opentelemetry_collector_contrib_spark.operators.parsers import (
            parse_structured_data,  # noqa: F401 — exercised via syslog_parser
        )

        rows = [
            ('<165>1 2026-01-02T03:04:05Z h app 1 ID47 '
             '[ex@32473 iut="3" src="App \\" x" eid="10\\]11"][meta seq="9"] m1',),
            ("<34>1 2026-01-02T03:04:05Z h app - - - plain",),
            ("<34>1 2026-01-02T03:04:05Z h app - - [solo@1] empty",),
        ]
        df = spark.createDataFrame(rows, "body string")
        out = syslog_parser(df, protocol="rfc5424").collect()
        sd0 = {k: dict(v) for k, v in out[0].structured_data.items()}
        assert sd0 == {
            "ex@32473": {"iut": "3", "src": 'App " x', "eid": "10]11"},
            "meta": {"seq": "9"},
        }
        assert out[0].message == "m1"
        assert out[1].structured_data is None and out[1].message == "plain"
        assert {k: dict(v) for k, v in out[2].structured_data.items()} == {
            "solo@1": {}
        }
        assert out[2].message == "empty"

    def test_rfc5424_octet_counting(self, spark):
        """RFC 6587 octet-counting frames: the `123 ` length prefix strips
        before parsing (parser.go:202-205); without the flag the prefixed
        line is a parse error."""
        framed = "98 <165>1 2026-01-02T03:04:05Z host01 app 1234 ID47 - hello framed"
        df = spark.createDataFrame([(framed,)], "body string")
        r = syslog_parser(df, protocol="rfc5424", enable_octet_counting=True).first()
        assert not r._parse_error and r.message == "hello framed"
        assert r.hostname == "host01" and r.severity_number == 10
        plain = syslog_parser(df, protocol="rfc5424").first()
        assert plain._parse_error

    def test_rfc3164(self, spark):
        line = "<34>Oct 11 22:14:15 mymachine su[230]: 'su root' failed"
        df = spark.createDataFrame([(line,)], "body string")
        r = syslog_parser(df, protocol="rfc3164").first()
        assert r.hostname == "mymachine" and r.appname == "su" and r.pid == "230"
        assert r.severity_number == 21 and r.facility == 4  # 34 = 4*8+2 crit


class TestSinks:
    def test_file_exporter_group_by(self, spark, tmp_path):
        from opentelemetry_collector_contrib_spark.sources.sinks import file_exporter

        df = spark.createDataFrame([("a", 1), ("b", 2), ("a", 3)], "g string, v int")
        p = str(tmp_path / "fe")
        file_exporter(df, p, format="json", group_by="g")
        back = spark.read.json(p)
        assert back.count() == 3 and set(r.g for r in back.select("g").collect()) == {"a", "b"}
        import os

        assert any("g=a" in d for d in os.listdir(p))

    def test_s3_time_partitioned_prunes(self, spark, tmp_path):
        from opentelemetry_collector_contrib_spark.sources.sinks import s3_time_partitioned

        df = spark.createDataFrame(
            [("2026-01-01 05:00:00",), ("2026-01-02 06:00:00",)], "ts string"
        ).withColumn("timestamp", F.to_timestamp("ts"))
        p = str(tmp_path / "s3")
        s3_time_partitioned(df, p, granularity="day")
        back = spark.read.parquet(p).filter("day = 2")
        assert back.count() == 1
        plan = back._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [isnotnull(day" in plan or "day#" in plan

    def test_loadbalance_repartition_stable(self, spark):
        from opentelemetry_collector_contrib_spark.sources.sinks import loadbalance_repartition

        df = spark.range(1000).withColumn("k", (F.col("id") % 50).cast("string"))
        out = loadbalance_repartition(df, "k", 8)
        pid = out.withColumn("p", F.spark_partition_id())
        # every key lands in exactly one partition
        spread = pid.groupBy("k").agg(F.countDistinct("p").alias("n")).agg(F.max("n")).first()[0]
        assert spread == 1


def test_rfc5424_repeated_param_name_keeps_last(spark):
    """RFC 5424 §6.3.2 allows repeated PARAM-NAME inside an SD element; the
    parser keeps the last occurrence (pcommon.Map upsert) instead of dying
    on Spark's DUPLICATED_MAP_KEY."""
    from opentelemetry_collector_contrib_spark.operators.parsers import syslog_parser

    line = ('<165>1 2026-01-02T03:04:05Z h app 1 ID47 '
            '[ex ip="1.1.1.1" ip="2.2.2.2"][ex dup="x"] m')
    df = spark.createDataFrame([(line,)], "body string")
    r = syslog_parser(df, protocol="rfc5424").first()
    # repeated param: last wins; repeated SD-ID: last element wins
    assert {k: dict(v) for k, v in r.structured_data.items()} == {"ex": {"dup": "x"}}


def test_map_upsert_sees_columns_promoted_earlier_in_group(spark):
    """Regression pin for ADVICE r4 (ottl.py map_store): a flat column
    promoted by an earlier statement in the same group must be visible to a
    later set(attributes["x"]) — it routes to the PROMOTED column, not the
    attributes map (resolver.columns is refreshed per statement)."""
    from opentelemetry_collector_contrib_spark.functions.ottl import transform_processor

    df = spark.createDataFrame([(1, {"a": "1"})], "id long, attributes map<string,string>")
    out = transform_processor(df, ['set(x, "flat")', 'set(attributes["x"], "mapped")'])
    r = out.first()
    assert r.x == "mapped" and dict(r.attributes) == {"a": "1"}
