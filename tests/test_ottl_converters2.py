"""Second batch of OTTL converters: time/duration, luhn, type predicates,
key-value stringify, xml, useragent.

Reference vectors modeled on pkg/ottl/e2e/e2e_test.go converter cases.
"""

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.functions.ottl import transform_processor


@pytest.fixture(scope="module")
def row(spark):
    return spark.createDataFrame(
        [
            (
                1,
                "1h22m33s",
                "4111111111111111",
                {"a": "1", "b": "2"},
                "<r><name>bob</name></r>",
                "Mozilla/5.0 (Windows NT 10.0; Win64) Chrome/120.0.0.0 Safari/537.36",
                2.5,
            )
        ],
        "id int, dur string, card string, m map<string,string>, xml string,"
        " ua string, secs double",
    )


class TestTimeDuration:
    def test_duration(self, row):
        out = transform_processor(row, ['set(s, Duration(dur))'])
        assert out.first().s == pytest.approx(3600 + 22 * 60 + 33)

    def test_duration_subsecond(self, spark):
        df = spark.createDataFrame([("150ms",), ("2.5s",), ("90us",)], "dur string")
        got = [r.s for r in transform_processor(df, ['set(s, Duration(dur))']).collect()]
        assert got[0] == pytest.approx(0.150)
        assert got[1] == pytest.approx(2.5)
        assert got[2] == pytest.approx(9e-05)

    def test_unit_conversions(self, row):
        out = transform_processor(
            row,
            [
                "set(h, Hours(secs))",
                "set(mi, Minutes(secs))",
                "set(ms, Milliseconds(secs))",
                "set(us, Microseconds(secs))",
                "set(ns, Nanoseconds(secs))",
            ],
        ).first()
        assert out.h == pytest.approx(2.5 / 3600)
        assert out.mi == pytest.approx(2.5 / 60)
        assert out.ms == pytest.approx(2500.0)
        assert out.us == pytest.approx(2.5e6)
        assert out.ns == 2_500_000_000

    def test_unix_and_nanosecond(self, spark):
        df = spark.createDataFrame([(1704067200,)], "epoch long")
        out = transform_processor(
            df, ["set(t, Unix(epoch))", "set(nanos, Nanosecond(Unix(epoch)))"]
        ).first()
        assert out.t.year == 2024 and out.nanos == 0


class TestLuhn:
    def test_valid_card(self, row):
        out = transform_processor(row, ["set(ok, IsValidLuhn(card))"])
        assert out.first().ok is True

    def test_invalid_card(self, spark):
        df = spark.createDataFrame([("4111111111111112",), ("123",)], "card string")
        got = [r.ok for r in transform_processor(df, ["set(ok, IsValidLuhn(card))"]).collect()]
        assert got == [False, False]


class TestTypePredicates:
    def test_static_schema_types(self, row):
        out = transform_processor(
            row,
            [
                "set(is_int, IsInt(id))",
                "set(is_str, IsString(dur))",
                "set(is_map, IsMap(m))",
                "set(is_dbl, IsDouble(secs))",
                "set(is_bool, IsBool(id))",
            ],
        ).first()
        assert (out.is_int, out.is_str, out.is_map, out.is_dbl, out.is_bool) == (
            True, True, True, True, False,
        )

    def test_literal_types(self, row):
        out = transform_processor(
            row, ['set(a, IsInt(3))', 'set(b, IsString("x"))', "set(c, IsDouble(3))"]
        ).first()
        assert (out.a, out.b, out.c) == (True, True, False)


class TestCollectionsXmlUa:
    def test_to_key_value_string(self, row):
        out = transform_processor(row, ['set(s, ToKeyValueString(m, "=", " "))'])
        assert sorted(out.first().s.split(" ")) == ["a=1", "b=2"]

    def test_map_keys_values(self, row):
        out = transform_processor(row, ["set(ks, MapKeys(m))", "set(vs, MapValues(m))"]).first()
        assert sorted(out.ks) == ["a", "b"] and sorted(out.vs) == ["1", "2"]

    def test_get_xml(self, row):
        # func_get_xml.go serializes the matched NODES (not inner text)
        out = transform_processor(row, ['set(nm, GetXML(xml, "/r/name"))'])
        assert out.first().nm == "<name>bob</name>"
        # text() selection yields the inner text
        out2 = transform_processor(row, ['set(nm, GetXML(xml, "/r/name/text()"))'])
        assert out2.first().nm == "bob"

    def test_useragent(self, row):
        out = transform_processor(row, ["set(u, UserAgent(ua))"]).first()
        assert out.u.user_agent_name == "Chrome"
        assert out.u.user_agent_version.startswith("120")
        assert out.u.os_name == "Windows NT 10.0"

    def test_decode(self, spark):
        df = spark.createDataFrame([("hello",)], "b string")
        out = transform_processor(df, ['set(s, Decode(b, "UTF-8"))'])
        assert out.first().s == "hello"
