"""OTTL compiler vectors — ports of pkg/ottl/e2e/e2e_test.go shapes
(statement, input row, expected row) restricted to the supported subset."""

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.functions.ottl import (
    Compiler,
    PathResolver,
    filter_processor_ottl,
    parse_statement,
    transform_processor,
)


@pytest.fixture(scope="module")
def row_df(spark):
    return spark.createDataFrame(
        [
            (
                "operationA",
                17,
                {"http.method": "get", "http.path": "/health", "flags": "A|B|C",
                 "total.string": "123456789", "foo": "bar"},
                "2026-01-02T03:04:05Z",
                10,
            ),
            (
                "operationB",
                9,
                {"http.method": "post", "http.path": "/api", "flags": "C",
                 "total.string": "42", "foo": "baz"},
                "2026-01-02T03:04:06Z",
                20,
            ),
        ],
        "body string, severity_number int, attributes map<string,string>, time_str string, value int",
    )


def rows(df):
    return [r.asDict(recursive=True) for r in df.collect()]


def attr(df, key):
    return [r[key] for r in rows(df.select(F.element_at("attributes", key).alias(key)))]


class TestStatements:
    def test_set_literal(self, row_df):
        out = transform_processor(row_df, ['set(body, "changed")'])
        assert [r["body"] for r in rows(out)] == ["changed", "changed"]

    def test_set_where_condition(self, row_df):
        out = transform_processor(row_df, ['set(body, "high") where severity_number >= 17'])
        assert [r["body"] for r in rows(out)] == ["high", "operationB"]

    def test_set_from_converter(self, row_df):
        out = transform_processor(row_df, ["set(body, ToUpperCase(body))"])
        assert [r["body"] for r in rows(out)] == ["OPERATIONA", "OPERATIONB"]

    def test_set_from_attribute_path(self, row_df):
        out = transform_processor(row_df, ['set(body, attributes["http.method"])'])
        assert [r["body"] for r in rows(out)] == ["get", "post"]

    def test_arithmetic(self, row_df):
        out = transform_processor(row_df, ["set(value, value * 2 + 1)"])
        assert [r["value"] for r in rows(out)] == [21, 41]

    def test_where_and_or_not(self, row_df):
        out = transform_processor(
            row_df,
            ['set(body, "x") where (severity_number > 10 and value == 10) or not (body == "operationB")'],
        )
        assert [r["body"] for r in rows(out)] == ["x", "operationB"]

    def test_delete_key(self, row_df):
        out = transform_processor(row_df, ['delete_key(attributes, "http.method")'])
        assert attr(out, "http.method") == [None, None]
        assert attr(out, "http.path") == ["/health", "/api"]

    def test_keep_keys(self, row_df):
        out = transform_processor(row_df, ['keep_keys(attributes, "flags", "foo")'])
        got = rows(out)[0]["attributes"]
        assert set(got) == {"flags", "foo"}

    def test_delete_matching_keys(self, row_df):
        out = transform_processor(row_df, ['delete_matching_keys(attributes, "^http")'])
        got = rows(out)[0]["attributes"]
        assert set(got) == {"flags", "total.string", "foo"}

    def test_replace_pattern(self, row_df):
        out = transform_processor(row_df, ['replace_pattern(body, "operation", "op")'])
        assert [r["body"] for r in rows(out)] == ["opA", "opB"]

    def test_replace_match_glob(self, row_df):
        out = transform_processor(row_df, ['replace_match(body, "operation*", "op")'])
        assert [r["body"] for r in rows(out)] == ["op", "op"]

    def test_replace_all_patterns_values(self, row_df):
        out = transform_processor(
            row_df, ['replace_all_patterns(attributes, "value", "get", "GET")']
        )
        assert attr(out, "http.method") == ["GET", "post"]

    def test_replace_all_matches_glob(self, row_df):
        """func_replace_all_matches.go: full-value glob over map values."""
        out = transform_processor(
            row_df, ['replace_all_matches(attributes, "/hea*", "/masked")']
        )
        assert attr(out, "http.path") == ["/masked", "/api"]
        assert attr(out, "http.method") == ["get", "post"]  # untouched

    def test_truncate_all(self, row_df):
        out = transform_processor(row_df, ["truncate_all(attributes, 2)"])
        assert attr(out, "http.method") == ["ge", "po"]

    def test_limit(self, row_df):
        out = transform_processor(row_df, ["limit(attributes, 2)"])
        assert all(len(r["attributes"]) == 2 for r in rows(out))

    def test_sequence_sees_earlier_results(self, row_df):
        out = transform_processor(
            row_df,
            ['set(body, "step1")', 'set(body, Concat("-", body, "step2"))'],
        )
        assert [r["body"] for r in rows(out)] == ["step1-step2", "step1-step2"]


class TestConverters:
    @pytest.mark.parametrize(
        "stmt,expected",
        [
            ('set(body, String(severity_number))', ["17", "9"]),
            ('set(body, Concat("-", body, "x"))', ["operationA-x", "operationB-x"]),
            ('set(body, Substring(body, 0, 9))', ["operation", "operation"]),
            ('set(body, ToLowerCase(body))', ["operationa", "operationb"]),
            ('set(body, Trim(Concat("", " ", body)))', ["operationA", "operationB"]),
            ('set(body, TrimPrefix(body, "operation"))', ["A", "B"]),
            ('set(body, String(HasPrefix(body, "operation")))', ["true", "true"]),
            ('set(body, String(Len(body)))', ["10", "10"]),
            ('set(body, String(IsMatch(body, "^op.*A$")))', ["true", "false"]),
            (
                'set(body, SHA256("abc"))',
                ["ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad"] * 2,
            ),
            ('set(body, MD5("abc"))', ["900150983cd24fb0d6963f7d28e17f72"] * 2),
            (
                'set(body, String(Int(Double("2.7"))))',
                ["2", "2"],
            ),
            ('set(body, String(Coalesce(nil, "fallback")))', ["fallback", "fallback"]),
            (
                # element ACCESS is the subscript form (grammar.go); Index()
                # is position-of-value (func_index.go)
                'set(body, Split(attributes["flags"], "|")[1]) where attributes["flags"] == "A|B|C"',
                ["B", "operationB"],
            ),
            (
                'set(body, String(Index(Split(attributes["flags"], "|"), "C")))',
                ["2", "0"],
            ),
            (
                'set(body, String(UnixSeconds(Time(time_str, "%Y-%m-%dT%H:%M:%SZ"))))',
                ["1767323045", "1767323046"],
            ),
            ('set(body, String(Hour(Time(time_str, "%Y-%m-%dT%H:%M:%SZ"))))', ["3", "3"]),
            ('set(body, FormatTime(Time(time_str, "%Y-%m-%dT%H:%M:%SZ"), "%Y/%m/%d"))',
             ["2026/01/02", "2026/01/02"]),
            ('set(body, Base64Decode(Base64Encode("hi")))', ["hi", "hi"]),
        ],
    )
    def test_vector(self, row_df, stmt, expected):
        out = transform_processor(row_df, [stmt])
        assert [r["body"] for r in rows(out)] == expected, stmt

    def test_parse_keyvalue(self, spark):
        df = spark.createDataFrame([("a=1 b=2",)], "body string")
        out = transform_processor(df, ['set(kv, ParseKeyValue(body, "=", " "))'])
        assert rows(out)[0]["kv"] == {"a": "1", "b": "2"}

    def test_keys_values_sort(self, row_df):
        out = transform_processor(row_df, ["set(ks, Sort(Keys(attributes)))"])
        assert rows(out)[0]["ks"] == ["flags", "foo", "http.method", "http.path", "total.string"]


class TestFilterAndErrors:
    def test_filter_processor_ottl(self, row_df):
        out = filter_processor_ottl(row_df, ["severity_number >= 17"])
        assert [r["body"] for r in rows(out)] == ["operationB"]

    def test_filter_or_conditions(self, row_df):
        out = filter_processor_ottl(
            row_df, ['attributes["foo"] == "bar"', "value > 15"]
        )
        assert rows(out) == []

    def test_error_mode_ignore_null_on_bad_cast(self, spark):
        df = spark.createDataFrame([("abc",)], "body string")
        out = transform_processor(df, ["set(v, Int(body))"], error_mode="ignore")
        assert rows(out)[0]["v"] is None

    def test_unknown_converter_fails_at_compile(self, row_df):
        with pytest.raises(ValueError, match="unsupported OTTL converter"):
            transform_processor(row_df, ["set(body, NoSuchFn(body))"])

    def test_parse_statement_shape(self):
        s = parse_statement('set(body, "x") where severity_number == 17')
        assert s.editor.name == "set" and s.where is not None


class TestGroupConditionsPreGroupState:
    """The statement-group `conditions` guard is evaluated ONCE per record
    against pre-group state (transformprocessor internal/common/logs.go:40-46):
    a group whose condition reads a field its own statements rewrite must
    still execute the remaining statements for records that matched on entry."""

    def test_guard_sees_pre_group_state(self, spark):
        df = spark.createDataFrame(
            [("keep", "a", 1), ("drop", "b", 2)],
            "body string, tag string, value int",
        )
        out = transform_processor(
            df,
            ['set(body, "rewritten")', 'set(tag, "touched")'],
            conditions=['body == "keep"'],
        )
        got = {r.value: (r.body, r.tag) for r in out.collect()}
        # record 1 matched on entry: BOTH statements apply even though the
        # first one rewrote the field the guard reads
        assert got[1] == ("rewritten", "touched")
        assert got[2] == ("drop", "b")
        assert "__ottl_group_guard" not in out.columns

    def test_guard_pre_state_on_attributes_map(self, spark):
        df = spark.createDataFrame(
            [(1, {"x": "hit", "k": "v"}), (2, {"x": "miss"})],
            "id int, attributes map<string,string>",
        )
        out = transform_processor(
            df,
            ['set(attributes["x"], "gone")', 'set(attributes["seen"], "yes")'],
            conditions=['attributes["x"] == "hit"'],
        )
        got = {r.id: dict(r.attributes) for r in out.collect()}
        assert got[1] == {"x": "gone", "k": "v", "seen": "yes"}
        assert got[2] == {"x": "miss"}
