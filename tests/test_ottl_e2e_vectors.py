"""Table-driven port of pkg/ottl/e2e/e2e_test.go converter vectors.

Each row runs the VERBATIM reference statement through transform_processor
and asserts the reference's expected value on the target column. Context
columns mirror the e2e log record (http_method="get", flags="A|B|C", ...).
Statements the flat-column model intentionally does not support (dynamic
key indirection attributes[attributes[...]], pdata-byte formatting of Hex,
Go-runtime Now() arithmetic) are documented in SURVEY §2.4 rather than
ported.
"""

import hashlib

import pytest

from opentelemetry_collector_contrib_spark.functions.ottl import transform_processor


@pytest.fixture(scope="module")
def ctx(spark):
    return spark.createDataFrame(
        [("get", "A|B|C", ",", [1, 2, 3], "base64")],
        "http_method string, flags string, val string, nums array<int>, encoding string",
    )


def run1(df, statement, col="test"):
    return transform_processor(df, [statement]).first()[col]


# (statement, expected) — expected None means "assert truthy separately"
VECTORS = [
    # encode / decode (e2e_test.go Base64/Decode cases)
    ('set(test, Base64Encode("pass"))', "cGFzcw=="),
    ('set(test, Base64Decode("cGFzcw=="))', "pass"),
    ('set(test, Decode("cGFzcw==", "base64"))', "pass"),
    ('set(test, Decode("cGFzcw==", encoding))', "pass"),
    # coalesce with list arg
    ('set(test, Coalesce([http_method, attributes["http.path"], "fallback"]))', "get"),
    ('set(test, Coalesce([attributes["nonexistent"], http_method, "fallback"]))', "get"),
    ('set(test, Coalesce([attributes["nonexistent"], attributes["also.missing"], "fallback"]))', "fallback"),
    # concat reference form
    ('set(test, Concat(["A","B"], ":"))', "A:B"),
    # case conversion
    ('set(test, ConvertCase(http_method, "upper"))', "GET"),
    ('set(test, ConvertCase("PASS", "lower"))', "pass"),
    ('set(test, ConvertCase("fooBar", "snake"))', "foo_bar"),
    ('set(test, ConvertCase("foo_bar", "camel"))', "FooBar"),  # e2e_test.go:684
    ('set(test, ToCamelCase("foo_bar"))', "FooBar"),
    ('set(test, ToSnakeCase("fooBar"))', "foo_bar"),
    ('set(test, ToUpperCase(http_method))', "GET"),
    ('set(test, ToLowerCase("PASS"))', "pass"),
    # parse int (Go strconv bases)
    ('set(test, ParseInt("0xAF", 0))', 175),
    ('set(test, ParseInt("12345", 10))', 12345),
    ('set(test, ParseInt("AF", 16))', 175),
    # numeric coercion
    ('set(test, Double("1"))', 1.0),
    ('set(test, Double(true))', 1.0),
    ('set(test, Int(1.0))', 1),
    ('set(test, Int("1"))', 1),
    ('set(test, Int(true))', 1),
    # duration → unit converters
    ('set(test, Hours(Duration("90m")))', 1.5),
    ('set(test, Minutes(Duration("1h")))', 60.0),
    ('set(test, Seconds(Duration("1m")))', 60.0),
    ('set(test, Milliseconds(Duration("1s")))', 1000.0),
    ('set(test, Microseconds(Duration("1ms")))', 1000.0),
    ('set(test, Nanoseconds(Duration("1ms")))', 1_000_000),
    # hashes (identical hex in Go and Spark)
    ('set(test, MD5("pass"))', hashlib.md5(b"pass").hexdigest()),
    ('set(test, SHA1("pass"))', hashlib.sha1(b"pass").hexdigest()),
    ('set(test, SHA256("pass"))', hashlib.sha256(b"pass").hexdigest()),
    ('set(test, SHA512("pass"))', hashlib.sha512(b"pass").hexdigest()),
    # luhn
    ('set(test, IsValidLuhn("17893729974"))', True),
    ('set(test, IsValidLuhn("17893729975"))', False),
    # string ops
    ('set(test, Split(flags, "|"))', ["A", "B", "C"]),
    ('set(test, Sort(Split(flags, "|"), "desc"))', ["C", "B", "A"]),
    ('set(test, Format("%03d-%s", [7, "test"]))', "007-test"),
    ('set(test, String("test"))', "test"),
    ('set(test, Substring("pass", 0, 2))', "pa"),
    ('set(test, Len(flags))', 5),
    # key-value round trips
    ('set(test, ToKeyValueString(ParseKeyValue("k1=v1 k2=v2"), "=", " ", true))', "k1=v1 k2=v2"),
    ('set(test, ToKeyValueString(ParseKeyValue("k1:v1,k2:v2", ":", ","), ":", ",", true))', "k1:v1,k2:v2"),
    # xml family (e2e_test.go:712-724, 840, 870, 1123-1148)
    ('set(test, GetXML("<a><b>1</b><c><b>2</b></c></a>", "/a//b"))', "<b>1</b><b>2</b>"),
    ('set(test, InsertXML("<a></a>", "/a", "<b></b>"))', "<a><b></b></a>"),
    (
        'set(test, RemoveXML("<Log id=\\"1\\"><Message>This is a log message!</Message></Log>", "/Log/Message"))',
        '<Log id="1"></Log>',
    ),
    (
        'set(test, ConvertAttributesToElementsXML("<Log id=\\"1\\"><Message>This is a log message!</Message></Log>"))',
        "<Log><Message>This is a log message!</Message><id>1</id></Log>",
    ),
    ('set(test, ConvertTextToElementsXML("<a><b/>foo</a>"))', "<a><b></b><value>foo</value></a>"),
    (
        'set(test, ConvertTextToElementsXML("<a><b/>foo</a><c><b/>bar</c>", "/a", "custom"))',
        "<a><b></b><custom>foo</custom></a><c><b></b>bar</c>",
    ),
    # trim with cutset (func_trim.go strings.Trim semantics)
    ('set(test, Trim("--pass--", "-"))', "pass"),
    ('set(test, Trim("  pass  "))', "pass"),
    # format legacy varargs with a Column argument
    ('set(test, Format("%s-%03d", http_method, 7))', "get-007"),
    # func_hex.go pdata-byte formatting (e2e_test.go Hex cases)
    ('set(test, Hex(1.0))', "3ff0000000000000"),
    ('set(test, Hex(12))', "000000000000000c"),
    ('set(test, Hex(true))', "01"),
    ('set(test, Hex("12"))', "3132"),
    # ContainsValue over literal lists (e2e_test.go:…ContainsValue)
    ('set(test, "pass") where ContainsValue(["hello", "world"], "hello")', "pass"),
    ('set(test, "pass") where ContainsValue([1, 2, 3, 4], 4)', "pass"),
    ('set(test, "pass") where ContainsValue([1.1, 2.2, 3.3, 4.4], 4.4)', "pass"),
    # String of containers/bools: pdata AsString (compact JSON / lowercase)
    ('set(test, String([1,2,3]))', "[1,2,3]"),
    ('set(test, String(true))', "true"),
    ('set(test, String(nums))', "[1,2,3]"),
    # Len over containers → size; literals fold at compile time
    ('set(test, Len(["a", "b"]))', 2),
    ('set(test, Len(nums))', 3),
    # Base64Encode url-safe variant (func_base64encode.go)
    ('set(test, Base64Encode("data+values/items", "base64-url"))', "ZGF0YSt2YWx1ZXMvaXRlbXM="),
    # ParseJSON of an array document → slice (func_parse_json.go)
    ('set(test, ParseJSON("[\\"value1\\",\\"value2\\"]"))', ["value1", "value2"]),
    # subscript with a computed index on a call result
    ('set(test, Split("fail|pass", "|")[Int("1")])', "pass"),
    # func_community_id.go protocol/seed variants (e2e_test.go:1993-2025)
    ('set(test, CommunityID("123.124.125.126", 12345, "55.56.57.58", 80, "TCP", 0))', "1:9qr9Z1LViXcNwtLVOHZ3CL8MlyM="),
    ('set(test, CommunityID("123.124.125.126", 12345, "55.56.57.58", 80, "UDP", 1))', "1:1viZaClxhTkWejXjxmQXaZzI8F4="),
    ('set(test, CommunityID("123.124.125.126", 12345, "55.56.57.58", 80, "ICMP", 9))', "1:7tb0A6iknoFJCZmtLXkvScm21Ss="),
    ('set(test, CommunityID("123.124.125.126", 12345, "55.56.57.58", 80, "ICMP6", 10))', "1:D7dVM6HJooFwvHhLnrMrNMw/UR4="),
    ('set(test, CommunityID("123.124.125.126", 12345, "55.56.57.58", 80, "RSVP", 11))', "1:cEVbY6jymDAKgyIU4UqMu0WQHTI="),
    ('set(test, CommunityID("123.124.125.126", 12345, "55.56.57.58", 80, "SCTP", 12))', "1:4KOPjy2bsV43uY/mf4HtwyZkwqM="),
    # func_index.go: position-of-value, -1 when absent (e2e_test.go:1680ff)
    ('set(test, Index("opentelemetry", "telemetry"))', 4),
    ('set(test, Index("opentelemetry", "zzz"))', -1),
    ('set(test, Index(Split(flags, "|"), "B"))', 1),
    ('set(test, Index(Split(flags, "|"), "Z"))', -1),
    # subscripts: 0-based element access on paths and call results
    ('set(test, Split(flags, "|")[2])', "C"),
    ('set(test, nums[1])', 2),
    # func_slice_to_map.go: stringified-index keys + subscript chaining
    ('set(test, SliceToMap(["fail", "pass"])["1"])', "pass"),
    ('set(test, SliceToMap(Split(flags, "|"))["0"])', "A"),
    # func_find.go: first match; value by default, mapper optional
    ('set(test, Find(Split(flags, "|"), (_, v) => v == "B"))', "B"),
    (
        'set(test, Find(Split(flags, "|"), (_, v) => v == "C", (i, v) => Concat([String(i), ":", v], "")))',
        "2:C",
    ),
    # func_eval.go: lambda application
    ('set(test, Eval((value) => ToUpperCase(value), ["pass"]))', "PASS"),
    # func_when.go conditional converter
    ('set(test, When(Len(flags) > 3, "long", "short"))', "long"),
    ('set(test, When(Len(flags) > 9, "long", "short"))', "short"),
    # func_is_in_cidr.go — reference name IsInCIDR, IPv4 Column math + IPv6 UDF
    ('set(test, IsInCIDR("10.1.2.3", "10.1.0.0/16"))', True),
    ('set(test, IsInCIDR("10.2.2.3", "10.1.0.0/16"))', False),
    ('set(test, IsInCIDR("2001:db8::1", "2001:db8::/32"))', True),
    ('set(test, IsInCIDR("2001:db9::1", "2001:db8::/32"))', False),
]

WHERE_VECTORS = [
    'set(test, "pass") where IsBool(false)',
    'set(test, "pass") where IsDouble(1.0)',
    'set(test, "pass") where IsMatch("aa123bb", "\\\\d{3}")',
    'set(test, "pass") where IsString("")',
    'set(test, "pass") where IsEmpty("")',
]


class TestE2EVectors:
    @pytest.mark.parametrize("statement,expected", VECTORS, ids=lambda v: str(v)[:55])
    def test_vector(self, ctx, statement, expected):
        got = run1(ctx, statement)
        if isinstance(expected, float):
            assert got == pytest.approx(expected)
        else:
            assert got == expected

    @pytest.mark.parametrize("statement", WHERE_VECTORS, ids=lambda v: v[:55])
    def test_where_vector(self, ctx, statement):
        assert run1(ctx, statement) == "pass"

    def test_extract_patterns_map(self, ctx):
        got = run1(ctx, 'set(test, ExtractPatterns("aa123bb", "(?P<numbers>\\\\d+)"))')
        assert got == {"numbers": "123"}

    def test_parse_keyvalue_custom_delims(self, ctx):
        got = run1(ctx, 'set(test, ParseKeyValue("k1!v1_k2!v2", "!", "_"))')
        assert got == {"k1": "v1", "k2": "v2"}

    def test_parse_json_map(self, ctx):
        got = run1(ctx, 'set(test, ParseJSON("{\\"id\\":1}"))')
        assert got == {"id": "1"}

    def test_parse_xml_map(self, ctx):
        """e2e_test.go:1132: ParseXML → {tag, attributes, children} map
        (flat model carries it as a JSON string)."""
        import json

        got = run1(
            ctx,
            'set(test, ParseXML("<Log id=\\"1\\"><Message>This is a log message!</Message></Log>"))',
        )
        assert json.loads(got) == {
            "tag": "Log",
            "attributes": {"id": "1"},
            "children": [{"tag": "Message", "content": "This is a log message!"}],
        }

    def test_parse_simplified_xml_map(self, ctx):
        """e2e_test.go:1123: ParseSimplifiedXML → leaf-text map."""
        import json

        got = run1(
            ctx,
            'set(test, ParseSimplifiedXML("<Log><id>1</id><Message>This is a log message!</Message></Log>"))',
        )
        assert json.loads(got) == {
            "Log": {"id": "1", "Message": "This is a log message!"}
        }

    def test_delete_index_editor(self, ctx):
        """func_delete_index.go: remove [start, end) from a slice; end
        defaults to start+1."""
        got = run1(ctx, "set(nums, nums) where true", col="nums")  # sanity
        assert got == [1, 2, 3]
        from opentelemetry_collector_contrib_spark.functions.ottl import transform_processor

        out = transform_processor(ctx, ["delete_index(nums, 1)"]).first()["nums"]
        assert out == [1, 3]
        out2 = transform_processor(ctx, ["delete_index(nums, 0, 3)"]).first()["nums"]
        assert out2 == []

    def test_parse_severity_mapping(self, ctx):
        """func_parse_severity.go: equals / range / Nxx shorthand criteria,
        first matching level wins."""
        from pyspark.sql import functions as F

        df = ctx.withColumn("code", F.lit(503))
        got = run1(
            df,
            'set(test, ParseSeverity(code, {"info": [{"range": {"min": 200, "max": 299}}], "error": ["5xx"]}))',
        )
        assert got == "error"
        df2 = ctx.withColumn("code", F.lit(204))
        assert run1(df2, 'set(test, ParseSeverity(code, {"info": ["2xx"], "error": ["5xx"]}))') == "info"
        df3 = ctx.withColumn("lvl", F.lit("warning"))
        assert run1(df3, 'set(test, ParseSeverity(lvl, {"warn": ["warning", "warn"]}))') == "warn"

    def test_parse_csv_optional_and_named_args(self, ctx):
        """func_parse_csv.go: ParseCSV(target, header, delimiter?,
        headerDelimiter?, mode?) — positional and NAMED argument forms
        (e2e_test.go ParseCSV cases)."""
        got = run1(
            ctx,
            'set(test, ParseCSV("val1;val2;val3","header1|header2|header3",";","|","strict"))',
        )
        assert got.asDict() == {"header1": "val1", "header2": "val2", "header3": "val3"}
        named = run1(
            ctx,
            'set(test, ParseCSV("val1,val2,val3","header1|header2|header3",headerDelimiter="|",mode="strict"))',
        )
        assert named.asDict() == {"header1": "val1", "header2": "val2", "header3": "val3"}

    def test_slice_to_map_key_value_paths(self, spark):
        """e2e_test.go:1445-1471: SliceToMap(things, [name]) keys by the
        field; with [value] the entries project to that field."""
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [([("foo", 2), ("bar", 5)],)],
            "things array<struct<name:string,value:int>>",
        )
        keyed = transform_processor(df, ['set(test, SliceToMap(things, ["name"]))']).first()["test"]
        assert set(keyed.keys()) == {"foo", "bar"} and keyed["bar"]["value"] == 5
        projected = transform_processor(
            df, ['set(test, SliceToMap(things, ["name"], ["value"]))']
        ).first()["test"]
        assert projected == {"foo": 2, "bar": 5}

    def test_find_on_map(self, spark):
        """e2e_test.go:1703-1717: Find over a MAP binds (key, value)."""
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [({"foo": "x", "bar": "pass"},)], "m map<string,string>"
        )
        got = transform_processor(df, ['set(test, Find(m, (k, _) => k == "bar"))']).first()["test"]
        assert got == "pass"
        mapped = transform_processor(
            df,
            ['set(test, Find(m, (k, _) => k == "bar", (k, v) => Concat([k, ":", v], "")))'],
        ).first()["test"]
        assert mapped == "bar:pass"

    def test_xml_roundtrip_benchmark_shape(self, ctx):
        """Benchmark_XML_Functions roundTrip (e2e_test.go:2987-3005):
        RemoveXML(InsertXML(body, ..., GetXML(body, ...)), ...) == body."""
        from pyspark.sql import functions as F

        xml = "<Data><From><Test>1</Test><Test>2</Test></From><To></To></Data>"
        df = ctx.withColumn("body", F.lit(xml))
        got = run1(
            df,
            'set(test, RemoveXML(InsertXML(body, "/Data/To", GetXML(body, "/Data/From/Test")), "/Data/To/Test"))',
        )
        assert got == xml


class TestQuotedKeyValue:
    def test_parse_keyvalue_quoted_value(self, spark):
        """e2e_test.go ParseKeyValue quoted case: delimiters inside quotes
        are literal (parseutils.SplitString)."""
        df = spark.createDataFrame([(1,)], "id int")
        got = run1(df, 'set(test, ParseKeyValue("k1!v1_k2!\\"v2__!__v2\\"", "!", "_"))')
        assert got == {"k1": "v1", "k2": "v2__!__v2"}

    def test_split_quoted_unterminated(self):
        from opentelemetry_collector_contrib_spark.operators.parsers import split_quoted

        assert split_quoted('a "unterminated', " ") is None
        assert split_quoted('a "b c" d', " ") == ["a", "b c", "d"]
        # Go's SplitString KEEPS the backslash (it only suppresses quote
        # handling for the next char, parser.go:45-49)
        assert split_quoted(r'x\"y', " ") == ['x\\"y']
