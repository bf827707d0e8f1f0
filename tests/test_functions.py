"""Severity table + strptime translation unit tests (table-driven, mirroring
pkg/stanza/operator/helper/severity_test.go and time_test.go)."""

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.functions.severity import severity_number_col
from opentelemetry_collector_contrib_spark.functions.timefmt import strptime_to_spark

# builtin DEFAULT mapping exactly (severity_builder.go:18-85): level aliases
# + warning*/err* only — notice/crit/HTTP-range tokens are NOT defaults
# (they require an explicit mapping; see TestSeverityMappingConfig)
SEV_CASES = [
    ("trace", 1), ("TRACE", 1), ("Debug", 5), ("info", 9),
    ("warn", 13), ("WARNING", 13), ("warning3", 15), ("error", 17),
    ("ERR", 17), ("err4", 20), ("fatal", 21), ("fatal4", 24),
    ("17", 17), ("5", 5),
    ("notice", 0), ("crit", 0), ("alert", 0), ("emerg", 0), ("catastrophe", 0),
    ("404", 0), ("503", 0), ("204", 0), ("301", 0),
    ("unknown-token", 0), ("", 0), (None, 0), ("999", 0), ("0", 0), ("25", 0),
]


def test_severity_mapping(spark):
    df = spark.createDataFrame([(t,) for t, _ in SEV_CASES], "tok string")
    got = df.withColumn("n", severity_number_col(F.col("tok"))).collect()
    want = {t: n for t, n in SEV_CASES}
    for r in got:
        assert r.n == want[r.tok], r.tok


@pytest.mark.parametrize(
    "layout,expected",
    [
        ("%Y-%m-%d %H:%M:%S", "yyyy-MM-dd HH:mm:ss"),
        ("%Y-%m-%dT%H:%M:%S.%fZ", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"),
        # ctimefmt %z = Go "Z0700": accepts Z or ±hhmm ⇒ JDK "XX"
        ("%d/%b/%Y:%H:%M:%S %z", "dd/MMM/yyyy:HH:mm:ss XX"),
        ("%H:%M", "HH:mm"),
    ],
)
def test_strptime_translation(layout, expected):
    assert strptime_to_spark(layout) == expected


def test_strptime_unknown_directive_raises():
    with pytest.raises(ValueError):
        strptime_to_spark("%Q")


def test_time_parse_roundtrip(spark):
    from opentelemetry_collector_contrib_spark.operators.parsers import time_parser

    df = spark.createDataFrame([("2026-01-01T00:00:01.500000Z",), ("garbage",)], "ts string")
    out = time_parser(df, "ts", "t", "%Y-%m-%dT%H:%M:%S.%fZ").collect()
    assert out[0].t is not None and out[0].t.microsecond == 500000
    assert out[1].t is None  # try_to_timestamp: failure → null, not task error


class TestSeverityMappingConfig:
    """Port of helper/severity_test.go cases: custom mapping values
    (string/int/list/range/Nxx), override-standard, preset=none,
    overwrite_text."""

    def _parse(self, spark, samples, **kw):
        from opentelemetry_collector_contrib_spark.operators.parsers import severity_parser

        df = spark.createDataFrame([(s,) for s in samples], "sev string")
        out = severity_parser(df, "sev", **kw)
        return {r.sev: (r.severity_number, r.severity_text) for r in out.collect()}

    def test_custom_string_and_caps_key(self, spark):
        got = self._parse(spark, ["NOOOOOOO"], mapping={"ErRoR": "NOOOOOOO"})
        assert got["NOOOOOOO"] == (17, "ERROR")

    def test_custom_int_and_mixed_list(self, spark):
        got = self._parse(
            spark, ["1234", "ThiS Is BaD", "other"],
            mapping={"error": ["NOOOOOOO", "this is bad", 1234]},
        )
        assert got["1234"][0] == 17 and got["ThiS Is BaD"][0] == 17
        assert got["other"][0] == 0

    def test_numbered_level_key(self, spark):
        got = self._parse(spark, ["critical"], mapping={"error2": "critical"})
        assert got["critical"] == (18, "ERROR2")

    def test_override_standard(self, spark):
        """severity_test.go override-standard: custom wins over builtin."""
        got = self._parse(spark, ["error"], mapping={"error3": ["error"]})
        assert got["error"][0] == 19

    def test_range_and_boundaries(self, spark):
        got = self._parse(
            spark, ["119", "120", "123", "125", "126"],
            mapping={"error": {"min": 120, "max": 125}},
        )
        assert [got[s][0] for s in ["119", "120", "123", "125", "126"]] == [0, 17, 17, 17, 0]

    def test_http_shorthands(self, spark):
        got = self._parse(
            spark, ["204", "301", "404", "503", "600"],
            mapping={"info": "3xx", "error3": "4xx", "debug4": "5xx", "info2": "2xx"},
        )
        assert got["204"][0] == 10 and got["301"][0] == 9
        assert got["404"][0] == 19 and got["503"][0] == 8 and got["600"][0] == 0

    def test_preset_none_drops_builtin(self, spark):
        got = self._parse(spark, ["error"], preset="none")
        assert got["error"][0] == 0
        got2 = self._parse(spark, ["error", "boom"], preset="none", mapping={"fatal": "boom"})
        assert got2["error"][0] == 0 and got2["boom"][0] == 21

    def test_overwrite_text_false_keeps_raw(self, spark):
        """severity_test.go 'unknown'/'error' default: text = raw token."""
        got = self._parse(spark, ["Error", "blah"], overwrite_text=False)
        assert got["Error"] == (17, "Error")
        assert got["blah"] == (0, "blah")


class TestTimeLayouts:
    """Port of helper/time_test.go strptime layouts over the ctimefmt
    directive table (ctimefmt.go:31-70). Our engine stores wall-clock times
    (UTC-normalized when the layout carries an offset); named zones parse
    with offset 0 exactly like Go time.Parse without a location database, so
    the expected values below are the reference's wall-clock components."""

    def _parse(self, spark, sample, layout):
        from opentelemetry_collector_contrib_spark.operators.parsers import time_parser

        df = spark.createDataFrame([(sample,)], "ts_in string")
        return time_parser(df, "ts_in", "t", layout).first().t

    CASES = [
        # (sample, strptime layout, expected iso — None=current-year anchor)
        ("Mon Jan 2 15:04:05 UTC 2006", "%a %b %e %H:%M:%S %Z %Y", "2006-01-02T15:04:05"),
        ("Mon Jan 2 15:04:05 MST 2006", "%a %b %e %H:%M:%S %Z %Y", "2006-01-02T15:04:05"),
        ("Mon Jan 02 15:04:05 MST 2006", "%a %b %d %H:%M:%S %Z %Y", "2006-01-02T15:04:05"),
        ("2020-06-09T15:39:58", "%Y-%m-%dT%H:%M:%S", "2020-06-09T15:39:58"),
        ("2019-11-05 10:38:35.118 HST", "%Y-%m-%d %H:%M:%S.%L %Z", "2019-11-05T10:38:35.118000"),
        ("3/4/2018 11:52:29", "%q/%g/%Y %H:%M:%S", "2018-03-04T11:52:29"),
        # offset layouts normalize to UTC: 09:34:32.901-1000 = 19:34:32.901Z
        ("2019-11-27T09:34:32.901-1000", "%Y-%m-%dT%H:%M:%S.%L%z", "2019-11-27T19:34:32.901000"),
        ("2019-11-27T09:34:32.901-10:00", "%Y-%m-%dT%H:%M:%S.%L%j", "2019-11-27T19:34:32.901000"),
        ("2019-11-27T09:34:32.901Z", "%Y-%m-%dT%H:%M:%S.%LZ", "2019-11-27T09:34:32.901000"),
        # %s is NANOseconds in ctimefmt (truncated to micros here)
        ("2021-02-03T04:05:06.123456789Z", "%Y-%m-%dT%H:%M:%S.%sZ", "2021-02-03T04:05:06.123456"),
        ("06/01/2021 3:29:29 PM", "%d/%m/%Y %l:%M:%S %p", "2021-01-06T15:29:29"),
        ("16-Dec-2020 12:00:00", "%d-%b-%Y %H:%M:%S", "2020-12-16T12:00:00"),
        ("10/Feb/2023:17:44:30 +0000", "%d/%b/%Y:%H:%M:%S %z", "2023-02-10T17:44:30"),
    ]

    @pytest.mark.parametrize("sample,layout,expected", CASES, ids=lambda v: str(v)[:40])
    def test_layout(self, spark, sample, layout, expected):
        got = self._parse(spark, sample, layout)
        assert got is not None, (sample, layout)
        assert got.isoformat() == expected

    def test_missing_year_anchors_to_current(self, spark):
        """timeutils SetMissingYear: layouts without a year directive anchor
        to the current year — on BOTH the JVM path (%b: Spark-safe) and the
        Arrow path (%a forces fallback)."""
        import datetime

        y = datetime.datetime.now().year
        jvm = self._parse(spark, "Jun 09 11:39:45", "%b %d %H:%M:%S")
        assert (jvm.year, jvm.month, jvm.day) == (y, 6, 9)
        arrow = self._parse(spark, "Tue Jun 09 11:39:45", "%a %b %d %H:%M:%S")
        assert (arrow.year, arrow.hour) == (y, 11)

    def test_kitchen_clock(self, spark):
        got = self._parse(spark, "12:34PM", "%H:%M%p")
        assert (got.hour, got.minute) == (12, 34)

    def test_parse_failure_is_null(self, spark):
        assert self._parse(spark, "garbage", "%a %b %e %H:%M:%S %Z %Y") is None
        assert self._parse(spark, "garbage", "%Y-%m-%d") is None
