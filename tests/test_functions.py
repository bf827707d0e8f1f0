"""Severity table + strptime translation unit tests (table-driven, mirroring
pkg/stanza/operator/helper/severity_test.go and time_test.go)."""

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.functions.severity import severity_number_col
from opentelemetry_collector_contrib_spark.functions.timefmt import strptime_to_spark

SEV_CASES = [
    ("trace", 1), ("TRACE", 1), ("Debug", 5), ("info", 9), ("notice", 10),
    ("warn", 13), ("WARNING", 13), ("error", 17), ("ERR", 17), ("fatal", 21),
    ("crit", 21), ("alert", 22), ("emerg", 23), ("catastrophe", 24),
    ("17", 17), ("5", 5), ("404", 13), ("503", 17), ("204", 9), ("301", 10),
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
        ("%d/%b/%Y:%H:%M:%S %z", "dd/MMM/yyyy:HH:mm:ss xx"),
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
