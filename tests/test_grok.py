"""Grok expansion unit tests (pattern-dict level + one Spark run)."""

import re

import pytest

from opentelemetry_collector_contrib_spark.functions.grok import (
    BASE_PATTERNS,
    expand_grok,
    grok_parser,
)


def test_expand_simple():
    rx, types = expand_grok("%{INT:num} %{WORD:w}")
    assert types == {"num": "string", "w": "string"}
    m = re.match(rx, "42 hello")
    assert m.group("num") == "42" and m.group("w") == "hello"


def test_expand_typed():
    rx, types = expand_grok("%{INT:num:int} %{NUMBER:score:float}")
    assert types == {"num": "int", "score": "float"}


def test_expand_recursive_reference():
    # IPORHOST references nothing but TIMESTAMP_ISO8601 is composite; make a
    # custom recursive pattern
    rx, _ = expand_grok("%{PAIR:p}", definitions={"PAIR": "%{INT}-%{INT}"})
    assert re.match(rx, "1-2").group("p") == "1-2"


def test_unknown_pattern_raises():
    with pytest.raises(ValueError, match="unknown grok pattern"):
        expand_grok("%{NOPE:x}")


def test_field_name_sanitized():
    rx, types = expand_grok("%{WORD:log.level}")
    assert "log_level" in types
    assert re.match(rx, "warn").group("log_level") == "warn"


@pytest.mark.parametrize(
    "pattern,sample",
    [
        ("TIMESTAMP_ISO8601", "2026-01-02T03:04:05.123Z"),
        ("IPV4", "10.1.2.3"),
        ("LOGLEVEL", "ERROR"),
        ("LOGLEVEL", "warning"),
        ("QUOTEDSTRING", '"hi there"'),
        ("UUID", "123e4567-e89b-12d3-a456-426614174000"),
        ("HTTPDATE", "10/Oct/2000:13:55:36 -0700"),
    ],
)
def test_base_patterns_match(pattern, sample):
    assert re.fullmatch(BASE_PATTERNS[pattern], sample), pattern


def test_grok_parser_spark(spark):
    df = spark.createDataFrame(
        [("2026-01-02T03:04:05Z ERROR took 42ms",), ("garbage",)], "body string"
    )
    out = grok_parser(
        df,
        "%{TIMESTAMP_ISO8601:ts} %{LOGLEVEL:level} took %{INT:ms:int}ms",
    ).collect()
    assert out[0].level == "ERROR" and out[0].ms == 42 and not out[0]._parse_error
    assert out[1]._parse_error and out[1].ms is None
