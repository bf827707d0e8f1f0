"""Port of routingconnector's TestLogsConnectorDetailed log-context matrix.

Input mirrors plogutiltest.NewLogs("AB","CD","EF"): resources A,B x scopes
C,D x logs E,F (8 records, body "logE"/"logF"). Cases from
connector/routingconnector/logs_test.go:768-896; conditions are the
VERBATIM OTTL strings compiled by our frontend. Expected sink contents
follow the goldens: first-match-wins, matched rows leave the stream,
leftovers to the default route.
"""

import pytest

from opentelemetry_collector_contrib_spark.functions.ottl import Compiler, PathResolver
from opentelemetry_collector_contrib_spark.operators.connectors import Route, route_fanout


@pytest.fixture(scope="module")
def logs8(spark):
    rows = [
        (f"resource{r}", f"scope{s}", f"log{l}")
        for r in "AB" for s in "CD" for l in "EF"
    ]
    return spark.createDataFrame(rows, "resourceName string, scope_name string, body string")


def _routes(df, *pairs):
    c = Compiler(PathResolver(df))
    return [Route(name, c.compile_condition(cond)) for name, cond in pairs]


def _bodies(sinks, name, df8):
    if name not in sinks:
        return []
    return sorted(
        (r.resourceName, r.scope_name, r.body) for r in sinks[name].collect()
    )


ALL8 = sorted(
    (f"resource{r}", f"scope{s}", f"log{l}") for r in "AB" for s in "CD" for l in "EF"
)
ONLY_E = [t for t in ALL8 if t[2] == "logE"]
ONLY_F = [t for t in ALL8 if t[2] == "logF"]


class TestRoutingGolden:
    def test_all_match_first_only(self, logs8):
        routes = _routes(logs8, ("sink0", "true"), ("sink1", 'body == "logY"'))
        s = route_fanout(logs8, routes)
        assert _bodies(s, "sink0", logs8) == ALL8
        assert _bodies(s, "sink1", logs8) == []
        assert _bodies(s, "default", logs8) == []

    def test_all_match_last_only(self, logs8):
        routes = _routes(logs8, ("sink0", 'body == "logX"'), ("sink1", "true"))
        s = route_fanout(logs8, routes)
        assert _bodies(s, "sink0", logs8) == []
        assert _bodies(s, "sink1", logs8) == ALL8
        assert _bodies(s, "default", logs8) == []

    def test_all_match_only_once(self, logs8):
        # logs_test.go:792 — first route consumes; OR-condition route starves
        routes = _routes(
            logs8, ("sink0", "true"), ("sink1", 'body == "logE" or body == "logF"')
        )
        s = route_fanout(logs8, routes)
        assert _bodies(s, "sink0", logs8) == ALL8
        assert _bodies(s, "sink1", logs8) == []

    def test_each_matches_one(self, logs8):
        routes = _routes(logs8, ("sink0", 'body == "logE"'), ("sink1", 'body == "logF"'))
        s = route_fanout(logs8, routes)
        assert _bodies(s, "sink0", logs8) == ONLY_E
        assert _bodies(s, "sink1", logs8) == ONLY_F
        assert _bodies(s, "default", logs8) == []

    def test_some_match_with_default(self, logs8):
        routes = _routes(logs8, ("sink0", 'body == "logX"'), ("sink1", 'body == "logF"'))
        s = route_fanout(logs8, routes)
        assert _bodies(s, "sink0", logs8) == []
        assert _bodies(s, "sink1", logs8) == ONLY_F
        assert _bodies(s, "default", logs8) == ONLY_E

    def test_match_none_with_default(self, logs8):
        routes = _routes(logs8, ("sink0", 'body == "logX"'), ("sink1", 'body == "logY"'))
        s = route_fanout(logs8, routes)
        assert _bodies(s, "sink0", logs8) == []
        assert _bodies(s, "sink1", logs8) == []
        assert _bodies(s, "default", logs8) == ALL8

    def test_with_resource_condition(self, logs8):
        routes = _routes(
            logs8,
            ("sink0", 'body == "logE" and resource.attributes["resourceName"] == "resourceB"'),
        )
        s = route_fanout(logs8, routes)
        assert _bodies(s, "sink0", logs8) == [t for t in ONLY_E if t[0] == "resourceB"]
        assert _bodies(s, "default", logs8) == sorted(ONLY_F + [t for t in ONLY_E if t[0] == "resourceA"])

    def test_is_string_condition(self, logs8):
        # logs_test.go:584 isBodyString — standard-converter regression guard
        routes = _routes(logs8, ("sink0", "IsString(body) == true"))
        s = route_fanout(logs8, routes)
        assert _bodies(s, "sink0", logs8) == ALL8

    def test_error_mode_ignore_null_condition(self, logs8):
        # eval error/null ⇒ no match (logs.go:103-106); a null-producing
        # comparison must not leak rows out of the default route
        from pyspark.sql import functions as F

        routes = [Route("sink0", F.col("resourceName").substr(100, 1) == "Z")]
        s = route_fanout(logs8, routes)
        assert _bodies(s, "sink0", logs8) == []
        assert _bodies(s, "default", logs8) == ALL8
