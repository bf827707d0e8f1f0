"""Port of the countconnector golden-file matrix (logs signal).

Input mirrors connector/countconnector/testdata/logs/input.yaml exactly:
4 resources x 4 log records with the documented attribute lattice
(connector_test.go:583-595). Each case is one Config variant from
TestLogsToMetrics (connector_test.go:596-737); expected datapoints derived
from the goldens (testdata/logs/<case>.yaml) under the comparator's
order-insensitive semantics. Conditions are compiled from the VERBATIM
reference OTTL strings by our compiler.
"""

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.functions.ottl import Compiler, PathResolver
from opentelemetry_collector_contrib_spark.operators.connectors import (
    CountMetric,
    count_connector,
)

RES = [("foo", "bar"), ("foo", "notbar"), ("notfoo", None), (None, None)]
LOGS = [("foo", "bar"), ("foo", "notbar"), ("notfoo", None), (None, None)]


@pytest.fixture(scope="module")
def logs16(spark):
    rows = [(rr, ro, lr, lo) for rr, ro in RES for lr, lo in LOGS]
    return spark.createDataFrame(
        rows,
        "resource_required string, resource_optional string,"
        " log_required string, log_optional string",
    )


def _cond(df, s):
    return Compiler(PathResolver(df)).compile_condition(s)


def _run(df, metric):
    out = count_connector(
        df, [metric], resource_cols=["resource_required", "resource_optional"]
    )[metric.name]
    return {tuple(r)[:-1]: r["count"] for r in out.collect()}


R1, R2, R3, R4 = ("foo", "bar"), ("foo", "notbar"), ("notfoo", None), (None, None)


class TestCountConnectorGolden:
    def test_zero_conditions(self, logs16):
        got = _run(logs16, CountMetric(name="log.record.count"))
        assert got == {R1: 4, R2: 4, R3: 4, R4: 4}

    def test_one_condition(self, logs16):
        c = _cond(logs16, 'resource.attributes["resource.optional"] != nil')
        got = _run(logs16, CountMetric(name="count.if", conditions=[c]))
        assert got == {R1: 4, R2: 4}

    def test_multiple_conditions(self, logs16):
        cs = [
            _cond(logs16, 'resource.attributes["resource.optional"] != nil'),
            _cond(logs16, 'attributes["log.optional"] != nil'),
        ]
        got = _run(logs16, CountMetric(name="count.if", conditions=cs))
        assert got == {R1: 4, R2: 4, R3: 2, R4: 2}

    def test_multiple_conditions_path_context(self, logs16):
        # log.attributes[...] — explicit context prefix, same golden
        cs = [
            _cond(logs16, 'resource.attributes["resource.optional"] != nil'),
            _cond(logs16, 'log.attributes["log.optional"] != nil'),
        ]
        got = _run(logs16, CountMetric(name="count.if", conditions=cs))
        assert got == {R1: 4, R2: 4, R3: 2, R4: 2}

    def test_multiple_metrics(self, logs16):
        c = _cond(logs16, 'resource.attributes["resource.optional"] != nil')
        out = count_connector(
            logs16,
            [
                CountMetric(name="count.all"),
                CountMetric(name="count.if", conditions=[c]),
            ],
            resource_cols=["resource_required", "resource_optional"],
        )
        alls = {tuple(r)[:-1]: r["count"] for r in out["count.all"].collect()}
        ifs = {tuple(r)[:-1]: r["count"] for r in out["count.if"].collect()}
        assert alls == {R1: 4, R2: 4, R3: 4, R4: 4}
        assert ifs == {R1: 4, R2: 4}

    def test_one_attribute(self, logs16):
        got = _run(
            logs16, CountMetric(name="log.count.by_attr", dimensions=["log_required"])
        )
        # rows missing log.required are NOT counted (counter.go:57-66)
        assert got == {
            R1 + ("foo",): 2, R1 + ("notfoo",): 1,
            R2 + ("foo",): 2, R2 + ("notfoo",): 1,
            R3 + ("foo",): 2, R3 + ("notfoo",): 1,
            R4 + ("foo",): 2, R4 + ("notfoo",): 1,
        }

    def test_multiple_attributes(self, logs16):
        got = _run(
            logs16,
            CountMetric(
                name="log.count.by_attr", dimensions=["log_required", "log_optional"]
            ),
        )
        expect = {}
        for r in (R1, R2, R3, R4):
            expect[r + ("foo", "bar")] = 1
            expect[r + ("foo", "notbar")] = 1
        assert got == expect

    def test_default_attribute_value(self, logs16):
        got = _run(
            logs16,
            CountMetric(
                name="log.count.by_attr",
                dimensions=["log_required", "log_optional"],
                defaults={"log_optional": "other"},
            ),
        )
        expect = {}
        for r in (R1, R2, R3, R4):
            expect[r + ("foo", "bar")] = 1
            expect[r + ("foo", "notbar")] = 1
            expect[r + ("notfoo", "other")] = 1
        assert got == expect

    def test_condition_and_attribute(self, logs16):
        c = _cond(logs16, 'resource.attributes["resource.optional"] != nil')
        got = _run(
            logs16,
            CountMetric(
                name="log.count.if.by_attr", conditions=[c], dimensions=["log_required"]
            ),
        )
        assert got == {
            R1 + ("foo",): 2, R1 + ("notfoo",): 1,
            R2 + ("foo",): 2, R2 + ("notfoo",): 1,
        }
