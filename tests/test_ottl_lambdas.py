"""OTTL lambda converters Filter/MapEach/All/Any/Reduce.

Vectors mirror pkg/ottl/e2e/e2e_test.go:1629-1733 (lambda feature cases).
"""

import pytest

from opentelemetry_collector_contrib_spark.functions.ottl import transform_processor


@pytest.fixture(scope="module")
def row(spark):
    return spark.createDataFrame(
        [
            (
                ["value1", "value2", "value1"],
                {"bar": "x", "baz": "y"},
                [1, 2, 3],
                {"env": "prod"},
            )
        ],
        "vals array<string>, foo map<string,string>, nums array<int>, labels map<string,string>",
    )


class TestFilter:
    def test_filter_slice(self, row):
        out = transform_processor(
            row, ['set(f, Filter(vals, (_, v) => v == "value1"))']
        )
        assert out.first().f == ["value1", "value1"]

    def test_filter_slice_by_index(self, row):
        out = transform_processor(row, ["set(f, Filter(vals, (i, _) => i >= 1))"])
        assert out.first().f == ["value2", "value1"]

    def test_filter_map(self, row):
        out = transform_processor(row, ['set(f, Filter(foo, (k, _) => k == "bar"))'])
        assert out.first().f == {"bar": "x"}


class TestMapEach:
    def test_map_each_slice(self, row):
        out = transform_processor(
            row,
            ['set(m, MapEach(vals, (i, v) => Concat([String(i), ":", v], "")))'],
        )
        assert out.first().m == ["0:value1", "1:value2", "2:value1"]

    def test_map_each_map(self, row):
        out = transform_processor(
            row, ['set(m, MapEach(foo, (k, v) => Concat([k, ":", v], "")))']
        )
        assert sorted(out.first().m) == ["bar:x", "baz:y"]


class TestAllAny:
    def test_all_slice(self, row):
        out = transform_processor(
            row,
            [
                "set(a, All(nums, (_, v) => v > 0))",
                "set(b, All(nums, (_, v) => v > 1))",
            ],
        ).first()
        assert out.a is True and out.b is False

    def test_any_map(self, row):
        out = transform_processor(
            row,
            [
                'set(a, Any(foo, (k, _) => k == "bar"))',
                'set(b, Any(foo, (k, _) => k == "nope"))',
            ],
        ).first()
        assert out.a is True and out.b is False


class TestReduce:
    def test_reduce_slice_sum(self, row):
        # e2e_test.go:1727 — Reduce([1, 2, 3], 0, (acc, _, v) => acc + Int(v))
        out = transform_processor(
            row, ["set(s, Reduce(nums, 0, (acc, _, v) => acc + v))"]
        )
        assert out.first().s == 6

    def test_reduce_literal_list(self, row):
        out = transform_processor(
            row, ["set(s, Reduce([1, 2, 3], 10, (acc, _, v) => acc + v))"]
        )
        assert out.first().s == 16

    def test_reduce_map_concat(self, row):
        # e2e_test.go:1733 — labels → "env=prod;"
        out = transform_processor(
            row,
            ['set(s, Reduce(labels, "", (acc, k, v) => Concat([acc, k, "=", v], "")))'],
        )
        assert out.first().s == "env=prod"
