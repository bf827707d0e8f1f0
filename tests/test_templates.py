"""Unit tests for template mining / trace assembly / tail sampling.

Reference semantics: processor/drainprocessor/README.md:4-36 (templates),
processor/groupbytraceprocessor (trace assembly),
processor/tailsamplingprocessor/internal/sampling/*.go (policies).
"""

import datetime

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.templates import (
    group_by_trace,
    mine_templates,
    tail_sampling,
    template_col,
)


def _ts(m):
    return datetime.datetime(2024, 1, 1, 0, m)


@pytest.fixture(scope="module")
def spans(spark):
    rows = [
        ("t1", _ts(0), "GET", 200, 12.0),
        ("t1", _ts(5), "GET", 500, 80.0),
        ("t2", _ts(1), "PUT", 200, 5.0),
        ("t3", _ts(2), "DEL", 404, 300.0),
    ]
    return spark.createDataFrame(
        rows, "trace_id string, ts timestamp, method string, status_code int, value double"
    )


class TestTemplates:
    def test_masking(self, spark):
        df = spark.createDataFrame(
            [
                ('conn from 10.1.2.3 took 146ms id=deadbeef99 "hello 42"',),
                ('conn from 10.9.9.9 took 9ms id=cafebabe11 "bye 7"',),
            ],
            "body string",
        )
        out = df.select(template_col(F.col("body")).alias("t")).distinct().collect()
        assert len(out) == 1
        assert out[0].t == 'conn from <IP> took <NUM>ms id=<HEX> <STR>'

    def test_mine_counts_and_example(self, spark):
        df = spark.createDataFrame(
            [("a 1",), ("a 2",), ("b x 3",)], "body string"
        )
        got = {r.template: (r.n, r.example) for r in mine_templates(df).collect()}
        assert got["a <NUM>"] == (2, "a 1")
        assert got["b x <NUM>"] == (1, "b x 3")


class TestDrain:
    """True online Drain (drainprocessor README.md:4-36) vs the masking
    analog, on a fixture whose variable tokens carry NO digits/hex/IP shape
    — masking can't collapse them, Drain clusters by token structure."""

    LINES = [
        "user alice logged in from hostalpha",
        "user bob logged in from hostbeta",
        "user carol logged in from hostgamma",
        "user dave logged in from hostdelta",
        "session closed for peer east",
        "session closed for peer west",
    ]

    def test_tree_clusters_and_generalizes(self):
        # depth=3 routes on ONE leading token — the fixture's 2nd token is
        # variable, which deeper routing would (faithfully to the paper)
        # split into separate leaves
        from opentelemetry_collector_contrib_spark.operators.templates import DrainTree

        tree = DrainTree(depth=3, st=0.4)
        clusters = {}
        for x in self.LINES:
            c = tree.fit(x)
            clusters[id(c)] = c
        tpls = {" ".join(c["tokens"]) for c in clusters.values()}
        assert tpls == {
            "user <*> logged in from <*>",
            "session closed for peer <*>",
        }
        assert sum(c["n"] for c in clusters.values()) == len(self.LINES)

    def test_drain_processor_beats_masking(self, spark):
        from opentelemetry_collector_contrib_spark.operators.templates import (
            drain_processor,
        )

        df = spark.createDataFrame([(x,) for x in self.LINES], "body string")
        # masking analog under-clusters: no digits → every line its own tpl
        assert mine_templates(df).count() == len(self.LINES)
        out = drain_processor(df, "body", depth=3)
        got = {r.body: r.log_record_template for r in out.collect()}
        assert got["user bob logged in from hostbeta"] == "user <*> logged in from <*>"
        assert got["session closed for peer east"] == "session closed for peer <*>"
        # two final clusters, annotation preserves every input row
        assert out.count() == len(self.LINES)
        assert out.select("log_record_template").distinct().count() == 2

    def test_max_templates_overflow_no_nulls(self, spark):
        """Over-limit guard: with max_templates below the local template
        count, every row still gets a (local) template — never NULL — and
        the warning column flags the skipped merge."""
        from opentelemetry_collector_contrib_spark.operators.templates import (
            drain_processor,
        )

        df = spark.createDataFrame([(x,) for x in self.LINES], "body string")
        out = drain_processor(df, "body", depth=3, max_templates=1)
        rows = out.collect()
        assert len(rows) == len(self.LINES)
        assert all(r.log_record_template is not None for r in rows)
        assert all(r.log_record_template_merge_skipped for r in rows)
        # under-limit path reports False on the same column
        ok = drain_processor(df, "body", depth=3)
        assert not any(
            r.log_record_template_merge_skipped for r in ok.collect()
        )

    def test_cross_partition_merge(self, spark):
        """Partition-local trees produce local variants; the merge pass
        unifies them into one template set."""
        from opentelemetry_collector_contrib_spark.operators.templates import (
            drain_processor,
        )

        df = spark.createDataFrame(
            [(x,) for x in self.LINES * 4], "body string"
        ).repartition(6)
        out = drain_processor(df, "body", depth=3)
        assert out.select("log_record_template").distinct().count() == 2


class TestGroupByTrace:
    def test_assembly(self, spans):
        out = {r.trace_id: r for r in group_by_trace(spans, "trace_id", "ts").collect()}
        assert out["t1"].span_count == 2
        assert out["t1"].trace_start == _ts(0) and out["t1"].trace_end == _ts(5)
        # spans sorted by ts inside the trace
        assert [s.method for s in out["t1"].spans] == ["GET", "GET"]
        assert [s.status_code for s in out["t1"].spans] == [200, 500]
        assert out["t2"].span_count == 1


class TestTailSampling:
    def _ids(self, df):
        return sorted({r.trace_id for r in df.select("trace_id").collect()})

    def test_always(self, spans):
        assert self._ids(tail_sampling(spans, [{"type": "always"}])) == ["t1", "t2", "t3"]

    def test_latency(self, spans):
        # t1 spans 5 minutes = 300000 ms; others 0
        out = tail_sampling(spans, [{"type": "latency", "threshold_ms": 60000}])
        assert self._ids(out) == ["t1"]

    def test_numeric_attribute(self, spans):
        out = tail_sampling(spans, [{"type": "numeric_attribute", "key": "value", "min": 100.0}])
        assert self._ids(out) == ["t3"]

    def test_string_attribute(self, spans):
        out = tail_sampling(spans, [{"type": "string_attribute", "key": "method", "values": ["PUT"]}])
        assert self._ids(out) == ["t2"]

    def test_status_code(self, spans):
        out = tail_sampling(spans, [{"type": "status_code", "values": [500, 404]}])
        assert self._ids(out) == ["t1", "t3"]

    def test_or_combination(self, spans):
        out = tail_sampling(
            spans,
            [
                {"type": "string_attribute", "key": "method", "values": ["PUT"]},
                {"type": "latency", "threshold_ms": 60000},
            ],
        )
        assert self._ids(out) == ["t1", "t2"]

    def test_span_count_min_only(self, spans):
        """span_count_sampler.go:37-44: max==0 ⇒ count >= min."""
        out = tail_sampling(spans, [{"type": "span_count", "min_spans": 2}])
        assert self._ids(out) == ["t1"]

    def test_span_count_min_max(self, spans):
        out = tail_sampling(spans, [{"type": "span_count", "min_spans": 1, "max_spans": 1}])
        assert self._ids(out) == ["t2", "t3"]

    def test_latency_strictly_greater(self, spans):
        """latency.go:52-53: duration must be STRICTLY > threshold."""
        out = tail_sampling(spans, [{"type": "latency", "threshold_ms": 300000}])
        assert self._ids(out) == []  # t1 is exactly 300000 ms

    def test_latency_upper_bound(self, spans):
        """latency.go:55: threshold < d <= upper."""
        out = tail_sampling(
            spans, [{"type": "latency", "threshold_ms": 1, "upper_threshold_ms": 300000}]
        )
        assert self._ids(out) == ["t1"]

    def test_and_combinator(self, spans):
        """and.go: all sub-policies must sample."""
        out = tail_sampling(
            spans,
            [
                {
                    "type": "and",
                    "policies": [
                        {"type": "status_code", "values": [500, 404]},
                        {"type": "span_count", "min_spans": 2},
                    ],
                }
            ],
        )
        assert self._ids(out) == ["t1"]  # t3 has 404 but 1 span

    def test_not_inverts(self, spans):
        out = tail_sampling(
            spans,
            [
                {
                    "type": "not",
                    "policies": [{"type": "string_attribute", "key": "method", "values": ["PUT"]}],
                }
            ],
        )
        assert self._ids(out) == ["t1", "t3"]

    def test_drop_overrides_sampled(self, spans):
        """drop.go + processor.go:307: Dropped wins over any Sampled."""
        out = tail_sampling(
            spans,
            [
                {"type": "always"},
                {
                    "type": "drop",
                    "policies": [{"type": "string_attribute", "key": "method", "values": ["DEL"]}],
                },
            ],
        )
        assert self._ids(out) == ["t1", "t2"]  # t3 dropped despite always

    def test_drop_requires_all_subs(self, spans):
        """drop.go:33-46: Dropped iff ALL subs sample."""
        out = tail_sampling(
            spans,
            [
                {"type": "always"},
                {
                    "type": "drop",
                    "policies": [
                        {"type": "string_attribute", "key": "method", "values": ["DEL"]},
                        {"type": "span_count", "min_spans": 2},
                    ],
                },
            ],
        )
        assert self._ids(out) == ["t1", "t2", "t3"]  # t3: DEL but 1 span ⇒ not dropped

    def test_ottl_condition(self, spans):
        """ottl.go: compiled OTTL conditions, OR'd, over span rows."""
        out = tail_sampling(
            spans,
            [{"type": "ottl_condition", "conditions": ['method == "PUT"', "value > 250.0"]}],
        )
        assert self._ids(out) == ["t2", "t3"]

    def test_trace_state(self, spark):
        """trace_state_filter.go: W3C tracestate key=value match."""
        df = spark.createDataFrame(
            [
                ("t1", _ts(0), "vendor=alpha,sampled=1"),
                ("t2", _ts(1), "vendor=beta"),
                ("t3", _ts(2), ""),
            ],
            "trace_id string, ts timestamp, trace_state string",
        )
        out = tail_sampling(
            df, [{"type": "trace_state", "key": "vendor", "values": ["alpha"]}]
        )
        assert self._ids(out) == ["t1"]

    def test_rate_limiting_per_second_quota(self, spark):
        """rate_limiting.go batch analog: traces in arrival order keep until
        the arrival-second's cumulative span count exceeds the rate."""
        rows = []
        base = datetime.datetime(2024, 1, 1, 0, 0, 0)
        for i in range(6):  # 6 traces, 2 spans each, all in one second
            for j in range(2):
                rows.append((f"t{i}", base + datetime.timedelta(milliseconds=i * 10 + j),))
        df = spark.createDataFrame(rows, "trace_id string, ts timestamp")
        out = tail_sampling(df, [{"type": "rate_limiting", "spans_per_second": 6}])
        # cumulative spans: t0→2, t1→4, t2→6, t3→8 ✗ — first 3 traces keep
        assert self._ids(out) == ["t0", "t1", "t2"]

    def test_composite_budget_allocation(self, spark):
        """composite.go batch analog: first matching sub-policy claims the
        trace against its per-second span budget."""
        base = datetime.datetime(2024, 1, 1, 0, 0, 0)
        rows = []
        # 4 'err' traces and 4 'ok' traces, 1 span each, same second
        for i in range(4):
            rows.append((f"e{i}", base + datetime.timedelta(milliseconds=i), "err"))
            rows.append((f"o{i}", base + datetime.timedelta(milliseconds=100 + i), "ok"))
        df = spark.createDataFrame(rows, "trace_id string, ts timestamp, kind string")
        out = tail_sampling(
            df,
            [
                {
                    "type": "composite",
                    "max_total_sps": 4,
                    "rate_allocation": [50.0, 50.0],
                    "policies": [
                        {"type": "string_attribute", "key": "kind", "values": ["err"]},
                        {"type": "always"},
                    ],
                }
            ],
        )
        # err budget = ok budget = 2 spans/s: first 2 of each kind keep
        assert self._ids(out) == ["e0", "e1", "o0", "o1"]

    def test_probabilistic_deterministic(self, spans):
        a = self._ids(tail_sampling(spans, [{"type": "probabilistic", "percent": 50, "seed": 7}]))
        b = self._ids(tail_sampling(spans, [{"type": "probabilistic", "percent": 50, "seed": 7}]))
        assert a == b  # re-runnable: same hash, same decision
        full = self._ids(tail_sampling(spans, [{"type": "probabilistic", "percent": 100}]))
        assert full == ["t1", "t2", "t3"]


class TestDrainProperties:
    """Pure-Python property tests for DrainTree (hypothesis)."""

    def test_template_always_covers_line(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from opentelemetry_collector_contrib_spark.operators.templates import DrainTree

        word = st.text(alphabet="abcde0123", min_size=1, max_size=5)
        line = st.lists(word, min_size=1, max_size=8).map(" ".join)

        @settings(max_examples=200, deadline=None)
        @given(st.lists(line, min_size=1, max_size=40))
        def run(lines):
            tree = DrainTree(depth=3, st=0.4)
            fits = [(x, tree.fit(x)) for x in lines]
            for x, cluster in fits:
                tokens = x.split()
                tpl = cluster["tokens"]
                # a cluster's template always has the member's token count
                # and every non-wildcard position... may have generalized
                # AFTER this fit; re-fit the same line and check coverage
                assert len(tpl) == len(tokens)
            # final templates cover every line assigned to them: wildcard
            # or exact token at every position
            final = [(x, tree.fit(x)) for x in lines]  # refit: now stable
            for x, cluster in final:
                for t, s in zip(cluster["tokens"], x.split()):
                    assert t == "<*>" or t == s

        run()
