"""dynamicsampling processor parity tests.

Reference: ``processor/dynamicsamplingprocessor`` — first-match rules →
sampler → 1-in-N rate → OTel consistent-probability threshold (``ot=th``),
decision = randomness ≥ threshold, unmatched traces drop
(processor.go:646), key building per internal/sampler/key.go."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.templates import (
    _TWO56,
    dynamic_sampling,
)

SCHEMA = (
    "trace_id string, span_id string, parent_span_id string, ts double, "
    "service string, status_code string, trace_state string"
)


def _tid(i: int, rand56: int | None = None) -> str:
    """32-hex trace id whose low 56 bits are controllable."""
    head = f"{i:018x}"
    tail = f"{(rand56 if rand56 is not None else (i * 0x9E3779B97F4A7C15)) & ((1 << 56) - 1):014x}"
    return head + tail


def _spans(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_always_sample_catchall_keeps_all_and_stamps(spark):
    rows = [(_tid(i), f"s{i}", "", float(i), "svc", "OK", None) for i in range(20)]
    out = dynamic_sampling(
        _spans(spark, rows), [{"name": "all", "sampler": {"type": "always_sample"}}]
    ).collect()
    assert len(out) == 20
    assert all(r["dynamic_sampling_rule"] == "all" for r in out)
    # rate 1 → threshold 0 → th:0
    assert all(r["trace_state"] == "ot=th:0" for r in out)


def test_unmatched_traces_drop(spark):
    rows = [
        (_tid(1), "a", "", 1.0, "keepme", "OK", None),
        (_tid(2), "b", "", 2.0, "other", "OK", None),
    ]
    rules = [{
        "name": "only-keepme",
        "conditions": ['service == "keepme"'],
        "sampler": {"type": "always_sample"},
    }]
    out = dynamic_sampling(_spans(spark, rows), rules).collect()
    assert {r["service"] for r in out} == {"keepme"}


def test_first_match_wins(spark):
    rows = [(_tid(1), "a", "", 1.0, "svc", "ERROR", None)]
    rules = [
        {"name": "errors", "conditions": ['status_code == "ERROR"'],
         "sampler": {"type": "always_sample"}},
        {"name": "catchall", "sampler": {"type": "always_sample"}},
    ]
    out = dynamic_sampling(_spans(spark, rows), rules).collect()
    assert out[0]["dynamic_sampling_rule"] == "errors"


def test_match_modes(spark):
    # trace 1: ERROR on span a, service=web on span b — any_span matches,
    # same_span does not; trace 2: both on one span — both match
    rows = [
        (_tid(1), "a", "", 1.0, "db", "ERROR", None),
        (_tid(1), "b", "a", 2.0, "web", "OK", None),
        (_tid(2), "c", "", 3.0, "web", "ERROR", None),
    ]
    conds = ['status_code == "ERROR"', 'service == "web"']
    any_out = dynamic_sampling(
        _spans(spark, rows),
        [{"name": "r", "conditions": conds, "match": "any_span",
          "sampler": {"type": "always_sample"}}],
    ).select("trace_id").distinct().count()
    same_out = dynamic_sampling(
        _spans(spark, rows),
        [{"name": "r", "conditions": conds, "match": "same_span",
          "sampler": {"type": "always_sample"}}],
    ).select("trace_id").distinct().count()
    assert any_out == 2
    assert same_out == 1


def test_deterministic_rate_threshold_decision(spark):
    # 25% → rate 4 → T = 2^56 - 2^56/4 = 0.75·2^56. Plant randomness just
    # below and just above the line.
    t = _TWO56 - _TWO56 // 4
    rows = [
        (_tid(1, rand56=t - 1), "a", "", 1.0, "svc", "OK", None),  # dropped
        (_tid(2, rand56=t), "b", "", 2.0, "svc", "OK", None),      # kept (R >= T)
        (_tid(3, rand56=_TWO56 - 1), "c", "", 3.0, "svc", "OK", None),  # kept
    ]
    rules = [{"name": "d", "sampler": {"type": "deterministic", "sampling_percentage": 25.0}}]
    out = dynamic_sampling(_spans(spark, rows), rules).collect()
    kept = {r["span_id"] for r in out}
    assert kept == {"b", "c"}
    # th encoding: 0.75·2^56 = 0xc0000000000000 → trimmed "c"
    assert all(r["trace_state"] == "ot=th:c" for r in out)


def test_rv_tracestate_overrides_trace_id_randomness(spark):
    t = _TWO56 - _TWO56 // 4
    # trace id randomness ABOVE the line, rv BELOW → must drop; and vice versa
    rows = [
        (_tid(1, rand56=_TWO56 - 1), "a", "", 1.0, "svc", "OK",
         f"ot=rv:{t - 1:014x}"),
        (_tid(2, rand56=0), "b", "", 2.0, "svc", "OK",
         f"ot=rv:{_TWO56 - 1:014x}"),
    ]
    rules = [{"name": "d", "sampler": {"type": "deterministic", "sampling_percentage": 25.0}}]
    out = dynamic_sampling(_spans(spark, rows), rules).collect()
    assert {r["span_id"] for r in out} == {"b"}
    # rv preserved in the emitted tracestate
    assert out[0]["trace_state"] == f"ot=th:c;rv:{_TWO56 - 1:014x}"


def test_incoming_stricter_th_is_kept(spark):
    # incoming th:e (stricter than computed c) must survive on the output
    rows = [(_tid(1, rand56=_TWO56 - 1), "a", "", 1.0, "svc", "OK", "ot=th:e,vendor=x")]
    rules = [{"name": "d", "sampler": {"type": "deterministic", "sampling_percentage": 25.0}}]
    out = dynamic_sampling(_spans(spark, rows), rules).collect()
    assert out[0]["trace_state"] == "ot=th:e,vendor=x"


def test_ema_dynamic_rare_keys_keep_heavy_keys_sample(spark):
    # one heavy key (300 traces) + 5 rare keys (1 trace each): rare keys get
    # rate 1 (all kept); the heavy key gets a rate > 1
    rows = []
    n = 0
    for i in range(300):
        rows.append((_tid(n := n + 1), f"s{n}", "", float(n), "heavy", "OK", None))
    for i in range(5):
        rows.append((_tid(n := n + 1), f"s{n}", "", float(n), f"rare{i}", "OK", None))
    rules = [{
        "name": "ema",
        "sampler": {"type": "ema_dynamic", "goal_sampling_percentage": 10.0,
                     "key_attributes": ["service"]},
    }]
    out = dynamic_sampling(_spans(spark, rows), rules)
    kept = {r["service"]: r for r in out.collect()}
    for i in range(5):
        assert f"rare{i}" in kept  # rate 1 → th:0 → everything kept
        assert kept[f"rare{i}"]["trace_state"] == "ot=th:0"
    heavy_kept = out.filter(F.col("service") == "heavy").count()
    assert 0 < heavy_kept < 300  # genuinely sampled
    # every kept heavy span carries the same non-zero threshold
    ths = {r["trace_state"] for r in out.filter(F.col("service") == "heavy").collect()}
    assert len(ths) == 1 and ths != {"ot=th:0"}


def test_windowed_throughput_rate(spark):
    # 200 traces over a 10-second window, goal 5/sec → goalCount 50,
    # one key → rate = round(200/50) = 4 → T = 0.75·2^56
    rows = [
        (_tid(i, rand56=(i * (_TWO56 // 200)) % _TWO56), f"s{i}", "",
         float(i % 11), "svc", "OK", None)
        for i in range(200)
    ]
    rules = [{
        "name": "tp",
        "sampler": {"type": "windowed_throughput", "goal_throughput_per_sec": 5,
                     "key_attributes": ["service"]},
    }]
    out = dynamic_sampling(_spans(spark, rows), rules, window_seconds=10.0)
    got = out.collect()
    assert all(r["trace_state"] == "ot=th:c" for r in got)
    # planted uniform randomness → almost exactly a quarter survives
    assert len(got) == sum(
        1 for i in range(200) if (i * (_TWO56 // 200)) % _TWO56 >= _TWO56 - _TWO56 // 4
    )


def test_key_building_missing_and_multivalue(spark):
    # key.go: distinct values sorted and comma-joined; missing → <missing>;
    # two traces with the same single-key value share one rate bucket
    rows = [
        (_tid(1), "a", "", 1.0, "x", "OK", None),
        (_tid(1), "b", "a", 2.0, "y", "OK", None),  # same trace: key "x,y"
        (_tid(2), "c", "", 3.0, None, "OK", None),  # missing
    ]
    rules = [{
        "name": "k",
        "sampler": {"type": "ema_dynamic", "goal_sampling_percentage": 100.0,
                     "key_attributes": ["service"]},
    }]
    out = dynamic_sampling(_spans(spark, rows), rules)
    # goal 100% → every key rate 1 → all kept; exercise runs the key path
    assert out.select("trace_id").distinct().count() == 2


def test_sampler_validation(spark):
    rows = [(_tid(1), "a", "", 1.0, "svc", "OK", None)]
    with pytest.raises(ValueError, match="unknown sampler"):
        dynamic_sampling(
            _spans(spark, rows), [{"name": "x", "sampler": {"type": "bogus"}}]
        ).collect()


def test_dynamic_sampling_in_collector_config(spark):
    from opentelemetry_collector_contrib_spark.plans.collector_config import (
        load_collector_config,
    )

    rows = [(_tid(i), f"s{i}", "", float(i), "svc", "OK", None) for i in range(10)]
    cfg = {
        "receivers": {"inmem": {}},
        "processors": {
            "dynamic_sampling": {
                "ts_field": "ts",
                "rules": [{"name": "all", "sampler": {"type": "always_sample"}}],
            }
        },
        "exporters": {},
        "service": {
            "pipelines": {
                "traces/in": {
                    "receivers": ["inmem"],
                    "processors": ["dynamic_sampling"],
                    "exporters": [],
                }
            }
        },
    }
    t = load_collector_config(spark, cfg, receiver_frames={"inmem": _spans(spark, rows)})
    out = t.frames["traces/in"].collect()
    assert len(out) == 10 and all(r["dynamic_sampling_rule"] == "all" for r in out)
