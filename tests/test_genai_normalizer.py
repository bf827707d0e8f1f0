"""genainormalizer processor parity tests.

Mirrors ``processor/genainormalizerprocessor/processor_test.go`` cases over
the flat map<string,string> attribute model (finish-reason slice wrap,
operation-name folding, custom sources, coercion drops, overwrite gating,
flattened-message reconstruction)."""

from __future__ import annotations

import json

from opentelemetry_collector_contrib_spark.operators.genai import genai_normalize

SCHEMA = "id int, attributes map<string,string>"


def _run(spark, attrs: dict, sources: list[dict]) -> dict:
    df = spark.createDataFrame([(1, attrs)], SCHEMA)
    return genai_normalize(df, sources).collect()[0]["attributes"]


def test_openinference_full_span(spark):
    out = _run(
        spark,
        {
            "llm.token_count.prompt": "42",
            "llm.token_count.completion": "7",
            "llm.model_name": "gpt-x",
            "llm.provider": "anthropic",
            "session.id": "s-1",
            "openinference.span.kind": "LLM",
            "http.method": "POST",
        },
        [{"name": "openinference", "remove_originals": True}],
    )
    assert out["gen_ai.usage.input_tokens"] == "42"
    assert out["gen_ai.usage.output_tokens"] == "7"
    assert out["gen_ai.request.model"] == "gpt-x"
    assert out["gen_ai.provider.name"] == "anthropic"
    assert out["gen_ai.conversation.id"] == "s-1"
    # span-kind fold is case-insensitive (valuemappings.go Transform)
    assert out["gen_ai.operation.name"] == "chat"
    assert out["http.method"] == "POST"  # untouched passenger
    assert "llm.model_name" not in out and "openinference.span.kind" not in out


def test_openllmetry_finish_reason_wraps_to_slice(spark):
    # TestNormalize_OpenLLMetry_FinishReasonWrapsToSlice
    out = _run(
        spark,
        {"llm.response.finish_reason": "stop"},
        [{"name": "openllmetry", "remove_originals": True}],
    )
    assert json.loads(out["gen_ai.response.finish_reasons"]) == ["stop"]
    assert "llm.response.finish_reason" not in out


def test_openllmetry_operation_name_folding(spark):
    # TestNormalize_OpenLLMetry_OperationNameFolding
    out = _run(
        spark,
        {"traceloop.span.kind": "workflow"},
        [{"name": "openllmetry", "remove_originals": True}],
    )
    assert out["gen_ai.operation.name"] == "invoke_workflow"
    assert "traceloop.span.kind" not in out


def test_openllmetry_numeric_coercion_and_identity_rename(spark):
    out = _run(
        spark,
        {
            "llm.request.temperature": "0.7",
            "llm.top_k": "40",
            "gen_ai.request.model": "m1",  # identity mapping rewrites itself
            "gen_ai.usage.prompt_tokens": "100",
        },
        [{"name": "openllmetry"}],
    )
    assert out["gen_ai.request.temperature"] == "0.7"
    assert out["gen_ai.request.top_k"] == "40"
    assert out["gen_ai.request.model"] == "m1"
    assert out["gen_ai.usage.input_tokens"] == "100"
    assert out["llm.top_k"] == "40"  # remove_originals defaults false


def test_unsafe_coercion_drops_rename(spark):
    # coerce.go: non-numeric string -> int target drops the rename; the
    # original survives even under remove_originals (only successful
    # mappings delete their source)
    out = _run(
        spark,
        {"llm.token_count.prompt": "not-a-number"},
        [{"name": "openinference", "remove_originals": True}],
    )
    assert "gen_ai.usage.input_tokens" not in out
    assert out["llm.token_count.prompt"] == "not-a-number"


def test_overwrite_false_skips_existing_target(spark):
    out = _run(
        spark,
        {"llm.model_name": "new", "gen_ai.request.model": "existing"},
        [{"name": "openinference"}],
    )
    assert out["gen_ai.request.model"] == "existing"
    out = _run(
        spark,
        {"llm.model_name": "new", "gen_ai.request.model": "existing"},
        [{"name": "openinference", "overwrite": True}],
    )
    assert out["gen_ai.request.model"] == "new"


def test_custom_source_with_value_mappings(spark):
    # TestNormalize_Custom_RenamesUserDefinedAttribute shape
    src = {
        "name": "my_vendor",
        "remove_originals": True,
        "mappings": {
            "my_vendor.model": "gen_ai.request.model",
            "my_vendor.tokens.in": "gen_ai.usage.input_tokens",
            "my_vendor.op": "gen_ai.operation.name",
        },
        "value_mappings": {"gen_ai.operation.name": {"chat_completion": "chat"}},
    }
    out = _run(
        spark,
        {"my_vendor.model": "m", "my_vendor.tokens.in": "9", "my_vendor.op": "CHAT_COMPLETION"},
        [src],
    )
    assert out == {
        "gen_ai.request.model": "m",
        "gen_ai.usage.input_tokens": "9",
        "gen_ai.operation.name": "chat",
    }


def test_builtin_source_rejects_mapping_overrides(spark):
    import pytest

    df = spark.createDataFrame([(1, {"a": "b"})], SCHEMA)
    with pytest.raises(ValueError, match="rejects mappings"):
        genai_normalize(df, [{"name": "openinference", "mappings": {"a": "b"}}])
    with pytest.raises(ValueError, match="requires mappings"):
        genai_normalize(df, [{"name": "my_vendor"}])


def test_sources_apply_in_order(spark):
    # the second source sees the first source's output; with overwrite=False
    # the first writer wins
    s1 = {"name": "v1", "mappings": {"v1.model": "gen_ai.request.model"}}
    s2 = {"name": "v2", "mappings": {"v2.model": "gen_ai.request.model"}}
    out = _run(spark, {"v1.model": "a", "v2.model": "b"}, [s1, s2])
    assert out["gen_ai.request.model"] == "a"
    out = _run(spark, {"v1.model": "a", "v2.model": "b"}, [s2, s1])
    assert out["gen_ai.request.model"] == "b"


def test_first_mapping_wins_on_target_collision(spark):
    # llm.model_name and embedding.model_name both target
    # gen_ai.request.model within ONE source; the first encountered wins
    # (map-order processing + exists-skip in the reference)
    attrs = {"llm.model_name": "a", "embedding.model_name": "b"}
    df = spark.createDataFrame([(1, attrs)], SCHEMA)
    # entry order of the materialized Spark map defines "first"
    first_key = [k for k, _ in df.collect()[0]["attributes"].items()][0]
    out = genai_normalize(df, [{"name": "openinference"}]).collect()[0]["attributes"]
    assert out["gen_ai.request.model"] == attrs[first_key]
    # and repeated runs agree (deterministic)
    again = genai_normalize(df, [{"name": "openinference"}]).collect()[0]["attributes"]
    assert again["gen_ai.request.model"] == out["gen_ai.request.model"]


def test_message_reconstruction(spark):
    out = _run(
        spark,
        {
            "llm.input_messages.0.message.role": "user",
            "llm.input_messages.0.message.content": "hello",
            "llm.input_messages.1.message.role": "assistant",
            "llm.input_messages.1.message.content": "hi there",
            "llm.output_messages.0.message.role": "assistant",
            "llm.output_messages.0.message.content": "done",
        },
        [{"name": "openinference", "remove_originals": True}],
    )
    msgs = json.loads(out["gen_ai.input.messages"])
    assert [m["role"] for m in msgs] == ["user", "assistant"]
    assert msgs[0]["parts"] == [{"type": "text", "content": "hello"}]
    outs = json.loads(out["gen_ai.output.messages"])
    assert outs[0]["finish_reason"] == ""  # schema-required, source has none
    assert outs[0]["parts"][0]["content"] == "done"
    assert not any(k.startswith("llm.input_messages") for k in out)


def test_structured_messages_pass_through(spark):
    # TestNormalize_OpenLLMetry_StructuredMessagesPassThrough: "any"-typed
    # targets keep whatever shape the source emitted (here: a JSON string)
    payload = json.dumps([{"role": "user", "content": "hi"}])
    out = _run(
        spark,
        {"traceloop.entity.input": payload},
        [{"name": "openllmetry", "remove_originals": True}],
    )
    assert json.loads(out["gen_ai.input.messages"]) == [{"role": "user", "content": "hi"}]


def test_genainormalizer_in_collector_config(spark):
    from opentelemetry_collector_contrib_spark.plans.collector_config import (
        load_collector_config,
    )

    df = spark.createDataFrame(
        [(1, {"traceloop.span.kind": "workflow", "gen_ai.usage.prompt_tokens": "5"})],
        SCHEMA,
    )
    cfg = {
        "receivers": {"inmem": {}},
        "processors": {
            "genainormalizer": {
                "sources": [{"name": "openllmetry", "remove_originals": True}]
            }
        },
        "exporters": {},
        "service": {
            "pipelines": {
                "traces/in": {
                    "receivers": ["inmem"],
                    "processors": ["genainormalizer"],
                    "exporters": [],
                }
            }
        },
    }
    t = load_collector_config(spark, cfg, receiver_frames={"inmem": df})
    out = t.frames["traces/in"].collect()[0]["attributes"]
    assert out == {
        "gen_ai.operation.name": "invoke_workflow",
        "gen_ai.usage.input_tokens": "5",
    }
