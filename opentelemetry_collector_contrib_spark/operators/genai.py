"""GenAI semantic-convention normalizer.

Reference: ``processor/genainormalizerprocessor`` — rewrites span attributes
emitted by non-OTel GenAI instrumentation (OpenInference, OpenLLMetry, or
user-defined tables) onto the OTel GenAI semantic conventions: ordered
``sources``, each with a key-rename table, per-target value folds (span-kind
enums → ``gen_ai.operation.name``), ``overwrite``/``remove_originals``
knobs, and semconv type coercion that DROPS a rename rather than write a
mistyped value (``internal/otelsemconv/coerce.go``). OpenInference's
flattened chat messages (``llm.input_messages.N.message.*``) are
reconstructed into the ``gen_ai.input.messages`` JSON shape
(``internal/openinference/messages.go``).

Spark mapping: attributes live in one ``map<string,string>`` column, so a
source is ONE projection — explode-free entry transforms (rename CASE chain
+ fold + coercion as Column expressions over ``map_entries``), collision
policy via the shared last-win entry dedup. String-typed storage makes
coercion = validate + canonicalize (``try_cast``): int targets keep
canonical integer text, float targets canonical double text, string-slice
targets wrap the scalar into a JSON array — uncastable values drop the
rename and keep the original, exactly the reference's drop semantics.

Divergences (documented): scope schema_url bookkeeping has no analog in the
flat model; message reconstruction covers the role/name/content text parts
(the reference also folds flattened tool_call.* message parts).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .parsers import dedup_entries_last_win

#: OTel GenAI target keys → coercion class (otelsemconv.go typed() registry;
#: keys whose spec type is "any" are absent and pass through verbatim).
TARGET_TYPES: dict[str, str] = {
    "gen_ai.usage.input_tokens": "int",
    "gen_ai.usage.output_tokens": "int",
    "gen_ai.request.max_tokens": "int",
    "gen_ai.request.top_k": "int",
    "gen_ai.request.temperature": "float",
    "gen_ai.request.top_p": "float",
    "gen_ai.request.frequency_penalty": "float",
    "gen_ai.request.presence_penalty": "float",
    "gen_ai.request.model": "string",
    "gen_ai.response.model": "string",
    "gen_ai.agent.name": "string",
    "gen_ai.conversation.id": "string",
    "gen_ai.tool.name": "string",
    "gen_ai.tool.description": "string",
    "gen_ai.tool.call.id": "string",
    "gen_ai.request.stop_sequences": "string_slice",
    "gen_ai.response.finish_reasons": "string_slice",
}

_OP_NAME = "gen_ai.operation.name"

#: Built-in source tables (internal/openinference/{mappings,valuemappings}.go
#: and internal/openllmetry/ — key strings are the public OpenInference /
#: Traceloop semconv-ai conventions).
BUILTIN_SOURCES: dict[str, dict] = {
    "openinference": {
        "mappings": {
            "llm.token_count.prompt": "gen_ai.usage.input_tokens",
            "llm.token_count.completion": "gen_ai.usage.output_tokens",
            "llm.model_name": "gen_ai.request.model",
            "llm.provider": "gen_ai.provider.name",
            "embedding.model_name": "gen_ai.request.model",
            "tool.name": "gen_ai.tool.name",
            "tool.description": "gen_ai.tool.description",
            "tool_call.function.arguments": "gen_ai.tool.call.arguments",
            "tool_call.id": "gen_ai.tool.call.id",
            "reranker.model_name": "gen_ai.request.model",
            "agent.name": "gen_ai.agent.name",
            "session.id": "gen_ai.conversation.id",
            "openinference.span.kind": _OP_NAME,
        },
        "value_mappings": {
            _OP_NAME: {
                "llm": "chat",
                "embedding": "embeddings",
                "chain": "invoke_agent",
                "retriever": "retrieval",
                "reranker": "retrieval",
                "tool": "execute_tool",
                "agent": "invoke_agent",
                "prompt": "text_completion",
            }
        },
        "message_prefixes": [
            ("llm.input_messages.", "gen_ai.input.messages", False),
            ("llm.output_messages.", "gen_ai.output.messages", True),
        ],
    },
    "openllmetry": {
        "mappings": {
            "gen_ai.usage.prompt_tokens": "gen_ai.usage.input_tokens",
            "gen_ai.usage.completion_tokens": "gen_ai.usage.output_tokens",
            "gen_ai.request.model": "gen_ai.request.model",
            "gen_ai.response.model": "gen_ai.response.model",
            "gen_ai.request.max_tokens": "gen_ai.request.max_tokens",
            "llm.request.temperature": "gen_ai.request.temperature",
            "llm.request.top_p": "gen_ai.request.top_p",
            "llm.top_k": "gen_ai.request.top_k",
            "llm.frequency_penalty": "gen_ai.request.frequency_penalty",
            "llm.presence_penalty": "gen_ai.request.presence_penalty",
            "llm.chat.stop_sequences": "gen_ai.request.stop_sequences",
            "llm.request.functions": "gen_ai.tool.definitions",
            "llm.response.finish_reason": "gen_ai.response.finish_reasons",
            "llm.response.stop_reason": "gen_ai.response.finish_reasons",
            "llm.request.type": _OP_NAME,
            "traceloop.span.kind": _OP_NAME,
            "traceloop.entity.name": "gen_ai.agent.name",
            "traceloop.entity.input": "gen_ai.input.messages",
            "traceloop.entity.output": "gen_ai.output.messages",
        },
        "value_mappings": {
            _OP_NAME: {
                "workflow": "invoke_workflow",
                "task": "invoke_agent",
                "agent": "invoke_agent",
                "tool": "execute_tool",
                "completion": "text_completion",
                "chat": "chat",
                "rerank": "retrieval",
                "embedding": "embeddings",
            }
        },
    },
}


def _coerce(tgt_lit: str, v: Column) -> Column:
    """Validate + canonicalize a string value for a typed target; NULL means
    the rename must drop (coerce.go: unsafe coercion keeps the original)."""
    kind = TARGET_TYPES.get(tgt_lit)
    if kind == "int":
        return v.try_cast("long").cast("string")
    if kind == "float":
        return v.try_cast("double").cast("string")
    if kind == "string_slice":
        # a scalar string wraps into a one-element JSON array
        # (coerceStringSlice); values that already look like a JSON array
        # pass verbatim
        return F.when(v.startswith("["), v).otherwise(F.to_json(F.array(v)))
    return v  # string targets and "any"-typed keys pass verbatim


def _fold(vm: dict[str, dict[str, str]], tgt_lit: str, v: Column) -> Column:
    table = vm.get(tgt_lit)
    if not table:
        return v
    folded = F.lit(None).cast("string")
    for src_v, dst_v in table.items():
        folded = F.when(F.lower(v) == src_v, F.lit(dst_v)).otherwise(folded)
    return F.coalesce(folded, v)  # unmapped values copy verbatim (Transform)


def _apply_source(attrs: Column, source: dict) -> Column:
    mappings: dict[str, str] = source["mappings"]
    vm: dict[str, dict[str, str]] = source.get("value_mappings", {})
    overwrite = bool(source.get("overwrite", False))
    remove_originals = bool(source.get("remove_originals", False))

    def tgt_of(k: Column) -> Column:
        out = F.lit(None).cast("string")
        for s, t in mappings.items():
            out = F.when(k == s, F.lit(t)).otherwise(out)
        return out

    def new_val(k: Column, v: Column) -> Column:
        # per-target fold + coercion, branched compile-time on the target
        out = F.lit(None).cast("string")
        for s, t in mappings.items():
            out = F.when(k == s, _coerce(t, _fold(vm, t, v))).otherwise(out)
        return out

    entries = F.map_entries(attrs)

    def ok(e: Column) -> Column:
        tgt = tgt_of(e["key"])
        cond = tgt.isNotNull() & new_val(e["key"], e["value"]).isNotNull()
        if not overwrite:
            # identity renames (openllmetry maps gen_ai.request.model to
            # itself) always rewrite their own key
            cond = cond & (F.map_contains_key(attrs, tgt) == (tgt == e["key"]))
        return cond

    mapped = F.transform(
        F.filter(entries, ok),
        lambda e: F.struct(
            tgt_of(e["key"]).alias("key"), new_val(e["key"], e["value"]).alias("value")
        ),
    )
    # two sources hitting one target (llm.model_name + embedding.model_name →
    # gen_ai.request.model): the reference writes the first encountered and
    # the overwrite=false check skips the rest — keep the FIRST here too
    # (last-win dedup over the reversed array).
    mapped = F.reverse(dedup_entries_last_win(F.reverse(mapped), "string"))
    kept = F.filter(entries, lambda e: ~ok(e)) if remove_originals else entries
    return F.map_from_entries(
        dedup_entries_last_win(F.concat(kept, mapped), "string")
    )


def _reconstruct_messages(attrs: Column, prefix: str, is_output: bool) -> Column:
    """OpenInference flattened chat messages → GenAI messages JSON
    (messages.go): ``{prefix}{N}.message.{field}`` entries grouped by N in
    ascending order; each message renders role/name + one text part; output
    messages add the schema-required ``finish_reason`` (always "" — the
    source carries none). NULL when no such entries exist."""
    entries = F.filter(
        F.map_entries(attrs), lambda e: e["key"].startswith(prefix)
    )
    parts = lambda e: F.split(e["key"], r"\.")  # noqa: E731
    nseg = len(prefix.strip(".").split("."))
    idx_of = lambda e: F.get(parts(e), nseg).try_cast("int")  # noqa: E731
    field_of = lambda e: F.get(parts(e), nseg + 2)  # noqa: E731

    idxs = F.array_sort(F.array_distinct(F.transform(entries, idx_of)))

    def field_val(i: Column, name: str) -> Column:
        hits = F.filter(
            entries, lambda e: (idx_of(e) == i) & (field_of(e) == F.lit(name))
        )
        return F.get(hits, 0)["value"]

    def msg(i: Column) -> Column:
        fields = [
            field_val(i, "role").alias("role"),
            field_val(i, "name").alias("name"),
            F.array(
                F.struct(
                    F.lit("text").alias("type"),
                    field_val(i, "content").alias("content"),
                )
            ).alias("parts"),
        ]
        if is_output:
            fields.append(F.coalesce(field_val(i, "finish_reason"), F.lit("")).alias("finish_reason"))
        return F.struct(*fields)

    return F.when(F.size(entries) > 0, F.to_json(F.transform(idxs, msg)))


def genai_normalize(
    df: DataFrame, sources: list[dict], attrs_col: str = "attributes"
) -> DataFrame:
    """Apply the ordered normalization sources to ``attrs_col``.

    Each source dict: ``name`` (builtin ``openinference``/``openllmetry`` or
    user-defined), optional ``mappings``/``value_mappings`` (required for —
    and only allowed on — user-defined sources, config.go), ``overwrite``,
    ``remove_originals``.
    """
    col = F.col(attrs_col)
    for spec in sources:
        name = spec["name"]
        builtin = BUILTIN_SOURCES.get(name)
        if builtin is not None:
            if "mappings" in spec or "value_mappings" in spec:
                raise ValueError(f"built-in source {name!r} rejects mappings overrides")
            source = {**builtin, **{k: spec[k] for k in ("overwrite", "remove_originals") if k in spec}}
        else:
            if "mappings" not in spec:
                raise ValueError(f"user-defined source {name!r} requires mappings")
            source = spec
        overwrite = bool(source.get("overwrite", False))
        for prefix, target, is_output in source.get("message_prefixes", []):
            msgs = _reconstruct_messages(col, prefix, is_output)
            write = msgs.isNotNull() & (
                F.lit(overwrite) | ~F.map_contains_key(col, F.lit(target))
            )
            updated = F.map_concat(
                F.map_filter(col, lambda k, v: k != target),
                F.create_map(F.lit(target), msgs),
            )
            col = F.when(write, updated).otherwise(col)
            if source.get("remove_originals", False):
                col = F.map_filter(col, lambda k, v: ~k.startswith(prefix))
        col = _apply_source(col, source)
    return df.withColumn(attrs_col, col)
