"""Log-template mining + trace assembly / tail sampling.

- ``mine_templates``: the drainprocessor analog
  (``processor/drainprocessor/README.md:4-36`` attaches a
  ``log.record.template`` attribute from online Drain clustering). Batch
  rebuild: deterministic masking of variable parts (numbers, hex ids, IPs,
  quoted strings) → template string → hash-groupBy. Unlike online Drain the
  result is order-independent and exactly reproducible — the right trade
  for a columnar engine, and the common production simplification.
- ``drain_processor`` / ``DrainTree``: TRUE online Drain (fixed-depth parse
  tree, similarity-threshold clustering, template generalization) for
  corpora whose variable tokens have no stable numeric/hex/IP shape — one
  tree per partition via mapInPandas, then a cross-partition template-merge
  pass. Use when masking under-clusters; default stays the masking analog.
- ``group_by_trace``: ``processor/groupbytraceprocessor`` — buffer spans
  until the trace is complete, emit whole traces ⇒ batch = groupBy(trace_id)
  with span collection; streaming = session window on trace_id.
- ``tail_sampling``: ``processor/tailsamplingprocessor`` policy subset
  {latency, numeric_attribute, string_attribute, status_code,
  probabilistic, always} evaluated per assembled trace, keep-list
  semi-joined back to spans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# masking order matters: quoted strings first (may contain digits), then
# ips (before plain numbers), hex ids, numbers.
_MASKS = [
    (r'"[^"]*"', "<STR>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\b[0-9a-fA-F]{8,}\b", "<HEX>"),
    (r"\d+(?:\.\d+)?", "<NUM>"),  # no \b: catches '146ms', '8080/tcp' too
]


def template_col(text: Column) -> Column:
    out = text
    for pat, repl in _MASKS:
        out = F.regexp_replace(out, pat, repl)
    return out


def mine_templates(df: DataFrame, text_col: str = "body") -> DataFrame:
    """text → (template, count, example). One hash-agg; shuffle carries
    (template, partial count, one example) — bytes ≈ template cardinality."""
    return (
        df.withColumn("template", template_col(F.col(text_col)))
        .groupBy("template")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(text_col).alias("example"),
        )
    )


class DrainTree:
    """Online Drain log clustering (He et al., ICWS 2017 — the algorithm
    behind ``processor/drainprocessor/README.md:4-36``; parameters map to
    the processor config: tree_depth, merge_threshold=st, max_node_children).

    Pure-Python, used per partition inside mapInPandas and again for the
    cross-partition template merge. Internal levels route on the first
    ``depth-2`` tokens (digit-bearing tokens wildcarded, child fan-out
    capped with a ``<*>`` overflow child), leaves hold clusters matched by
    token-wise similarity ≥ ``st``; a match generalizes the cluster template
    (differing positions become ``<*>``).
    """

    WILD = "<*>"

    def __init__(self, depth: int = 4, st: float = 0.4, max_children: int = 100):
        if depth < 3:
            raise ValueError("tree_depth minimum is 3")
        self.depth = depth
        self.st = st
        self.max_children = max_children
        self.root: dict = {}

    @staticmethod
    def _has_digit(tok: str) -> bool:
        return any(c.isdigit() for c in tok)

    def _leaf(self, tokens: list[str]) -> list:
        node = self.root.setdefault(len(tokens), {})
        for i in range(min(self.depth - 2, len(tokens))):
            tok = self.WILD if self._has_digit(tokens[i]) else tokens[i]
            children = node.setdefault("c", {})
            if tok not in children:
                if len(children) >= self.max_children:
                    tok = self.WILD
                    children.setdefault(tok, {})
                else:
                    children[tok] = {}
            node = children[tok]
        return node.setdefault("g", [])

    def _seq_sim(self, tpl: list[str], seq: list[str]) -> tuple[float, int]:
        sim = n_par = 0
        for t, s in zip(tpl, seq):
            if t == self.WILD:
                n_par += 1
            elif t == s:
                sim += 1
        return sim / len(seq), n_par

    def fit(self, line: str) -> dict:
        """Add one line; returns its (mutable) cluster — read
        ``cluster["tokens"]`` for the template at this point in the stream
        (the processor annotates with the CURRENT template; earlier records
        keep the less-refined one, exactly the online behavior)."""
        tokens = line.split()
        if not tokens:
            tokens = [""]
        leaf = self._leaf(tokens)
        best, best_key = None, (-1.0, -1)
        for cluster in leaf:
            sim, n_par = self._seq_sim(cluster["tokens"], tokens)
            if sim >= self.st and (sim, n_par) > best_key:
                best, best_key = cluster, (sim, n_par)
        if best is None:
            best = {"tokens": list(tokens), "n": 0}
            leaf.append(best)
        else:
            best["tokens"] = [
                t if t == s else self.WILD for t, s in zip(best["tokens"], tokens)
            ]
        best["n"] += 1
        return best


def drain_processor(
    df: DataFrame,
    text_col: str = "body",
    depth: int = 4,
    st: float = 0.4,
    max_children: int = 100,
    template_attribute: str = "log_record_template",
    max_templates: int = 100_000,
) -> DataFrame:
    """True online Drain as a processor: annotate every record with its
    cluster template (``log.record.template`` → flat column).

    Distributed shape: (1) one Drain tree PER PARTITION inside mapInPandas —
    online, no shuffle, state bounded by local template cardinality;
    (2) the distinct partition-local templates (small — template cardinality,
    not row count) are merged by a second Drain pass over the templates
    themselves, unifying near-identical local variants; (3) the
    local→merged mapping joins back as a broadcast. At 100 TB the only
    non-narrow step is the broadcast of a template dictionary.

    The order-sensitivity of online Drain is confined to partition-local
    annotation (the reference processor is order-sensitive the same way);
    the merge pass runs over a SORTED template list so the final template
    set is reproducible given the same local templates.

    Falls back to the partition-local templates (identity merge) if the
    template set exceeds ``max_templates`` — a guard against unbounded
    driver state on pathological corpora, reported via a
    ``<template_attribute>_merge_skipped`` warning column (always present,
    so the schema does not depend on the data) rather than silence.
    """
    import pandas as pd  # noqa: F401 — mapInPandas batch type

    from pyspark.sql import types as T

    spark = df.sparkSession
    out_fields = df.schema.fields + [T.StructField("_local_tpl", T.StringType())]
    out_schema = T.StructType(out_fields)

    def annotate(batches):
        tree = DrainTree(depth=depth, st=st, max_children=max_children)
        for pdf in batches:
            texts = pdf[text_col].astype(str)
            pdf = pdf.copy()
            pdf["_local_tpl"] = [" ".join(tree.fit(x)["tokens"]) for x in texts]
            yield pdf

    # persist: the annotate pass is order-sensitive per partition, so it must
    # run ONCE — the distinct-collect below and the final join must see the
    # same local templates (an unpersisted recompute could emit templates
    # absent from the mapping → NULLs after the join)
    staged = df.mapInPandas(annotate, out_schema).persist()
    warn_col = f"{template_attribute}_merge_skipped"

    # merge pass: Drain over the distinct local templates (deterministic:
    # sorted input), then broadcast the local→merged mapping back
    local = [r[0] for r in staged.select("_local_tpl").distinct().limit(max_templates + 1).collect()]
    if len(local) > max_templates:
        # over-limit: no join at all (a truncated mapping would NULL every
        # template beyond the cap) — the local template IS the annotation
        return (
            staged.withColumnRenamed("_local_tpl", template_attribute)
            .withColumn(warn_col, F.lit(True))
        )
    if not local:  # empty input: nothing to merge (createDataFrame([]) would throw)
        return (
            staged.withColumnRenamed("_local_tpl", template_attribute)
            .withColumn(warn_col, F.lit(False))
        )
    tree = DrainTree(depth=depth, st=st, max_children=max_children)
    fits = {t: tree.fit(t) for t in sorted(local)}
    merged_map = {t: " ".join(c["tokens"]) for t, c in fits.items()}
    mapping = spark.createDataFrame(
        list(merged_map.items()), ["_local_tpl", template_attribute]
    )
    return (
        staged.join(F.broadcast(mapping), on="_local_tpl", how="left")
        # belt-and-braces: a local template can never miss the mapping (staged
        # is persisted), but degrade to the local template rather than NULL
        .withColumn(
            template_attribute, F.coalesce(template_attribute, "_local_tpl")
        )
        .drop("_local_tpl")
        .withColumn(warn_col, F.lit(False))
    )


def group_by_trace(
    df: DataFrame, trace_col: str = "trace_id", ts_col: str = "ts"
) -> DataFrame:
    """Assemble whole traces: one row per trace with ordered span list.

    ``groupbytraceprocessor`` buffers until timeout; batch sees the whole
    input so assembly is exact. Span order is made deterministic by sorting
    the collected (ts, payload) structs inside the aggregate.
    """
    agg = df.groupBy(trace_col).agg(
        F.count(F.lit(1)).alias("span_count"),
        F.min(ts_col).alias("trace_start"),
        F.max(ts_col).alias("trace_end"),
        F.array_sort(F.collect_list(F.struct(F.col(ts_col).alias("o"), F.struct(*[F.col(c) for c in df.columns if c != trace_col]).alias("span")))).alias("_sp"),
    )
    return agg.withColumn("spans", F.transform("_sp", lambda s: s["span"])).drop("_sp")


#: leaf policies whose predicate is evaluated per SPAN and OR-aggregated to
#: the trace (hasSpanWithCondition, internal/sampling/util.go)
_SPAN_LEVEL = (
    "numeric_attribute",
    "string_attribute",
    "boolean_attribute",
    "status_code",
    "trace_state",
    "ottl_condition",
)

#: combinators that carry sub-policies
_COMBINATORS = ("and", "drop", "not", "composite")


def tail_sampling(
    spans: DataFrame,
    policies: list[dict],
    trace_col: str = "trace_id",
    ts_col: str = "ts",
    tracestate_col: str = "trace_state",
) -> DataFrame:
    """Keep spans of traces per the tailsamplingprocessor decision rule:
    sampled by ANY top-level policy AND not Dropped (drop takes precedence
    over every other decision, ``processor.go:307``).

    Policy dicts (``internal/sampling/*.go``):
      {type: always}
      {type: latency, threshold_ms, upper_threshold_ms?}      — latency.go:52-55
        (strictly > threshold; with upper: threshold < d <= upper)
      {type: numeric_attribute, key, min?, max?}              — any span in range
      {type: string_attribute, key, values}                   — any span matches
      {type: boolean_attribute, key, value}                   — boolean_tag_filter.go
      {type: status_code, values, key?}                       — any span status in set
      {type: trace_state, key, values}                        — W3C tracestate k=v
      {type: ottl_condition, conditions: [str]}               — OTTL compiled, OR'd,
        error_mode=ignore (ottl.go)
      {type: span_count, min_spans, max_spans?}               — span_count_sampler.go:37-44
      {type: probabilistic, percent, seed?}                   — xxhash64 bucket
      {type: rate_limiting, spans_per_second}                 — rate_limiting.go; the
        token bucket becomes a per-arrival-second quota: traces in arrival
        order keep until the second's cumulative span count exceeds the rate
        (deterministic + partition-parallel per second; documented divergence
        from the continuous-refill bucket)
      {type: and, policies: [...]}                            — all subs sample (and.go)
      {type: not, policies: [p]}                              — invert sub (not.go)
      {type: drop, policies: [...]}                           — Dropped iff ALL subs
        sample; Dropped overrides any Sampled (drop.go)
      {type: composite, max_total_sps, policies: [...],
       rate_allocation?: [percent,...]}                       — first matching
        sub-policy in order claims the trace against its per-second span
        budget (composite.go rate allocation, batch form)

    Decisions are per assembled trace; the keep-list semi-joins back onto
    spans (broadcastable at realistic kept-trace cardinality).
    """
    # ---- collect span-level leaf predicates (flag id per leaf dict) ----
    span_flags: list[tuple[str, Column]] = []
    flag_of: dict[int, str] = {}

    def collect(p: dict) -> None:
        t = p["type"]
        if t in _SPAN_LEVEL:
            name = f"_p{len(span_flags)}"
            span_flags.append((name, _span_pred(p, spans, tracestate_col)))
            flag_of[id(p)] = name
        elif t in _COMBINATORS:
            for sp in p["policies"]:
                collect(sp)

    for p in policies:
        collect(p)

    ts = F.col(ts_col).cast("timestamp")
    per_trace = spans.groupBy(trace_col).agg(
        ((F.unix_micros(F.max(ts)) - F.unix_micros(F.min(ts))) / 1000.0).alias("_dur_ms"),
        F.count(F.lit(1)).alias("_span_count"),
        F.min(ts).alias("_arrival"),
        *[F.max(pred.cast("int")).alias(name) for name, pred in span_flags],
    )

    def ev(p: dict) -> Column:
        """Per-trace Sampled condition for one policy."""
        t = p["type"]
        if t == "always":
            return F.lit(True)
        if t == "latency":
            d = F.col("_dur_ms")
            upper = p.get("upper_threshold_ms", 0)
            if upper:
                return (d > p["threshold_ms"]) & (d <= upper)
            return d > p["threshold_ms"]
        if t == "span_count":
            c = F.col("_span_count")
            mx = p.get("max_spans", 0)
            return (c >= p["min_spans"]) & ((c <= mx) if mx else F.lit(True))
        if t == "probabilistic":
            threshold = int(p["percent"] / 100.0 * 16384)
            return (
                F.pmod(F.xxhash64(F.col(trace_col), F.lit(p.get("seed", 1))), F.lit(16384))
                < threshold
            )
        if t in _SPAN_LEVEL:
            return F.col(flag_of[id(p)]) == 1
        if t == "rate_limiting":
            sps = p["spans_per_second"]
            second = F.unix_timestamp(F.col("_arrival"))
            w = (
                Window.partitionBy(second)
                .orderBy(F.col("_arrival"), F.col(trace_col))
                .rowsBetween(Window.unboundedPreceding, 0)
            )
            return F.sum("_span_count").over(w) <= sps
        if t == "and":
            cond = F.lit(True)
            for sp in p["policies"]:
                cond = cond & ev(sp)
            return cond
        if t == "not":
            return ~ev(p["policies"][0])
        if t == "composite":
            subs = p["policies"]
            sub_conds = [ev(sp) for sp in subs]
            pct = p.get("rate_allocation") or [100.0 / len(subs)] * len(subs)
            budgets = [p["max_total_sps"] * x / 100.0 for x in pct]
            assigned = F.lit(None).cast("int")
            for i in reversed(range(len(subs))):
                assigned = F.when(sub_conds[i], F.lit(i)).otherwise(assigned)
            second = F.unix_timestamp(F.col("_arrival"))
            w = (
                Window.partitionBy(second, assigned)
                .orderBy(F.col("_arrival"), F.col(trace_col))
                .rowsBetween(Window.unboundedPreceding, 0)
            )
            cum = F.sum("_span_count").over(w)
            budget = F.lit(None).cast("double")
            for i in reversed(range(len(subs))):
                budget = F.when(assigned == i, F.lit(budgets[i])).otherwise(budget)
            return assigned.isNotNull() & (cum <= budget)
        raise ValueError(f"unknown policy {t!r}")

    sampled = None
    dropped = None
    for p in policies:
        if p["type"] == "drop":
            # Dropped iff ALL sub-policies sample (drop.go:33-46)
            cond = F.lit(True)
            for sp in p["policies"]:
                cond = cond & ev(sp)
            dropped = cond if dropped is None else (dropped | cond)
        else:
            c = ev(p)
            sampled = c if sampled is None else (sampled | c)
    keep = sampled if sampled is not None else F.lit(False)
    if dropped is not None:
        keep = keep & ~dropped
    # window-backed policies (rate_limiting/composite) can't sit in a WHERE:
    # materialize the decision column, then filter
    kept_ids = (
        per_trace.withColumn("_keep", keep).filter(F.col("_keep")).select(trace_col)
    )
    return spans.join(kept_ids, trace_col, "left_semi")


def _span_pred(p: dict, spans: DataFrame, tracestate_col: str) -> Column:
    t = p["type"]
    if t == "numeric_attribute":
        c = F.col(p["key"]).cast("double")
        cond = F.lit(True)
        if "min" in p:
            cond = cond & (c >= p["min"])
        if "max" in p:
            cond = cond & (c <= p["max"])
        return cond & c.isNotNull()
    if t == "string_attribute":
        return F.col(p["key"]).isin(p["values"])
    if t == "boolean_attribute":
        return F.col(p["key"]).cast("boolean") == bool(p["value"])
    if t == "status_code":
        return F.col(p.get("key", "status_code")).isin(p["values"])
    if t == "trace_state":
        # W3C tracestate "k1=v1,k2=v2" (trace_state_filter.go:47-58)
        m = F.str_to_map(F.col(tracestate_col), F.lit(","), F.lit("="))
        return F.element_at(m, p["key"]).isin(p["values"])
    if t == "ottl_condition":
        # ottl.go: OR of compiled conditions, error_mode=ignore ⇒ eval
        # error/null is simply no-match
        from ..functions.ottl import Compiler, PathResolver

        comp = Compiler(PathResolver(spans))
        pred = None
        for s in p["conditions"]:
            c = comp.compile_condition(s)
            c = c & c.isNotNull()
            pred = c if pred is None else (pred | c)
        return pred if pred is not None else F.lit(False)
    raise ValueError(t)


# ---------------------------------------------------------------- dynamic sampling

#: W3C tracestate randomness / threshold width (OTel consistent probability
#: sampling): 56 bits.
_TWO56 = 1 << 56


def _th_hex(t: Column) -> Column:
    """Threshold → trimmed `th` hex per the OTel tracestate spec (trailing
    zeros removed from the 14-digit encoding; T=0 encodes as "0")."""
    h = F.lpad(F.lower(F.conv(t.cast("string"), 10, 16)), 14, "0")
    trimmed = F.regexp_replace(h, "0+$", "")
    return F.when(trimmed == "", F.lit("0")).otherwise(trimmed)


def dynamic_sampling(
    spans: DataFrame,
    rules: list[dict],
    trace_col: str = "trace_id",
    ts_col: str = "ts",
    tracestate_col: str = "trace_state",
    rule_attr: str = "dynamic_sampling_rule",
    window_seconds: float | None = None,
) -> DataFrame:
    """Adaptive tail-based trace sampling — ``processor/dynamicsamplingprocessor``.

    First-match rules route each assembled trace to a sampler; the sampler
    yields a 1-in-N rate; the rate becomes an OTel consistent-probability
    threshold ``T = 2^56 − ⌊2^56/N⌋`` and the trace is kept iff its
    randomness ``R ≥ T`` (R = tracestate ``ot=rv`` when present, else the
    low 56 bits of the trace id — processor README steps 4-7). Kept spans
    carry the matched rule name and a tracestate whose ``ot=th`` is the
    strictest of the incoming and computed thresholds
    (``UpdateTValueWithSampling``, processor.go:742-804); other tracestate
    members and an incoming ``rv`` survive. Unmatched traces drop
    (processor.go:646).

    Rule dicts: ``{name, conditions: [ottl-str], match: any_span|same_span,
    sampler: {type, ...}}`` — ``any_span`` needs every condition satisfied
    by SOME span, ``same_span`` needs one span satisfying all (config.go
    MatchMode). No conditions = catch-all.

    Samplers (internal/sampler/sampler.go; rates clamped ≥ 1):
      * ``always_sample`` — rate 1.
      * ``deterministic`` — rate = max(int(100/sampling_percentage), 1).
      * ``ema_dynamic`` — per-key adaptive rate targeting
        ``goal_sampling_percentage`` on average. Batch analog of
        dynsampler-go's log-weighted average-rate law over THIS batch's
        key counts (the lib's EMA state is wall-clock driven; a batch's
        "recent traffic" is the batch itself): goalCount = N/goalRate,
        goalRatio = goalCount / Σ_k log10(n_k), rate_k =
        round(n_k / (goalRatio·log10(n_k))) — rare keys (n_k = 1) keep
        everything, heavy keys are sampled so Σ n_k/rate_k ≈ goalCount.
      * ``ema_throughput`` / ``windowed_throughput`` — target
        ``goal_throughput_per_sec`` total: goalCount = goal·window, split
        evenly across keys (dynsampler WindowedThroughput), rate_k =
        max(1, round(n_k·numKeys/goalCount)). ``window_seconds`` defaults
        to the batch's span-timestamp range.

    Sampling keys (internal/sampler/key.go): per key attribute, the SORTED
    DISTINCT values across the trace's spans joined by ",", "<missing>"
    when absent; fields joined by "•".

    Scale shape: per-span flags → one trace hash-agg → per-(rule, key)
    hash-agg (cardinality = sampling keys, tiny) broadcast back → semi-join
    of kept trace ids onto spans. No driver state beyond the optional
    2-value window probe.
    """
    from ..functions.ottl import Compiler, PathResolver

    comp = Compiler(PathResolver(spans))
    has_ts_col = tracestate_col in spans.columns

    # ---- per-span rule-condition flags --------------------------------
    flags: list[Column] = []
    per_rule_flag_ids: list[list[int]] = []
    key_fields = sorted({a for r in rules for a in r.get("sampler", {}).get("key_attributes", [])})
    for r in rules:
        ids = []
        for cond in r.get("conditions", []):
            c = comp.compile_condition(cond)
            ids.append(len(flags))
            flags.append((c & c.isNotNull()).alias(f"_dsf{len(flags)}"))
        per_rule_flag_ids.append(ids)

    base = spans.select(
        F.col(trace_col).alias("_tid"),
        F.col(ts_col).alias("_ts"),
        (F.col(tracestate_col) if has_ts_col else F.lit(None).cast("string")).alias("_tstate"),
        *flags,
        *[F.col(k).cast("string").alias(f"_dsk_{i}") for i, k in enumerate(key_fields)],
    )

    # ---- trace assembly: one hash-agg ---------------------------------
    aggs = []
    for ri, (r, ids) in enumerate(zip(rules, per_rule_flag_ids)):
        if not ids:
            continue
        if r.get("match", "any_span") == "same_span":
            one = F.lit(True)
            for i in ids:
                one = one & F.col(f"_dsf{i}")
            aggs.append(F.max(one).alias(f"_dsr{ri}"))
        else:  # any_span: each condition satisfied by some span
            aggs.extend(F.max(F.col(f"_dsf{i}")).alias(f"_dsfm{i}") for i in ids)
    aggs.extend(
        F.array_join(F.array_sort(F.collect_set(f"_dsk_{i}")), ",").alias(f"_dskv_{i}")
        for i in range(len(key_fields))
    )
    aggs.append(F.min("_ts").alias("_ts_min"))
    aggs.append(F.max("_ts").alias("_ts_max"))
    # first non-null tracestate of the trace carries rv / incoming th
    aggs.append(F.first("_tstate", ignorenulls=True).alias("_tstate"))
    traces = base.groupBy("_tid").agg(*aggs)

    def rule_matched(ri: int) -> Column:
        ids = per_rule_flag_ids[ri]
        if not ids:
            return F.lit(True)  # catch-all
        if rules[ri].get("match", "any_span") == "same_span":
            return F.coalesce(F.col(f"_dsr{ri}"), F.lit(False))
        out = F.lit(True)
        for i in ids:
            out = out & F.coalesce(F.col(f"_dsfm{i}"), F.lit(False))
        return out

    ridx = F.lit(None).cast("int")
    for ri in range(len(rules) - 1, -1, -1):
        ridx = F.when(rule_matched(ri), F.lit(ri)).otherwise(ridx)
    traces = traces.withColumn("_ridx", ridx).filter(F.col("_ridx").isNotNull())

    # per-rule sampling key (key.go: fields joined by "•", missing values
    # as "<missing>")
    def key_for(r: dict) -> Column:
        fields = r.get("sampler", {}).get("key_attributes", [])
        if not fields:
            return F.lit("")
        parts = []
        for k in fields:
            v = F.col(f"_dskv_{key_fields.index(k)}")
            parts.append(F.when(v.isNull() | (v == ""), F.lit("<missing>")).otherwise(v))
        return F.concat_ws("•", *parts)

    kcol = F.lit("")
    for ri in range(len(rules) - 1, -1, -1):
        kcol = F.when(F.col("_ridx") == ri, key_for(rules[ri])).otherwise(kcol)
    traces = traces.withColumn("_dskey", kcol)

    # ---- per-(rule, key) adaptive rates --------------------------------
    if window_seconds is None:
        lo, hi = traces.agg(F.min("_ts_min"), F.max("_ts_max")).collect()[0]
        try:
            window_seconds = max(float(hi) - float(lo), 1.0)
        except (TypeError, ValueError):
            window_seconds = max((hi - lo).total_seconds(), 1.0)

    counts = traces.groupBy("_ridx", "_dskey").agg(F.count(F.lit(1)).alias("_n"))
    tot = counts.groupBy("_ridx").agg(
        F.sum("_n").alias("_total"),
        F.sum(F.log10(F.greatest(F.col("_n"), F.lit(1)).cast("double"))).alias("_logsum"),
        F.count(F.lit(1)).alias("_nkeys"),
    )
    # explicit broadcast: tot is ≤ #rules rows, and with a single rule the
    # constant _ridx key would otherwise constant-fold the equi-join into a
    # CartesianProduct over the (possibly large) per-key counts side
    counts = counts.join(F.broadcast(tot), "_ridx")

    def rate_for(r: dict) -> Column:
        s = r.get("sampler", {"type": "always_sample"})
        t = s.get("type", "always_sample")
        if t == "always_sample":
            return F.lit(1.0)
        if t == "deterministic":
            return F.lit(float(max(int(100.0 / s["sampling_percentage"]), 1)))
        n = F.col("_n").cast("double")
        if t == "ema_dynamic":
            goal_rate = 100.0 / s["goal_sampling_percentage"]
            goal_count = F.col("_total") / goal_rate
            goal_ratio = goal_count / F.col("_logsum")
            return F.when(
                n <= 1.0, F.lit(1.0)
            ).otherwise(F.greatest(F.round(n / (goal_ratio * F.log10(n))), F.lit(1.0)))
        if t in ("ema_throughput", "windowed_throughput"):
            goal_count = F.lit(float(s["goal_throughput_per_sec"]) * window_seconds)
            return F.greatest(
                F.round(n * F.col("_nkeys") / goal_count), F.lit(1.0)
            )
        raise ValueError(f"unknown sampler type {t!r}")

    rcol = F.lit(1.0)
    for ri in range(len(rules) - 1, -1, -1):
        rcol = F.when(F.col("_ridx") == ri, rate_for(rules[ri])).otherwise(rcol)
    rates = counts.withColumn("_rate", rcol).select("_ridx", "_dskey", "_rate")
    traces = traces.join(F.broadcast(rates), ["_ridx", "_dskey"])

    # ---- consistent-probability decision -------------------------------
    ot = F.str_to_map(F.coalesce(F.col("_tstate"), F.lit("")), F.lit(","), F.lit("="))
    otv = F.str_to_map(F.coalesce(F.element_at(ot, "ot"), F.lit("")), F.lit(";"), F.lit(":"))
    rv_hex = F.element_at(otv, "rv")
    th_in_hex = F.element_at(otv, "th")
    randomness = F.coalesce(
        F.conv(rv_hex, 16, 10).cast("long"),
        F.conv(F.substring(F.col("_tid"), -14, 14), 16, 10).cast("long"),
    )
    t_computed = (
        F.lit(_TWO56) - F.floor(F.lit(float(_TWO56)) / F.col("_rate"))
    ).cast("long")
    th_in = F.conv(F.rpad(F.coalesce(th_in_hex, F.lit("0")), 14, "0"), 16, 10).cast("long")
    t_final = F.greatest(t_computed, th_in)
    decided = traces.withColumn("_keep", randomness >= t_computed).filter("_keep")

    rname = F.lit(None).cast("string")
    for ri in range(len(rules) - 1, -1, -1):
        rname = F.when(F.col("_ridx") == ri, F.lit(rules[ri].get("name", f"rule_{ri}"))).otherwise(rname)
    new_ot = F.concat(
        F.lit("ot=th:"), _th_hex(t_final),
        F.when(rv_hex.isNotNull(), F.concat(F.lit(";rv:"), rv_hex)).otherwise(F.lit("")),
    )
    # preserve other tracestate vendor members, replace/insert ot
    others = F.filter(
        F.split(F.coalesce(F.col("_tstate"), F.lit("")), ","),
        lambda m: (m != "") & ~m.startswith("ot="),
    )
    full_ts = F.array_join(F.concat(F.array(new_ot), others), ",")
    kept = decided.select(
        F.col("_tid").alias(trace_col),
        rname.alias("__ds_rule"),
        full_ts.alias("__ds_tstate"),
    )
    out = spans.join(F.broadcast(kept), trace_col)
    out = out.withColumn(rule_attr, F.col("__ds_rule")).drop("__ds_rule")
    if has_ts_col:
        out = out.withColumn(tracestate_col, F.col("__ds_tstate"))
    return out.drop("__ds_tstate")
