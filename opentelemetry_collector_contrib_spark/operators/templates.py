"""Log-template mining + trace assembly / tail sampling.

- ``mine_templates``: the drainprocessor analog
  (``processor/drainprocessor/README.md:4-36`` attaches a
  ``log.record.template`` attribute from online Drain clustering). Batch
  rebuild: deterministic masking of variable parts (numbers, hex ids, IPs,
  quoted strings) → template string → hash-groupBy. Unlike online Drain the
  result is order-independent and exactly reproducible — the right trade
  for a columnar engine, and the common production simplification.
- ``group_by_trace``: ``processor/groupbytraceprocessor`` — buffer spans
  until the trace is complete, emit whole traces ⇒ batch = groupBy(trace_id)
  with span collection; streaming = session window on trace_id.
- ``tail_sampling``: ``processor/tailsamplingprocessor`` policy subset
  {latency, numeric_attribute, string_attribute, status_code,
  probabilistic, always} evaluated per assembled trace, keep-list
  semi-joined back to spans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
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


def tail_sampling(
    spans: DataFrame,
    policies: list[dict],
    trace_col: str = "trace_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Keep spans of traces matching ANY policy (OR across policies, the
    reference's default combination).

    Policy dicts:
      {type: always}
      {type: latency, threshold_ms: N}          — trace duration ≥ N
      {type: numeric_attribute, key, min, max}  — any span in range
      {type: string_attribute, key, values}     — any span matches
      {type: status_code, values}               — any span status in set
      {type: probabilistic, percent, seed}      — xxhash64(trace_id) bucket

    Decisions are per assembled trace (internal/sampling/*.go); the
    keep-list is a broadcastable semi-join back onto spans when trace
    cardinality allows, else a shuffle semi-join.
    """
    per_trace = spans.groupBy(trace_col).agg(
        ((F.unix_micros(F.max(ts_col).cast("timestamp")) - F.unix_micros(F.min(ts_col).cast("timestamp"))) / 1000.0).alias("_dur_ms"),
        *[
            F.max(
                _span_pred(p)
                .cast("int")
            ).alias(f"_p{i}")
            for i, p in enumerate(policies)
            if p["type"] in ("numeric_attribute", "string_attribute", "status_code")
        ],
    )
    keep = None
    pi = 0
    for i, p in enumerate(policies):
        t = p["type"]
        if t == "always":
            cond = F.lit(True)
        elif t == "latency":
            cond = F.col("_dur_ms") >= p["threshold_ms"]
        elif t == "probabilistic":
            threshold = int(p["percent"] / 100.0 * 16384)
            cond = F.pmod(F.xxhash64(F.col(trace_col), F.lit(p.get("seed", 1))), F.lit(16384)) < threshold
        elif t in ("numeric_attribute", "string_attribute", "status_code"):
            cond = F.col(f"_p{i}") == 1
        else:
            raise ValueError(f"unknown policy {t!r}")
        keep = cond if keep is None else (keep | cond)
    kept_ids = per_trace.filter(keep).select(trace_col)
    return spans.join(kept_ids, trace_col, "left_semi")


def _span_pred(p: dict) -> Column:
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
    if t == "status_code":
        return F.col(p.get("key", "status_code")).isin(p["values"])
    raise ValueError(t)
