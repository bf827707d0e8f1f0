"""Connectors — routing fan-out and count/sum aggregation.

Reference: ``connector/routingconnector`` (first-match-wins move + copy tee),
``connector/countconnector`` / ``sumconnector`` (per-dimension counters).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Route:
    """One routing table entry.

    Reference: ``connector/routingconnector/config.go:32-46,83-111``.
    ``action='move'`` (default): matching rows leave the stream — later routes
    never see them. ``action='copy'``: non-consuming tee.
    ``error_mode='ignore'`` (default): condition evaluation error ⇒ no match
    (``logs.go:103-106``) — we use try_-style null-safe conditions so an
    erroring condition is simply false.
    """

    name: str
    condition: Column
    action: str = "move"


def route_fanout(
    df: DataFrame,
    routes: list[Route],
    default: str = "default",
    out: str = "route_id",
) -> dict[str, DataFrame]:
    """One stream → N DataFrames with exact move/copy semantics.

    Move routes compile to a single when-chain (one pass, mutually exclusive
    branches ⇒ first-match-wins exactly, ``routingconnector/logs.go:64-160``);
    leftovers get the default route (``logs.go:163-164``). Copy routes are
    additional non-consuming filters over the same scan — Spark reuses the
    cached/columnar scan rather than re-reading.

    Returns {sink_name: DataFrame}; the move-routed frame carries ``out`` so a
    single partitionBy(out) write covers all move sinks in one job.
    """
    move_routes = [(r.name, r.condition) for r in routes if r.action == "move"]
    expr = None
    for name, cond in move_routes:
        safe = cond & cond.isNotNull()  # eval error/null ⇒ no match (error_mode=ignore)
        expr = F.when(safe, name) if expr is None else expr.when(safe, name)
    routed = df.withColumn(out, expr.otherwise(F.lit(default)) if expr is not None else F.lit(default))

    sinks: dict[str, DataFrame] = {}
    for name, _ in move_routes:
        sinks[name] = routed.filter(F.col(out) == name)
    sinks[default] = routed.filter(F.col(out) == default)
    # copy routes see the pre-route stream minus nothing (non-consuming),
    # evaluated against rows as they entered the connector.
    for r in routes:
        if r.action == "copy":
            sinks[r.name] = routed.filter(r.condition & r.condition.isNotNull())
    return sinks


def routed_frame(df: DataFrame, routes: list[Route], default: str = "default", out: str = "route_id") -> DataFrame:
    """The single-frame form: just the when-chain route id (move semantics)."""
    move_routes = [(r.name, r.condition) for r in routes if r.action == "move"]
    expr = None
    for name, cond in move_routes:
        safe = cond & cond.isNotNull()
        expr = F.when(safe, name) if expr is None else expr.when(safe, name)
    return df.withColumn(out, expr.otherwise(F.lit(default)) if expr is not None else F.lit(default))


@dataclass
class CountMetric:
    """One countconnector metric definition.

    Reference: ``connector/countconnector/config.go`` — optional OTTL
    conditions (OR'd), dimension attrs with optional default_value; a record
    missing a dimension attr WITHOUT a default is NOT counted
    (``counter.go:57-66``).
    """

    name: str = "log.record.count"
    conditions: list[Column] = field(default_factory=list)
    dimensions: list[str] = field(default_factory=list)
    defaults: dict[str, str] = field(default_factory=dict)


def count_connector(
    df: DataFrame, metrics: list[CountMetric], resource_cols: list[str] | None = None
) -> dict[str, DataFrame]:
    """Per-metric: filter by OR'd conditions, group by (resource, dims), count.

    Reference: ``connector/countconnector/connector.go:192-231``,
    ``counter.go:39-127``. Map-side partial aggregation is automatic
    (HashAggregate partial→final), so the shuffle carries only
    (group, partial_count) — exactly the reference's per-batch counter
    drain, but distributed.
    """
    res = resource_cols or []
    out: dict[str, DataFrame] = {}
    for m in metrics:
        cur = df
        if m.conditions:
            pred = m.conditions[0]
            for c in m.conditions[1:]:
                pred = pred | c
            cur = cur.filter(pred)
        dim_cols = []
        for d in m.dimensions:
            col = F.col(d)
            if d in m.defaults:
                col = F.coalesce(col, F.lit(m.defaults[d]))
            else:
                cur = cur.filter(F.col(d).isNotNull())  # missing dim ⇒ not counted
            dim_cols.append(col.alias(d.replace(".", "_")))
        group = [F.col(c) for c in res] + dim_cols
        if group:
            out[m.name] = cur.groupBy(*group).agg(F.count(F.lit(1)).alias("count"))
        else:
            out[m.name] = cur.agg(F.count(F.lit(1)).alias("count"))
    return out


def sum_connector(
    df: DataFrame,
    source_attribute: str,
    dimensions: list[str],
    condition: Column | None = None,
    name: str = "sum",
) -> DataFrame:
    """Like count but sums a numeric attribute per dims.

    Reference: ``connector/sumconnector/config.go:32-34``.
    """
    cur = df if condition is None else df.filter(condition)
    cur = cur.filter(F.col(source_attribute).isNotNull())
    # Sum in the column's own type: a decimal input stays exact (and
    # partition-order independent); callers choose the type they need.
    return cur.groupBy(*dimensions).agg(F.sum(F.col(source_attribute)).alias(name))


def span_metrics(
    df: DataFrame,
    dimensions: list[str],
    duration_col: str = "duration",
    explicit_buckets: list[float] | None = None,
    exemplars: bool = False,
    trace_col: str | None = None,
) -> DataFrame:
    """spanmetrics connector, explicit-buckets histogram form.

    Reference: ``connector/spanmetricsconnector/config.go:43-141`` — calls
    count + duration histogram per dimension set; optional exemplars attach
    sampled (trace_id, value) points per metric. The batch-deterministic
    exemplar is the MAX-duration span per group (the reference keeps a
    rotating sample; a columnar engine needs a reproducible choice).
    """
    buckets = explicit_buckets or [2, 4, 6, 8, 10, 50, 100, 200, 400, 800, 1000, 2000, 5000, 10000]
    dur = F.col(duration_col)
    aggs = [
        F.count(F.lit(1)).alias("calls"),
        (F.sum(dur.cast("decimal(18,2)")) * 100).cast("bigint").alias("duration_sum_cents"),
    ]
    lo = None
    for b in buckets:
        cond = (dur <= b) if lo is None else ((dur > lo) & (dur <= b))
        aggs.append(F.sum(cond.cast("long")).alias(f"le_{str(b).replace('.', '_')}"))
        lo = b
    aggs.append(F.sum((dur > lo).cast("long")).alias("le_inf"))
    if exemplars:
        tid = F.col(trace_col or dimensions[0])
        aggs.append(F.max_by(tid, dur).alias("exemplar_trace"))
        aggs.append(F.max(dur).alias("exemplar_value"))
    return df.groupBy(*dimensions).agg(*aggs)


def span_metrics_exponential(
    df: DataFrame,
    dimensions: list[str],
    duration_col: str = "duration",
    scale: int = 2,
) -> DataFrame:
    """spanmetrics exponential-histogram form (config.go ``exponential``):
    OTel base-2 exponential buckets, base = 2^(2^-scale); a positive value v
    lands in index i s.t. base^i < v <= base^(i+1), i.e.
    ``ceil(log2(v) * 2^scale) - 1``. Pure Column math (log2 + ceil) — one
    hash-agg over (dims, bucket_index); zeros/negatives go to the reserved
    zero bucket (index null, counted separately by the caller if needed).
    """
    dur = F.col(duration_col)
    idx = (F.ceil(F.log2(dur) * (2 ** scale)) - 1).cast("bigint")
    return (
        df.filter(dur > 0)
        .withColumn("bucket_idx", idx)
        .groupBy(*dimensions, "bucket_idx")
        .agg(F.count(F.lit(1)).alias("bucket_count"))
    )


def load_balancing_bucket(
    df: DataFrame, routing_key: str, num_endpoints: int, out: str = "endpoint"
) -> DataFrame:
    """loadbalancingexporter: deterministic endpoint assignment by key hash.

    Reference: ``exporter/loadbalancingexporter/config.go:17-53`` — a
    consistent-hash ring keyed by routing_key (traceID/resource attrs)
    spreads a stream over N downstream endpoints. Batch form: a stable
    bucket column (md5-derived so any engine reproduces it), which also
    doubles as the explicit repartition key for co-located writes:
    ``df.repartition(num_endpoints, col(out))``.
    """
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col(routing_key).cast("string").cast("binary")), 1, 8), 16, 10)
        .cast("long"),
        F.lit(num_endpoints),
    )
    return df.withColumn(out, bucket.cast("int"))


def fan_in(*dfs: DataFrame) -> DataFrame:
    """Pipeline fan-in: N streams → one consumer (union of pipelines).

    Reference: the collector service graph delivers multiple pipelines to a
    shared consumer; set-op form is a by-name union (SURVEY §2.9).
    """
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out
