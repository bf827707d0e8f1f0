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


@dataclass
class SumMetric:
    """One sumconnector metric definition (``connector/sumconnector/
    config.go`` map[name]MetricInfo: source_attribute, OR'd OTTL conditions,
    dimension attrs with optional default_value)."""

    name: str
    source_attribute: str
    conditions: list[Column] = field(default_factory=list)
    dimensions: list[str] = field(default_factory=list)
    defaults: dict[str, str] = field(default_factory=dict)


def sum_connector_logs(
    df: DataFrame,
    metrics: list[SumMetric],
    resource_cols: list[str] | None = None,
    dim_multiplicity: bool = True,
) -> dict[str, DataFrame]:
    """Reference-shaped sum connector: per metric, every record passing the
    dim-presence check and (OR'd) conditions increments its group — records
    whose source attribute is missing or a non-numeric string contribute
    **0.0**, they are NOT dropped (``sum.go:40-57``: ``sumVal`` stays zero
    when ``attrs.Get`` misses or ``ParseFloat`` fails, and ``increment`` is
    still called). Dims come from record attributes only, no resource
    fallback (``connector.go:185``: ``logRecord.Attributes()``).

    ``dim_multiplicity=True`` (default) reproduces a reference quirk its own
    golden files pin: ``increment`` (sum.go:122-130) loops over the data
    point's attribute KEYS and adds ``sumVal`` once per key, so a metric with
    2 dimension attrs accumulates every record's value twice (verified:
    multiple_attributes.yaml expects 4.2 where the input holds one 2.1).
    Pass False for the arithmetically-sane sum.

    Same distributed shape as :func:`count_connector` — one hash-agg per
    metric, map-side partials, shuffle carries (group, partial_sum) only.
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
                cur = cur.filter(F.col(d).isNotNull())
            dim_cols.append(col.alias(d.replace(".", "_")))
        # try_cast, not cast: ANSI mode makes cast THROW on a malformed
        # string — a single hostile record would abort the job, where
        # sum.go:51 just lets ParseFloat fail and contributes 0
        val = F.coalesce(F.col(m.source_attribute).try_cast("double"), F.lit(0.0))
        if dim_multiplicity and len(m.dimensions) > 1:
            val = val * len(m.dimensions)
        group = [F.col(c) for c in res] + dim_cols
        agg = F.sum(val).alias("sum")
        out[m.name] = cur.groupBy(*group).agg(agg) if group else cur.agg(agg)
    return out


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


# ---------------------------------------------------------------- otlpjson

#: pdata attribute value in OTLP/JSON form (the subset our flat string-map
#: model carries; arrays/kvlists stringify upstream)
_OTLP_ATTR = (
    "array<struct<key:string, value:struct<stringValue:string, intValue:string,"
    " boolValue:boolean, doubleValue:double>>>"
)
_OTLP_LOGS_SCHEMA = (
    "struct<resourceLogs: array<struct<"
    f"resource: struct<attributes: {_OTLP_ATTR}>, "
    "scopeLogs: array<struct<logRecords: array<struct<"
    "timeUnixNano:string, observedTimeUnixNano:string, severityNumber:int, "
    f"severityText:string, body: struct<stringValue:string>, attributes: {_OTLP_ATTR}, "
    "droppedAttributesCount:int, traceId:string, spanId:string>>>>>>>"
)

#: payload sniffers — factory.go:19-21 verbatim
OTLPJSON_LOG_RE = r'^\{\s*"resourceLogs"\s*:\s*\['
OTLPJSON_METRIC_RE = r'^\{\s*"resourceMetrics"\s*:\s*\['
OTLPJSON_TRACE_RE = r'^\{\s*"resourceSpans"\s*:\s*\['


def _otlp_attr_map(attrs: Column) -> Column:
    """OTLP attribute list → map<string,string> (pdata AsString per value:
    booleans lowercase via cast, ints/doubles plain). Duplicate keys in a
    hostile/odd payload keep the last value (pcommon.Map upsert semantics)
    instead of aborting the job with DUPLICATED_MAP_KEY — the reference
    tolerates them (pcommon maps) and skips bad payloads (logs.go:43-79)."""
    from .parsers import dedup_entries_last_win

    return F.map_from_entries(
        dedup_entries_last_win(
            F.transform(
                F.coalesce(attrs, F.array()),
                # named_struct, not struct+alias: aliases are dropped
                # inside HOF lambdas (the field would come out `col2`,
                # breaking the dedup fold's typed concat)
                lambda a: F.named_struct(
                    F.lit("key"),
                    a["key"],
                    F.lit("value"),
                    F.coalesce(
                        a["value"]["stringValue"],
                        a["value"]["intValue"],
                        a["value"]["doubleValue"].cast("string"),
                        a["value"]["boolValue"].cast("string"),
                    ),
                ),
            ),
            "string",
        )
    )


def otlpjson_logs_connector(df: DataFrame, body_col: str = "body") -> DataFrame:
    """``connector/otlpjsonconnector`` (logs→logs): each record whose body is
    an OTLP/JSON Logs payload is unmarshalled and its embedded log records
    re-emitted as flat rows; metric/trace payloads and unparseable bodies are
    skipped, exactly like ``logs.go:43-79`` (which logs and continues).

    Spark shape: regex sniff (``factory.go:19-21``) → ``from_json`` with the
    plog JSON schema → three-level explode (resourceLogs → scopeLogs →
    logRecords) → resource/record attribute maps via map_from_entries. All
    JVM Column work, no UDF; the sniff prunes non-log payloads before the
    parse. explode_outer + post-filter at every level so the inferred
    size>0 scan filters don't re-evaluate from_json per level (the
    dedup.py explode-over-computed-array lesson); a null element also IS a
    legitimate state here (empty resourceLogs/scopeLogs arrays) and the
    post-filters drop it explicitly.
    """
    src = F.col(body_col)
    parsed = df.filter(src.rlike(OTLPJSON_LOG_RE)).select(
        F.from_json(src, _OTLP_LOGS_SCHEMA).alias("_pl")
    )
    rl = (
        parsed.filter(F.col("_pl").isNotNull())
        .select(F.explode_outer("_pl.resourceLogs").alias("_rl"))
        .filter(F.col("_rl").isNotNull())
    )
    lr = (
        rl.select(
            _otlp_attr_map(F.col("_rl.resource.attributes")).alias("resource"),
            F.explode_outer("_rl.scopeLogs").alias("_sl"),
        )
        .filter(F.col("_sl").isNotNull())
        .select("resource", F.explode_outer("_sl.logRecords").alias("_lr"))
        .filter(F.col("_lr").isNotNull())
    )
    return lr.select(
        "resource",
        _otlp_attr_map(F.col("_lr.attributes")).alias("attributes"),
        F.col("_lr.body.stringValue").alias("body"),
        F.col("_lr.severityNumber").alias("severity_number"),
        F.col("_lr.severityText").alias("severity_text"),
        F.col("_lr.traceId").alias("trace_id"),
        F.col("_lr.spanId").alias("span_id"),
        F.col("_lr.timeUnixNano").cast("long").alias("time_unix_nano"),
        F.col("_lr.droppedAttributesCount").alias("dropped_attributes_count"),
    )


_OTLP_DP = (
    f"struct<attributes: {_OTLP_ATTR}, startTimeUnixNano:string, "
    "timeUnixNano:string, asInt:string, asDouble:double>"
)
_OTLP_METRICS_SCHEMA = (
    "struct<resourceMetrics: array<struct<"
    f"resource: struct<attributes: {_OTLP_ATTR}>, "
    "scopeMetrics: array<struct<metrics: array<struct<"
    "name:string, unit:string, "
    f"gauge: struct<dataPoints: array<{_OTLP_DP}>>, "
    "sum: struct<aggregationTemporality:int, isMonotonic:boolean, "
    f"dataPoints: array<{_OTLP_DP}>>>>>>>>>"
)
_OTLP_TRACES_SCHEMA = (
    "struct<resourceSpans: array<struct<"
    f"resource: struct<attributes: {_OTLP_ATTR}>, "
    "scopeSpans: array<struct<spans: array<struct<"
    "traceId:string, spanId:string, parentSpanId:string, name:string, "
    f"kind:int, startTimeUnixNano:string, endTimeUnixNano:string, "
    f"attributes: {_OTLP_ATTR}, "
    "status: struct<code:int, message:string>>>>>>>>"
)


def otlpjson_metrics_connector(df: DataFrame, body_col: str = "body") -> DataFrame:
    """``connector/otlpjsonconnector`` (logs→metrics, ``metrics.go:43-79``):
    records whose body is an OTLP/JSON Metrics payload re-emit their
    embedded NUMBER datapoints as flat rows (gauge + sum with temporality/
    monotonicity); log/trace payloads and unparseable bodies are skipped.
    Same sniff → from_json → explode_outer chain as the logs form — one
    extra level (4: resourceMetrics → scopeMetrics → metrics → dataPoints).
    """
    src = F.col(body_col)
    parsed = df.filter(src.rlike(OTLPJSON_METRIC_RE)).select(
        F.from_json(src, _OTLP_METRICS_SCHEMA).alias("_pm")
    )

    # pdata's unmarshal rejects the WHOLE payload when any datapoint is
    # malformed (connector_test.go "invalid metric" expects 0 outputs for a
    # payload whose asInt isn't an integer) — mirror that with a nested
    # exists over every datapoint's asInt parseability (try_cast: ANSI mode
    # would otherwise throw on the probe itself).
    def _bad_dp(dp):
        return dp["asInt"].isNotNull() & dp["asInt"].try_cast("long").isNull()

    def _bad_metric(m):
        return F.exists(
            F.coalesce(m["gauge"]["dataPoints"], F.array()), _bad_dp
        ) | F.exists(F.coalesce(m["sum"]["dataPoints"], F.array()), _bad_dp)

    bad = F.exists(
        F.coalesce(F.col("_pm.resourceMetrics"), F.array()),
        lambda rm: F.exists(
            F.coalesce(rm["scopeMetrics"], F.array()),
            lambda sm: F.exists(F.coalesce(sm["metrics"], F.array()), _bad_metric),
        ),
    )
    rm = (
        parsed.filter(F.col("_pm").isNotNull() & ~bad)
        .select(F.explode_outer("_pm.resourceMetrics").alias("_rm"))
        .filter(F.col("_rm").isNotNull())
    )
    m = (
        rm.select(
            _otlp_attr_map(F.col("_rm.resource.attributes")).alias("resource"),
            F.explode_outer("_rm.scopeMetrics").alias("_sm"),
        )
        .filter(F.col("_sm").isNotNull())
        .select("resource", F.explode_outer("_sm.metrics").alias("_m"))
        .filter(F.col("_m").isNotNull())
    )
    # gauge/sum union: one row per datapoint with its metric shape
    def _points(kind):
        base = m.filter(F.col(f"_m.{kind}").isNotNull()).select(
            "resource",
            F.col("_m.name").alias("metric_name"),
            F.col("_m.unit").alias("unit"),
            F.lit(kind).alias("mtype"),
            (F.col("_m.sum.isMonotonic") if kind == "sum" else F.lit(None).cast("boolean")).alias("monotonic"),
            (F.col("_m.sum.aggregationTemporality") if kind == "sum" else F.lit(None).cast("int")).alias("temporality"),
            F.explode_outer(f"_m.{kind}.dataPoints").alias("_dp"),
        ).filter(F.col("_dp").isNotNull())
        return base.select(
            "resource", "metric_name", "unit", "mtype", "monotonic", "temporality",
            _otlp_attr_map(F.col("_dp.attributes")).alias("attributes"),
            F.col("_dp.startTimeUnixNano").cast("long").alias("start_time_unix_nano"),
            F.col("_dp.timeUnixNano").cast("long").alias("time_unix_nano"),
            F.coalesce(
                F.col("_dp.asDouble"), F.col("_dp.asInt").try_cast("double")
            ).alias("value"),
        )

    return _points("gauge").unionByName(_points("sum"))


def otlpjson_traces_connector(df: DataFrame, body_col: str = "body") -> DataFrame:
    """``connector/otlpjsonconnector`` (logs→traces, ``traces.go:43-79``):
    records whose body is an OTLP/JSON Traces payload re-emit their
    embedded spans as flat rows; other payloads skipped."""
    src = F.col(body_col)
    parsed = df.filter(src.rlike(OTLPJSON_TRACE_RE)).select(
        F.from_json(src, _OTLP_TRACES_SCHEMA).alias("_pt")
    )
    rs = (
        parsed.filter(F.col("_pt").isNotNull())
        .select(F.explode_outer("_pt.resourceSpans").alias("_rs"))
        .filter(F.col("_rs").isNotNull())
    )
    sp = (
        rs.select(
            _otlp_attr_map(F.col("_rs.resource.attributes")).alias("resource"),
            F.explode_outer("_rs.scopeSpans").alias("_ss"),
        )
        .filter(F.col("_ss").isNotNull())
        .select("resource", F.explode_outer("_ss.spans").alias("_sp"))
        .filter(F.col("_sp").isNotNull())
    )
    return sp.select(
        "resource",
        F.coalesce(F.col("_sp.traceId"), F.lit("")).alias("trace_id"),
        F.coalesce(F.col("_sp.spanId"), F.lit("")).alias("span_id"),
        # pdata span IDs are fixed-size byte arrays — absent == empty string
        F.coalesce(F.col("_sp.parentSpanId"), F.lit("")).alias("parent_span_id"),
        F.col("_sp.name").alias("span_name"),
        F.col("_sp.kind").alias("span_kind"),
        F.col("_sp.startTimeUnixNano").cast("long").alias("start_time_unix_nano"),
        F.col("_sp.endTimeUnixNano").cast("long").alias("end_time_unix_nano"),
        _otlp_attr_map(F.col("_sp.attributes")).alias("attributes"),
        F.col("_sp.status.code").alias("status_code"),
        F.col("_sp.status.message").alias("status_message"),
    )


# ---------------------------------------------------------- signaltometrics

@dataclass
class SignalMetricDef:
    """One ``connector/signaltometricsconnector`` metric definition
    (config/config.go:232-311): OTTL ``value`` expression, OR'd OTTL
    ``conditions``, attribute tuple (with per-attribute ``default_value`` /
    ``optional``), and a metric shape (sum / gauge / histogram /
    exponential_histogram)."""

    name: str
    value: str = "1"
    metric_type: str = "sum"
    conditions: list[str] = field(default_factory=list)
    attributes: list[dict] = field(default_factory=list)
    monotonic: bool = True
    buckets: list[float] | None = None  # histogram explicit bounds
    scale: int = 2  # exponential_histogram scale


def signal_to_metrics(
    df: DataFrame,
    defs: list[SignalMetricDef],
    overrides: dict[str, str] | None = None,
    error_mode: str = "ignore",
    order_col: str | None = None,
    window_col: str | None = None,
) -> dict[str, DataFrame]:
    """signaltometrics connector, logs signal: per-batch aggregation only
    (the reference performs no stateful/time aggregation — README "Metrics
    types"), so the batch form is exact, not an approximation.

    Per def: filter by OR'd OTTL conditions, evaluate the OTTL ``value``
    expression per record, drop records missing a non-optional attribute
    with no default (validateAttributeConfigs semantics), then ONE hash
    aggregation per metric keyed by the attribute tuple:

    - ``sum``: sum of value (int stays long, double stays double).
    - ``gauge``: last-written value per tuple (gaugedp.go:25 overwrites per
      record). Batch-deterministic analog: value at max ``order_col`` when
      given, else max(value) — documented stand-in, record order is not
      defined in a DataFrame batch.
    - ``histogram``: explicit-bound bucket counts (le_* columns) + sum.
    - ``exponential_histogram``: OTel base-2 bucket indices at ``scale``.

    Everything is Column-only; N defs = N independent aggregations over one
    scan (Spark reuses the scan; no UDF, no collect).
    """
    from ..functions.ottl import Compiler, PathResolver, parse_condition

    out: dict[str, DataFrame] = {}
    for d in defs:
        c = Compiler(PathResolver(df, overrides), error_mode)
        c.resolver.columns = set(df.columns)
        cur = df
        pred = None
        for s in d.conditions:
            col = c._as_col(c.compile_value(parse_condition(s)))
            pred = col if pred is None else (pred | col)
        if pred is not None:
            cur = cur.filter(F.coalesce(pred, F.lit(False)))
        val = c._as_col(c.compile_value(parse_condition(d.value)))
        dims = []
        for a in d.attributes:
            key = a["key"]
            acol = c._as_col(c.compile_value(parse_condition(f'attributes["{key}"]')))
            if "default_value" in a:
                acol = F.coalesce(acol, F.lit(a["default_value"]))
            elif not a.get("optional"):
                cur = cur.filter(acol.isNotNull())
            dims.append(acol.alias(key.replace(".", "_")))
        cur = cur.withColumn("_s2m_value", val)
        # window_col (streaming): the tumbling window rides the grouping so
        # the streaming form is ONE stateful aggregation per def
        gb = cur.groupBy(*([F.col(window_col)] if window_col else []), *dims)
        if d.metric_type == "sum":
            out[d.name] = gb.agg(F.sum("_s2m_value").alias("value"))
        elif d.metric_type == "gauge":
            agg = (
                F.max_by(F.col("_s2m_value"), F.col(order_col))
                if order_col
                else F.max("_s2m_value")
            )
            out[d.name] = gb.agg(agg.alias("value"))
        elif d.metric_type == "histogram":
            bounds = d.buckets or [2, 4, 6, 8, 10, 50, 100, 200, 400, 800]
            v = F.col("_s2m_value")
            aggs = [
                F.count(F.lit(1)).alias("count"),
                F.sum(v).alias("sum"),
            ]
            lo = None
            for b in bounds:
                cond = (v <= b) if lo is None else ((v > lo) & (v <= b))
                aggs.append(F.sum(cond.cast("long")).alias(f"le_{str(b).replace('.', '_')}"))
                lo = b
            aggs.append(F.sum((v > lo).cast("long")).alias("le_inf"))
            out[d.name] = gb.agg(*aggs)
        elif d.metric_type == "exponential_histogram":
            # OTel exponential histograms account value==0 in a dedicated
            # zero-count bucket (emitted here as bucket_idx NULL) rather
            # than silently dropping it; negative values ARE dropped — the
            # positive-bucket-only subset of the OTel model.
            idx = F.when(
                F.col("_s2m_value") > 0,
                (F.ceil(F.log2(F.col("_s2m_value")) * (2 ** d.scale)) - 1).cast("bigint"),
            )
            out[d.name] = (
                cur.filter(F.col("_s2m_value") >= 0)
                .withColumn("bucket_idx", idx)
                .groupBy(*([F.col(window_col)] if window_col else []), *dims, "bucket_idx")
                .agg(F.count(F.lit(1)).alias("bucket_count"))
            )
        else:
            raise ValueError(f"unsupported metric_type {d.metric_type!r}")
    return out


# ------------------------------------------------------------- servicegraph

def service_graph(
    df: DataFrame,
    trace_col: str = "trace_id",
    span_col: str = "span_id",
    parent_col: str = "parent_span_id",
    kind_col: str = "span_kind",
    service_col: str = "service",
    duration_col: str = "duration",
    failed_col: str | None = None,
    buckets: list[float] | None = None,
) -> DataFrame:
    """``connector/servicegraphconnector``: client→server edges from span
    pairs, aggregated into request/failure counts + latency histograms.

    The reference keys an in-memory store by (traceID, spanID) and matches a
    CLIENT span against the SERVER span whose parentSpanID equals it
    (``connector.go:263-300``). Batch sees whole traces, so the store is
    simply an equi-join: CLIENT side on (trace, span_id) vs SERVER side on
    (trace, parent_span_id) — one shuffle on slim keys, then a hash agg per
    (client service, server service, failed) edge. No state, no window; at
    100 TB both sides partition by the same join key.

    ``failed_col`` (boolean) marks span-level failure; an edge is failed if
    either side failed (``connector.go:342-368`` error accounting).
    """
    client = df.filter(F.upper(F.col(kind_col)).isin("CLIENT", "SPAN_KIND_CLIENT")).select(
        F.col(trace_col).alias("_t"),
        F.col(span_col).alias("_join_span"),
        F.col(service_col).alias("client_service"),
        F.col(duration_col).alias("_client_dur"),
        (F.col(failed_col) if failed_col else F.lit(False)).alias("_cf"),
    )
    server = df.filter(F.upper(F.col(kind_col)).isin("SERVER", "SPAN_KIND_SERVER")).select(
        F.col(trace_col).alias("_t"),
        F.col(parent_col).alias("_join_span"),
        F.col(service_col).alias("server_service"),
        F.col(duration_col).alias("_server_dur"),
        (F.col(failed_col) if failed_col else F.lit(False)).alias("_sf"),
    )
    edges = client.join(server, ["_t", "_join_span"])
    bounds = buckets or [2, 4, 6, 8, 10, 50, 100, 200, 400, 800]
    sdur = F.col("_server_dur")
    aggs = [
        F.count(F.lit(1)).alias("req_total"),
        F.sum((F.col("_cf") | F.col("_sf")).cast("long")).alias("req_failed_total"),
        F.sum("_client_dur").alias("client_duration_sum"),
        F.sum("_server_dur").alias("server_duration_sum"),
    ]
    lo = None
    for b in bounds:
        cond = (sdur <= b) if lo is None else ((sdur > lo) & (sdur <= b))
        aggs.append(F.sum(cond.cast("long")).alias(f"server_le_{str(b).replace('.', '_')}"))
        lo = b
    aggs.append(F.sum((sdur > lo).cast("long")).alias("server_le_inf"))
    return edges.groupBy("client_service", "server_service").agg(*aggs)


# ------------------------------------------------- roundrobin / failover

def round_robin(
    df: DataFrame,
    n: int,
    order_col: str,
    out: str = "endpoint",
    order_bucket_span: int | None = None,
) -> DataFrame:
    """``connector/roundrobinconnector``: spread records over N downstream
    pipelines in rotation. A DataFrame has no arrival order, so rotation is
    defined by ``order_col`` (deterministic given the data): global
    row_number % n. Use ``load_balancing_bucket`` instead when a stable
    KEY-based assignment is wanted — this form is for even spreading.

    ``order_bucket_span=None`` is a global ``Window.orderBy`` — a
    SINGLE-PARTITION exchange, acceptable only for fan-out of AGGREGATED
    streams (the reference use case: spreading exporter load over a handful
    of endpoints). For raw fact tables pass ``order_bucket_span`` (a NUMERIC
    ``order_col`` range per bucket): the rank is then computed as a
    distributed two-phase prefix sum — partition-local ``row_number`` per
    contiguous order bucket plus a broadcast per-bucket cumulative-offset
    frame (one row per bucket), the same trick ``recombine``'s sessionizer
    uses (operators/transformers.py) — bit-for-bit the global assignment
    when ``order_col`` is unique, with no single-partition exchange.
    """
    from pyspark.sql import Window

    if order_bucket_span is None:
        w = Window.orderBy(order_col)
        return df.withColumn(out, ((F.row_number().over(w) - 1) % n).cast("int"))
    df = df.withColumn("_rr_bkt", (F.col(order_col) / order_bucket_span).cast("long"))
    w1 = Window.partitionBy("_rr_bkt").orderBy(order_col)
    df = df.withColumn("_rr_local", F.row_number().over(w1))
    per_bucket = df.groupBy("_rr_bkt").agg(F.count(F.lit(1)).alias("_rr_n"))
    woff = Window.orderBy("_rr_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = per_bucket.withColumn(
        "_rr_off", F.coalesce(F.sum("_rr_n").over(woff), F.lit(0))
    ).drop("_rr_n")
    df = df.join(F.broadcast(offsets), "_rr_bkt")
    return (
        df.withColumn(
            out, ((F.col("_rr_local") + F.col("_rr_off") - 1) % n).cast("int")
        )
        .drop("_rr_bkt", "_rr_local", "_rr_off")
    )


# ---------------------------------------------------------------- exceptions

def exceptions_connector(
    df: DataFrame,
    dimensions: list[str] | None = None,
    events_col: str = "events",
    service_col: str = "service",
    span_name_col: str = "span_name",
    kind_col: str = "span_kind",
    status_col: str = "status_code",
    exemplars: bool = False,
    trace_col: str = "trace_id",
    span_attrs_col: str | None = None,
    window_col: str | None = None,
) -> DataFrame:
    """``connector/exceptionsconnector`` (traces→metrics): count span events
    named ``exception`` per (service, span name, kind, status code) plus
    configured extra dimensions resolved event-attrs-first, falling back to
    the span's own attributes (pass ``span_attrs_col``) when the event lacks
    the key (``connector_metrics.go:75-108``, buildDimensionKVs). Spans
    without a service name are skipped like the reference (resource
    service.name is mandatory, ``connector_metrics.go:79-82``).

    Span events are modeled as ``array<struct<name:string,
    attributes:map<string,string>>>``; the in-memory keyed exception store
    is one explode + hash-agg. ``exemplars`` attaches a deterministic
    (max trace id) exemplar per group instead of the reference's
    rotating sample.
    """
    span_attrs = [F.col(span_attrs_col).alias("_sattrs")] if span_attrs_col else []
    if window_col:
        span_attrs.append(F.col(window_col))
    exc = (
        df.filter(F.col(service_col).isNotNull())
        .select(
            F.col(service_col).alias("service_name"),
            F.col(span_name_col).alias("span_name"),
            F.col(kind_col).alias("span_kind"),
            F.col(status_col).alias("status_code"),
            F.col(trace_col).alias("_tid"),
            *span_attrs,
            F.explode_outer(events_col).alias("_ev"),
        )
        .filter(F.col("_ev").isNotNull() & (F.col("_ev.name") == "exception"))
    )

    def _dim(d):
        ev = F.element_at(F.col("_ev.attributes"), d)
        if span_attrs_col:
            ev = F.coalesce(ev, F.element_at(F.col("_sattrs"), d))
        return ev.alias(d.replace(".", "_"))

    dim_cols = [_dim(d) for d in (dimensions or [])]
    aggs = [F.count(F.lit(1)).alias("exceptions")]
    if exemplars:
        aggs.append(F.max("_tid").alias("exemplar_trace"))
    win = [F.col(window_col)] if window_col else []
    return exc.groupBy(
        *win, "service_name", "span_name", "span_kind", "status_code", *dim_cols
    ).agg(*aggs)
