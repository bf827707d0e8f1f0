"""Run REAL OpenTelemetry Collector YAML configs on the Spark engine.

This is the switch-over path for a reference user: the same
``receivers / processors / connectors / exporters / service.pipelines``
document the collector runs (shapes per
``receiver/filelogreceiver/testdata/config.yaml``,
``processor/transformprocessor/testdata/config.yaml``,
``connector/routingconnector/testdata/config/*.yaml``) composes our
DataFrame stages instead of the Go component graph.

Supported component subset (logs path — SURVEY §2 scope):

receivers
  ``filelog`` / ``file_log``: include globs (read as text lines → ``body``),
  ``operators`` list of stanza operators: regex_parser, json_parser,
  csv_parser, key_value_parser, severity_parser, time_parser, trace_parser,
  uri_parser, container, add, remove, move, copy, retain, filter, recombine,
  noop; embedded ``timestamp:``/``severity:`` sub-parser blocks on parsers
  (helper/parser.go:90-247). Expr-lang row expressions (``body matches
  "..."``, stanza `if`/filter/router) compile through the OTTL frontend's
  word-operator extension.

processors
  ``transform`` (log_statements[].statements, context log/resource),
  ``filter`` (logs.log_record condition list), ``attributes`` /
  ``resource`` (action lists), ``probabilistic_sampler``
  (sampling_percentage, mode), ``redaction``, ``batch`` (physical no-op:
  micro-batching is Spark's), ``groupbyattrs`` (repartition keys),
  ``logdedup`` (include/exclude_fields, interval window,
  log_count_attribute), ``drain`` (tree_depth / merge_threshold /
  max_node_children / body_field / template_attribute → true online Drain).

connectors
  ``routing``: table[].statement (``route() where <cond>``) or
  ``condition``, pipelines, default_pipelines — first-match-wins move
  semantics; ``count``: logs metric definitions (conditions + attributes).

exporters
  ``file``: path + format (json/parquet); ``debug``/``logging``: collected
  to driver stdout on demand; ``awss3``: s3uri treated as a path with
  time-partitioned layout.

service.pipelines
  ``logs[/name]`` entries: receivers → processors → exporters, with
  connectors bridging pipelines (a connector named in one pipeline's
  exporters and another's receivers).

The flat-column model applies: stanza fields ``body`` / ``attributes.x`` /
``resource.x`` address the ``body`` column / flat column ``x``
(SURVEY §1.3). Unsupported components raise with the component name so a
user sees exactly what didn't translate.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import ottl
from ..operators import connectors as conn
from ..operators import parsers, processors, transformers


def _field(f: str | None, default: str = "body") -> str:
    """Stanza field path → flat column name (attributes.x / attributes["x"]
    / resource.x → x; body stays body; body.x → x)."""
    if not f:
        return default
    m = re.fullmatch(r'(attributes|resource|body)\["([^"]+)"\]', f)
    if m:
        return m.group(2)
    parts = f.split(".")
    if parts[0] in ("attributes", "resource", "body") and len(parts) > 1:
        return ".".join(parts[1:])
    return f


def _compile_expr(df: DataFrame, expr: str):
    """Compile a stanza expr-lang / OTTL condition against a frame."""
    comp = ottl.Compiler(ottl.PathResolver(df))
    return comp.compile_condition(expr)


# ------------------------------------------------------- stanza operators

def _apply_subparsers(df: DataFrame, spec: dict) -> DataFrame:
    """Embedded timestamp:/severity:/trace: blocks every ParserOperator
    carries (helper/parser.go:176-247)."""
    ts = spec.get("timestamp")
    if ts:
        df = parsers.time_parser(
            df,
            _field(ts.get("parse_from")),
            "timestamp",
            ts.get("layout", "%Y-%m-%dT%H:%M:%S.%fZ"),
            ts.get("layout_type", "strptime"),
        )
    sev = spec.get("severity")
    if sev:
        df = parsers.severity_parser(df, parse_from=_field(sev.get("parse_from")))
    tr = spec.get("trace")
    if tr:
        df = parsers.trace_parser(df, _field(tr.get("parse_from", "trace_id")))
    return df


def apply_stanza_operator(df: DataFrame, spec: dict) -> DataFrame:
    spec = dict(spec)
    typ = spec.pop("type")
    on_error = spec.get("on_error", "send")
    src = _field(spec.get("parse_from"))

    if typ == "regex_parser":
        df = parsers.regex_parser(df, spec["regex"], parse_from=src, on_error=on_error)
    elif typ == "json_parser":
        schema = spec.get("schema")  # our extension: DDL for typed promotion
        if schema:
            df = parsers.json_parser(df, schema, parse_from=src, on_error=on_error)
        else:
            # dynamic stanza default: body JSON → attributes map
            df = df.withColumn(
                spec.get("parse_to", "attributes").split(".")[-1] or "attributes",
                F.from_json(F.col(src), "map<string,string>"),
            )
    elif typ == "csv_parser":
        df = parsers.csv_parser(
            df, spec["header"].split(",") if isinstance(spec["header"], str) else spec["header"],
            parse_from=src, delimiter=spec.get("delimiter", ","), on_error=on_error,
        )
    elif typ == "key_value_parser":
        df = parsers.keyvalue_parser(
            df, parse_from=src, out=spec.get("parse_to", "attributes").split(".")[-1],
            delimiter=spec.get("delimiter", "="),
            pair_delimiter=spec.get("pair_delimiter", " "),
        )
    elif typ == "severity_parser":
        df = parsers.severity_parser(df, parse_from=src)
    elif typ == "time_parser":
        df = parsers.time_parser(
            df, src, "timestamp", spec.get("layout", "%Y-%m-%dT%H:%M:%S.%fZ"),
            spec.get("layout_type", "strptime"),
        )
    elif typ == "trace_parser":
        df = parsers.trace_parser(df, src)
    elif typ == "uri_parser":
        df = parsers.uri_parser(df, src)
    elif typ == "container":
        df = parsers.container_parser(df, src)
        if spec.get("recombine_partials", True) and "_line_id" in df.columns:
            df = parsers.container_recombine_partials(df)
        if spec.get("add_metadata_from_filepath", True) and "_input_file" in df.columns:
            df = parsers.container_logpath_metadata(df, "_input_file")
    elif typ == "json_array_parser":
        df = parsers.json_array_parser(df, src, header=spec.get("header"))
    elif typ == "scope_name_parser":
        df = parsers.scope_name_parser(df, src)
    elif typ == "syslog_parser":
        df = parsers.syslog_parser(
            df, src,
            protocol=spec.get("protocol", "rfc5424"),
            enable_octet_counting=bool(spec.get("enable_octet_counting")),
        )
    elif typ == "add":
        val = spec.get("value")
        if isinstance(val, str) and val.startswith("EXPR("):
            val = _compile_expr(df, val[5:-1])
        df = transformers.add(df, _field(spec["field"]), val)
    elif typ == "remove":
        df = transformers.remove(df, _field(spec["field"]))
    elif typ == "move":
        df = transformers.move(df, _field(spec["from"]), _field(spec["to"]))
    elif typ == "copy":
        df = transformers.copy(df, _field(spec["from"]), _field(spec["to"]))
    elif typ == "retain":
        df = transformers.retain(df, *[_field(f) for f in spec["fields"]])
    elif typ == "filter":
        df = transformers.filter_drop(
            df, _compile_expr(df, spec["expr"]), drop_ratio=spec.get("drop_ratio", 1.0)
        )
    elif typ == "recombine":
        df = transformers.recombine(
            df,
            is_first_entry=_compile_expr(df, spec["is_first_entry"]),
            source_col=_field(spec.get("source_identifier"), "_input_file"),
            order_col=spec.get("order_by", "_line_id"),
            combine_field=_field(spec.get("combine_field")),
            combine_with=spec.get("combine_with", "\n"),
            max_batch_size=spec.get("max_batch_size", 1000),
        )
    elif typ == "noop":
        pass
    else:
        raise ValueError(f"unsupported stanza operator type {typ!r}")
    return _apply_subparsers(df, spec)


# ------------------------------------------------------------- processors

def apply_processor(df: DataFrame, name: str, spec: dict) -> DataFrame:
    kind = name.split("/")[0]
    spec = spec or {}
    if kind == "transform":
        # Each log_statements entry is a GROUP with its own optional
        # `conditions` guard (OR'd; compiled into every statement's where —
        # transformprocessor/internal/common/logs.go:97-116) and `context`.
        # The flat single-table model folds resource/scope/log attributes
        # into one column namespace, so context only validates here; paths
        # carry their own log./resource. prefixes.
        error_mode = spec.get("error_mode", "ignore")
        for group in spec.get("log_statements", []):
            if isinstance(group, dict):
                ctx = group.get("context")
                if ctx not in (None, "log", "resource", "scope", "span", "metric", "datapoint"):
                    raise ValueError(f"unsupported transform context {ctx!r}")
                df = ottl.transform_processor(
                    df,
                    group.get("statements", []),
                    error_mode,
                    conditions=group.get("conditions"),
                )
            else:
                df = ottl.transform_processor(df, [group], error_mode)
        return df
    if kind == "filter":
        # condition sections per signal (filterprocessor config): in the
        # flat single-table model every section compiles the same way —
        # OR'd OTTL conditions, match ⇒ drop
        conds = list((spec.get("logs") or {}).get("log_record", []))
        conds += list((spec.get("traces") or {}).get("span", []))
        conds += list((spec.get("traces") or {}).get("spanevent", []))
        conds += list((spec.get("metrics") or {}).get("metric", []))
        conds += list((spec.get("metrics") or {}).get("datapoint", []))
        return ottl.filter_processor_ottl(df, conds)
    if kind == "resourcedetection":
        # resourcedetectionprocessor: detection happens ONCE on the driver,
        # then merges as constant columns. Detectors implemented where the
        # sandbox can answer faithfully: `env` (OTEL_RESOURCE_ATTRIBUTES
        # k=v,k=v — internal/env/env.go), `system` (host.name + os.type),
        # `static` (our extension: attributes given inline).
        import os as _os
        import platform as _platform

        detected: dict[str, str] = {}
        for det in spec.get("detectors", ["env"]):
            if det == "env":
                raw = _os.environ.get("OTEL_RESOURCE_ATTRIBUTES", "")
                for pair in raw.split(","):
                    if "=" in pair:
                        k, v = pair.split("=", 1)
                        detected[_field(k.strip()).replace(".", "_")] = v.strip()
            elif det == "system":
                import socket as _socket

                detected["host_name"] = _socket.gethostname()
                detected["os_type"] = _platform.system().lower()
            elif det == "static":
                for k, v in (spec.get("attributes") or {}).items():
                    detected[_field(k).replace(".", "_")] = str(v)
            else:
                raise ValueError(f"unsupported resourcedetection detector {det!r}")
        from ..operators.enrich import resource_detection

        return resource_detection(df, detected, override=bool(spec.get("override")))
    if kind == "k8sattributes":
        # k8sattributesprocessor (processor.go:202-285): pod metadata joined
        # on the association key. The sandbox has no kubelet/API server, so
        # the pod table comes from the config itself — `pod_metadata` (list
        # of dicts, our extension) or `pod_metadata_path` (parquet) — and
        # the association + set-if-absent merge semantics are the real ones
        # (broadcast left join, nulls on association failure).
        from ..operators.enrich import broadcast_lookup

        assoc = _field(spec.get("pod_association_key", "k8s.pod.ip")).replace(".", "_")
        rows = spec.get("pod_metadata")
        path = spec.get("pod_metadata_path")
        if rows:
            dim = df.sparkSession.createDataFrame(
                [{(_field(k).replace(".", "_")): v for k, v in r.items()} for r in rows]
            )
        elif path:
            dim = df.sparkSession.read.parquet(path)
        else:
            raise ValueError(
                "k8sattributes needs pod_metadata or pod_metadata_path "
                "(no k8s API in this environment)"
            )
        return broadcast_lookup(df, dim, on=assoc, set_if_absent=True)
    if kind == "lookup":
        # generic lookup processor (processor/lookupprocessor/config.go:36-76):
        # dim table from inline rows or a parquet path, broadcast left join
        from ..operators.enrich import broadcast_lookup

        rows = spec.get("rows")
        path = spec.get("table_path")
        if rows:
            dim = df.sparkSession.createDataFrame(
                [{(_field(k).replace(".", "_")): v for k, v in r.items()} for r in rows]
            )
        elif path:
            dim = df.sparkSession.read.parquet(path)
        else:
            raise ValueError("lookup needs rows or table_path")
        on = spec.get("on") or spec.get("key")
        keys = [on] if isinstance(on, str) else list(on or [])
        if not keys:
            raise ValueError("lookup needs an `on` key")
        return broadcast_lookup(
            df, dim, on=[_field(k).replace(".", "_") for k in keys],
            set_if_absent=not spec.get("override", False),
            prefix=spec.get("prefix", ""),
        )
    if kind == "geoip":
        # geoipprocessor: the MMDB becomes an integer-interval ranges table
        # (ip_lo, ip_hi, payload...) from `ranges_path` parquet or inline
        # `ranges` rows; the broadcast non-equi join never shuffles the
        # fact side
        from ..operators.enrich import geoip_range_lookup

        rows = spec.get("ranges")
        path = spec.get("ranges_path")
        if rows:
            ranges = df.sparkSession.createDataFrame(rows)
        elif path:
            ranges = df.sparkSession.read.parquet(path)
        else:
            raise ValueError("geoip needs ranges or ranges_path")
        return geoip_range_lookup(
            df, _field(spec.get("ip_field", "ip")), ranges
        )
    if kind in ("attributes", "resource"):
        return processors.attributes_actions(
            df,
            [
                {**a, "key": _field(a["key"])}
                for a in spec.get("actions", spec.get("attributes", []))
            ],
        )
    if kind == "probabilistic_sampler":
        return processors.probabilistic_sampler(
            df,
            spec.get("sampling_percentage", 100.0),
            key=_field(spec.get("attribute_source", "doc_id")),
            mode=spec.get("mode", "hash_seed"),
            threshold_col="sampling_threshold",
        )
    if kind == "redaction":
        return processors.redaction(
            df,
            allowed_keys=spec.get("allowed_keys"),
            blocked_values=spec.get("blocked_values"),
            ignored_keys=spec.get("ignored_keys"),
            allowed_values=spec.get("allowed_values"),
            blocked_key_patterns=spec.get("blocked_key_patterns"),
            summary=spec.get("summary"),
        )
    if kind == "logstransform":
        # processor/logstransformprocessor: a stanza operator pipeline run
        # as a processor — same operator registry as the filelog receiver
        for op in spec.get("operators", []):
            df = apply_stanza_operator(df, op)
        return df
    if kind == "batch":
        return df  # micro-batching is the engine's job (SURVEY §2.5 batch row)
    if kind == "groupbyattrs":
        return processors.group_by_attrs(df, [_field(k) for k in spec.get("keys", [])])
    if kind == "logdedup":
        # processor/logdedupprocessor/config.go:44-53: include_fields lists
        # the dedup key; interval is the tumbling flush window; conditions
        # gate which records dedup at all (others pass through untouched)
        from ..operators.dedup import log_dedup

        keys = [_field(k) for k in spec.get("include_fields", [])] or [
            c for c in df.columns if c not in ("_line_id", "_input_file")
        ]
        keys = [k for k in keys if k not in (spec.get("exclude_fields") or [])]
        interval_s = _duration_seconds(spec.get("interval", "10s"))
        # records without an event time (unparsed lines) still dedup: the
        # reference counts by arrival; a null event-time row would silently
        # drop out of the window aggregate, so anchor nulls at epoch
        ts_col = "_dedup_ts"
        src_ts = F.col("timestamp") if "timestamp" in df.columns else F.lit(None)
        df = df.withColumn(
            ts_col,
            F.coalesce(src_ts.cast("timestamp"), F.lit("1970-01-01").cast("timestamp")),
        )
        out = log_dedup(df, keys, ts_col=ts_col, interval=f"{interval_s} seconds").drop(
            ts_col
        )
        cnt_attr = spec.get("log_count_attribute", "log.record.count")
        return out.withColumnRenamed("log_count", _field(cnt_attr).replace(".", "_"))
    if kind == "drain":
        # processor/drainprocessor/config.go: tree_depth, merge_threshold,
        # max_node_children, body_field, template_attribute → the true
        # online Drain operator (per-partition trees + template merge)
        from ..operators.templates import drain_processor

        return drain_processor(
            df,
            text_col=_field(spec.get("body_field") or "body"),
            depth=spec.get("tree_depth", 4),
            st=spec.get("merge_threshold", 0.4),
            max_children=spec.get("max_node_children", 100),
            # dotted attribute names flatten like PathResolver keys do
            template_attribute=_field(
                spec.get("template_attribute", "log.record.template")
            ).replace(".", "_"),
        )
    if kind in (
        "cumulativetodelta", "deltatocumulative", "deltatorate",
        "interval", "metricstarttime", "metricstransform", "metricsgeneration",
    ):
        return _apply_metrics_processor(df, kind, spec)
    if kind == "groupbytrace":
        # processor/groupbytraceprocessor: wait_duration/num_traces are
        # buffering knobs — batch sees whole traces, assembly is exact
        from ..operators.templates import group_by_trace

        return group_by_trace(
            df,
            trace_col=_field(spec.get("trace_field") or "trace_id"),
            ts_col=spec.get("ts_field") or ("timestamp" if "timestamp" in df.columns else "ts"),
        )
    if kind == "tail_sampling":
        from ..operators.templates import tail_sampling

        return tail_sampling(
            df,
            [_ts_policy(p) for p in spec.get("policies", [])],
            trace_col=_field(spec.get("trace_field") or "trace_id"),
            ts_col=spec.get("ts_field") or ("timestamp" if "timestamp" in df.columns else "ts"),
        )
    if kind in ("span_pruning", "spanpruning"):
        # processor/spanpruningprocessor/config.go (spanpruning is the
        # deprecated alias the reference still accepts)
        from ..operators.pruning import span_pruning

        return span_pruning(
            df,
            group_by_attributes=spec.get("group_by_attributes"),
            conditions=spec.get("conditions"),
            min_spans_to_aggregate=int(spec.get("min_spans_to_aggregate", 5)),
            max_parent_depth=int(spec.get("max_parent_depth", 1)),
            aggregation_attribute_prefix=spec.get(
                "aggregation_attribute_prefix", "aggregation."
            ),
            trace_col=_field(spec.get("trace_field") or "trace_id"),
            enable_outlier_analysis=bool(spec.get("enable_outlier_analysis", False)),
            outlier_method=spec.get("outlier_analysis", {}).get("method", "iqr"),
            iqr_multiplier=float(spec.get("outlier_analysis", {}).get("iqr_multiplier", 1.5)),
            mad_multiplier=float(spec.get("outlier_analysis", {}).get("mad_multiplier", 3.0)),
            outlier_min_group_size=int(spec.get("outlier_analysis", {}).get("min_group_size", 7)),
        )
    if kind == "dynamic_sampling":
        # processor/dynamicsamplingprocessor/config.go: rules + samplers map
        # 1:1; trace_timeout/decision_delay/num_traces/decision_cache are
        # stream-buffer knobs with no batch analog (batch sees whole traces)
        from ..operators.templates import dynamic_sampling

        return dynamic_sampling(
            df,
            rules=spec["rules"],
            trace_col=_field(spec.get("trace_field") or "trace_id"),
            ts_col=spec.get("ts_field") or ("timestamp" if "timestamp" in df.columns else "ts"),
            tracestate_col=spec.get("tracestate_field", "trace_state"),
            window_seconds=spec.get("window_seconds"),
        )
    if kind == "genainormalizer":
        # processor/genainormalizerprocessor/config.go: ordered `sources`
        # (builtin openinference/openllmetry or user-defined mapping tables)
        from ..operators.genai import genai_normalize

        return genai_normalize(
            df,
            sources=spec["sources"],
            attrs_col=spec.get("attributes_field", "attributes"),
        )
    if kind == "cardinality_guardian":
        # processor/cardinalityguardianprocessor/config.go — yaml keys map
        # 1:1; enforcement_mode default tag_only matches the reference
        from ..operators.metrics import cardinality_guardian

        return cardinality_guardian(
            df,
            metric_col=spec.get("metric_field", "metric_name"),
            attrs_col=spec.get("attributes_field", "attributes"),
            ts_col=spec.get("ts_field") or ("timestamp" if "timestamp" in df.columns else "ts"),
            value_col=spec.get("value_field", "value"),
            epoch_seconds=int(spec.get("epoch_duration_seconds", 300)),
            max_delta=int(spec.get("max_cardinality_delta_per_epoch", 500)),
            never_drop=spec.get("never_drop_labels"),
            metric_overrides=spec.get("metric_overrides"),
            mode=spec.get("enforcement_mode", "tag_only"),
            metric_type=spec.get("metric_type", "delta_sum"),
        )
    if kind == "isolationforest":
        # processor/isolationforestprocessor/config.go defaults: mode
        # enrich, forest_size 100, subsample_size 256, window_size 1000,
        # contamination_rate 0.10, multi-model via `features` keys
        from ..operators.anomaly import isolation_forest

        return isolation_forest(
            df,
            feature_cols=[_field(f) for f in spec["feature_fields"]],
            mode=spec.get("mode", "enrich"),
            forest_size=int(spec.get("forest_size", 100)),
            subsample_size=int(spec.get("subsample_size", 256)),
            window_size=int(spec.get("window_size", 1000)),
            anomaly_threshold=spec.get("anomaly_threshold"),
            contamination_rate=float(spec.get("contamination_rate", 0.10)),
            group_keys=[_field(f) for f in spec.get("features", [])] or None,
            score_col=spec.get("score_attribute", "anomaly.isolation_score"),
            flag_col=spec.get("classification_attribute", "anomaly.is_anomaly"),
        )
    raise ValueError(f"unsupported processor {name!r}")


#: tailsamplingprocessor config → operator policy dict: the reference nests
#: per-type settings under a key named after the type
#: (processor/tailsamplingprocessor/config.go); field names differ slightly
_TS_FIELD_MAP = {
    "latency": {"threshold_ms": "threshold_ms", "upper_threshold_ms": "upper_threshold_ms"},
    "numeric_attribute": {"key": "key", "min_value": "min", "max_value": "max"},
    "string_attribute": {"key": "key", "values": "values"},
    "boolean_attribute": {"key": "key", "value": "value"},
    "status_code": {"status_codes": "values"},
    "trace_state": {"key": "key", "values": "values"},
    "span_count": {"min_spans": "min_spans", "max_spans": "max_spans"},
    "probabilistic": {"sampling_percentage": "percent", "hash_salt": "seed"},
    "rate_limiting": {"spans_per_second": "spans_per_second"},
}
_TS_SUBLIST = {
    "and": "and_sub_policy",
    "drop": "drop_sub_policy",
    "composite": "composite_sub_policy",
}


def _ts_policy(p: dict) -> dict:
    """One reference tail-sampling policy block → operator policy dict."""
    t = p["type"]
    if t in ("always", "always_sample"):
        return {"type": "always"}
    if t == "ottl_condition":
        sub = p.get("ottl_condition", p)
        return {"type": "ottl_condition", "conditions": list(sub.get("span", []))}
    if t in _TS_SUBLIST:
        sub = p.get(t, {})
        out = {
            "type": t,
            "policies": [_ts_policy(sp) for sp in sub.get(_TS_SUBLIST[t], [])],
        }
        if t == "composite":
            if "max_total_spans_per_second" in sub:
                out["max_total_sps"] = sub["max_total_spans_per_second"]
            if sub.get("rate_allocation"):
                out["rate_allocation"] = [r["percent"] for r in sub["rate_allocation"]]
        return out
    if t == "not":
        sub = p.get("not", {})
        return {"type": "not", "policies": [_ts_policy(sp) for sp in sub.get("policies", [])]}
    if t in _TS_FIELD_MAP:
        sub = p.get(t, {})
        out = {"type": t}
        for src_key, dst_key in _TS_FIELD_MAP[t].items():
            if src_key in sub:
                out[dst_key] = sub[src_key]
        if t in ("numeric_attribute", "string_attribute", "boolean_attribute"):
            out["key"] = _field(out.get("key"))
        return out
    raise ValueError(f"unsupported tail_sampling policy type {t!r}")


def _apply_metrics_processor(df: DataFrame, kind: str, spec: dict) -> DataFrame:
    """The metrics-processor family over a flat metric frame.

    Flat-model conventions (our extension keys, since pdata's implicit
    series identity needs naming on a table): ``series_keys`` lists the
    series-identity columns (default: every column except ts/value),
    ``ts_field`` (default ``timestamp`` if present else ``ts``),
    ``value_field`` (default ``value``). Reference spec keys map per
    processor: metricstransform transforms[].{include,action=update,
    new_name, operations[].aggregate_labels/experimental_scale_value},
    metricsgeneration rules[].{name,metric_1,metric_2,operation},
    interval.interval, metricstarttime.strategy.
    """
    from ..operators import metrics as M

    ts_col = spec.get("ts_field") or ("timestamp" if "timestamp" in df.columns else "ts")
    value_col = spec.get("value_field", "value")
    keys = [_field(k) for k in spec.get("series_keys", [])] or [
        c for c in df.columns
        if c not in (ts_col, value_col, "_line_id", "_input_file")
    ]
    if kind == "cumulativetodelta":
        return M.cumulative_to_delta(df, keys, ts_col=ts_col, value_col=value_col)
    if kind == "deltatocumulative":
        return M.delta_to_cumulative(df, keys, ts_col=ts_col, value_col=value_col)
    if kind == "deltatorate":
        return M.delta_to_rate(df, keys, ts_col=ts_col, value_col=value_col)
    if kind == "interval":
        secs = _duration_seconds(spec.get("interval", "60s"))
        return M.interval_last(
            df, keys, ts_col=ts_col, value_col=value_col, interval=f"{secs} seconds"
        )
    if kind == "metricstarttime":
        return M.metric_start_time(
            df, keys, ts_col=ts_col, value_col=value_col,
            strategy=spec.get("strategy", "true_reset_point"),
        )
    if kind == "metricsgeneration":
        for rule in spec.get("rules", []):
            if rule.get("type", "calculate") != "calculate":
                raise ValueError("metricsgeneration: only calculate rules translate")
            df = M.metrics_generation(
                df, rule["name"], _field(rule["metric_1"]), _field(rule["metric_2"]),
                rule.get("operation", "divide"), value_col=value_col,
            )
        return df
    # metricstransform: subset — action=update with new_name (rename),
    # experimental_scale_value, aggregate_labels (label_set kept, others
    # merged with aggregation_type)
    for tr in spec.get("transforms", []):
        if tr.get("action", "update") != "update":
            raise ValueError("metricstransform: only action=update translates")
        rename = None
        if tr.get("include") and tr.get("new_name"):
            rename = {tr["include"]: tr["new_name"]}
        scale = None
        aggregate_across = None
        agg_type = "sum"
        for op in tr.get("operations", []):
            a = op.get("action")
            if a == "experimental_scale_value":
                scale = op["experimental_scale"]
            elif a == "aggregate_labels":
                aggregate_across = [_field(k) for k in op.get("label_set", [])]
                agg_type = op.get("aggregation_type", "sum")
            else:
                raise ValueError(f"metricstransform: unsupported operation {a!r}")
        df = M.metrics_transform(
            df, rename=rename, scale=scale, aggregate_across=aggregate_across,
            agg_type=agg_type, value_col=value_col,
        )
    return df


def _duration_seconds(v) -> int:
    """'10s' / '2m' / '250ms' / int seconds → whole seconds (min 1)."""
    if isinstance(v, (int, float)):
        return max(int(v), 1)
    s = str(v).strip()
    m = re.fullmatch(r"(\d+(?:\.\d+)?)(ms|s|m|h)?", s)
    if not m:
        raise ValueError(f"bad duration {v!r}")
    n = float(m.group(1))
    mult = {"ms": 0.001, "s": 1, "m": 60, "h": 3600, None: 1}[m.group(2)]
    return max(int(n * mult), 1)


# ------------------------------------------------------------- connectors

_ROUTE_STMT = re.compile(r"^\s*route\(\)\s+where\s+(.*)$")


def routing_conditions(spec: dict) -> list[tuple[str, list[str]]]:
    """routing table → [(condition_str, [target pipelines])]."""
    out = []
    for entry in spec.get("table", []):
        cond = entry.get("condition")
        if cond is None:
            m = _ROUTE_STMT.match(entry["statement"])
            if not m:
                raise ValueError(f"unsupported routing statement {entry['statement']!r}")
            cond = m.group(1)
        out.append((cond, entry["pipelines"]))
    return out


# ------------------------------------------------------------ the service

@dataclass
class TranslatedPipelines:
    config: dict
    #: pipeline name → terminal DataFrame (after processors, before exporters)
    frames: dict = field(default_factory=dict)

    def exporter_frames(self) -> dict:
        """(pipeline, exporter) → DataFrame for every non-connector exporter."""
        out = {}
        pipelines = self.config["service"]["pipelines"]
        connectors_cfg = self.config.get("connectors", {})
        for pname, pspec in pipelines.items():
            for ex in pspec.get("exporters", []):
                if ex in connectors_cfg:
                    continue
                out[(pname, ex)] = self.frames[pname]
        return out

    def write(self, out_dir: str, mode: str = "overwrite") -> dict:
        """Materialize file-family exporters under out_dir/<exporter>."""
        import os

        exporters_cfg = self.config.get("exporters", {})
        written = {}
        for (pname, ex), df in self.exporter_frames().items():
            kind = ex.split("/")[0]
            spec = exporters_cfg.get(ex) or {}
            dest = os.path.join(out_dir, f"{pname.replace('/', '_')}__{ex.replace('/', '_')}")
            if kind == "file":
                fmt = (spec.get("format") or "json").replace("proto", "parquet")
                (df.write.mode(mode).format("json" if fmt == "json" else "parquet").save(dest))
                written[(pname, ex)] = dest
            elif kind in ("debug", "logging", "nop"):
                continue
            elif kind == "awss3":
                df.write.mode(mode).parquet(dest)
                written[(pname, ex)] = dest
            elif kind == "loadbalancing":
                # loadbalancingexporter (config.go:17-53): consistent-hash
                # assignment on the routing key; each "endpoint" becomes a
                # hive partition so a downstream per-endpoint consumer reads
                # exactly its stable slice (resolver.static.hostnames sets
                # the ring size)
                from ..operators.connectors import load_balancing_bucket

                key = _field(
                    (spec.get("routing_key") or "traceID").replace("traceID", "trace_id")
                )
                n = len(
                    ((spec.get("resolver") or {}).get("static") or {}).get("hostnames")
                    or [0] * int(spec.get("num_endpoints", 4))
                )
                out = load_balancing_bucket(df, key, n)
                out.write.mode(mode).partitionBy("endpoint").parquet(dest)
                written[(pname, ex)] = dest
            else:
                raise ValueError(f"unsupported exporter {ex!r}")
        return written


def load_collector_config(
    spark: SparkSession,
    cfg: dict | str,
    receiver_frames: dict | None = None,
) -> TranslatedPipelines:
    """Translate + execute-lazily a collector config document.

    ``cfg`` is the parsed YAML dict or a path to the YAML file. Returns the
    per-pipeline terminal DataFrames (lazy — nothing runs until an exporter
    writes or the caller collects). ``receiver_frames`` substitutes
    pre-built frames for named receivers (how the STREAMING runner feeds
    each micro-batch through the same graph).
    """
    if isinstance(cfg, str):
        import yaml

        with open(cfg) as f:
            cfg = yaml.safe_load(f)

    receivers_cfg = cfg.get("receivers", {})
    processors_cfg = cfg.get("processors", {})
    connectors_cfg = cfg.get("connectors", {})
    pipelines = cfg["service"]["pipelines"]

    # ---- receivers → source frames -----------------------------------
    def build_receiver(name: str) -> DataFrame:
        kind = name.split("/")[0]
        spec = receivers_cfg[name] or {}
        if receiver_frames and name in receiver_frames:
            df = receiver_frames[name]
            for op in spec.get("operators", []):
                df = apply_stanza_operator(df, op)
            return df
        if kind in ("filelog", "file_log"):
            paths = spec.get("include", [])
            df = spark.read.text(list(paths)).withColumnRenamed("value", "body")
            # record order within a file = line order (log.file analog:
            # fileconsumer/attrs.go record_number); needed by recombine
            df = df.withColumn("_input_file", F.input_file_name()).withColumn(
                "_line_id", F.monotonically_increasing_id()
            )
            ml = spec.get("multiline")
            if ml:
                # pre-parse multiline split (split.go:35-36): start-pattern
                # opens an entry, end-pattern closes one — recombine per file
                from ..operators.transformers import recombine

                kw = {}
                if ml.get("line_start_pattern"):
                    kw["is_first_entry"] = F.col("body").rlike(
                        parsers.java_regex(ml["line_start_pattern"])
                    )
                elif ml.get("line_end_pattern"):
                    kw["is_last_entry"] = F.col("body").rlike(
                        parsers.java_regex(ml["line_end_pattern"])
                    )
                else:
                    raise ValueError("multiline needs line_start_pattern or line_end_pattern")
                df = recombine(
                    df,
                    source_col="_input_file",
                    order_col="_line_id",
                    combine_field="body",
                    combine_with="\n",
                    **kw,
                )
            for op in spec.get("operators", []):
                df = apply_stanza_operator(df, op)
            return df
        if kind == "tokens":  # our native source (input_hint table)
            from ..sources.tokens import decode_tokens, read_tokens

            return decode_tokens(read_tokens(spark, spec["path"]))
        raise ValueError(f"unsupported receiver {name!r}")

    # ---- evaluate pipelines in dependency order ----------------------
    frames: dict[str, DataFrame] = {}
    pending = dict(pipelines)
    # connector name → list of (source pipeline frame) feeding it
    max_rounds = len(pending) + 2
    for _ in range(max_rounds):
        progressed = False
        for pname, pspec in list(pending.items()):
            inputs = []
            ready = True
            for r in pspec.get("receivers", []):
                if r in receivers_cfg:
                    inputs.append(build_receiver(r))
                elif r in connectors_cfg:
                    feeds = _connector_output(
                        r, connectors_cfg[r], pname, pipelines, frames
                    )
                    if feeds is None:
                        ready = False
                        break
                    inputs.append(feeds)
                else:
                    raise ValueError(f"pipeline {pname!r}: unknown receiver {r!r}")
            if not ready:
                continue
            df = inputs[0]
            for extra in inputs[1:]:
                df = df.unionByName(extra, allowMissingColumns=True)
            for proc in pspec.get("processors", []):
                if proc not in processors_cfg:
                    raise ValueError(f"pipeline {pname!r}: unknown processor {proc!r}")
                df = apply_processor(df, proc, processors_cfg[proc])
            frames[pname] = df
            del pending[pname]
            progressed = True
        if not pending:
            break
        if not progressed:
            raise ValueError(f"pipeline cycle or unresolved connectors: {sorted(pending)}")
    return TranslatedPipelines(config=cfg, frames=frames)


def run_collector_config_streaming(
    spark: SparkSession,
    cfg: dict | str,
    out_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Run a collector config as a Structured Streaming job.

    The filelog receiver becomes a ``readStream`` text source (the poll loop
    of ``fileconsumer/file.go:114-131`` ⇒ Spark's file-source listing +
    ``checkpointLocation`` offsets); each micro-batch replays the ENTIRE
    translated component graph — processors, connectors, exporters — in
    batch mode via ``foreachBatch``, with file exporters appending. That is
    exactly the collector's execution shape: per-poll batches flowing
    through the same static pipeline graph, restartable from the checkpoint.

    One streaming filelog receiver is supported per config (the collector's
    common shape). A ``multiline`` block on the receiver runs as a TRUE
    stateful streaming recombine (``applyInPandasWithState`` keeps the open
    entry per file across micro-batches, force-flushing on the 5s
    processing-time timeout — ``transformer/recombine/config.go:40-62``)
    upstream of the per-batch component graph.
    """
    import os

    if isinstance(cfg, str):
        import yaml

        with open(cfg) as f:
            cfg = yaml.safe_load(f)

    receivers_cfg = cfg.get("receivers", {})
    file_receivers = [
        n for n in receivers_cfg if n.split("/")[0] in ("filelog", "file_log")
    ]
    if len(file_receivers) != 1:
        raise ValueError("streaming mode supports exactly one filelog receiver")
    name = file_receivers[0]
    spec = receivers_cfg[name] or {}

    reader = spark.readStream
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    paths = list(spec.get("include", []))
    # the streaming text source wants a directory/glob, not a literal file:
    # a single-file include streams its parent dir with a pathGlobFilter
    # (same matching the poller's Glob does over include patterns)
    if len(paths) == 1 and os.path.isfile(paths[0]):
        reader = reader.option("pathGlobFilter", os.path.basename(paths[0]))
        path = os.path.dirname(paths[0])
    else:
        path = paths[0] if len(paths) == 1 else "{" + ",".join(paths) + "}"
    raw = reader.text(path)

    ml = spec.get("multiline")
    if ml:
        # multiline entries are assembled by the STATEFUL recombine before
        # the component graph: the open entry per file survives across
        # micro-batches (and file-append polls) in the group state instead
        # of being cut at batch boundaries
        from ..streaming.stream import stateful_recombine_stream

        if not (ml.get("line_start_pattern") or ml.get("line_end_pattern")):
            raise ValueError("multiline needs line_start_pattern or line_end_pattern")
        lines = raw.withColumnRenamed("value", "body").withColumn(
            "_input_file", F.input_file_name()
        )

        def _add_line_ids(batches):
            # monotonically_increasing_id() is rejected on streaming plans;
            # same contract by hand: partitionId<<40 + row counter. File
            # splits enumerate in offset order, so the id is monotone in
            # line order within each file.
            import numpy as np
            from pyspark import TaskContext

            ctx = TaskContext.get()
            base = (ctx.partitionId() if ctx is not None else 0) << 40
            n = 0
            for pdf in batches:
                pdf = pdf.copy()
                pdf["_line_id"] = base + np.arange(n, n + len(pdf), dtype="int64")
                n += len(pdf)
                yield pdf

        lines = lines.mapInPandas(
            _add_line_ids, schema="body string, _input_file string, _line_id long"
        )
        stream_df = stateful_recombine_stream(
            lines,
            source_col="_input_file",
            order_col="_line_id",
            body_col="body",
            first_pattern=ml.get("line_start_pattern"),
            last_pattern=ml.get("line_end_pattern"),
        )
    else:
        stream_df = raw

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if ml:
            df = batch_df.drop("recombined_n")
        else:
            df = (
                batch_df.withColumnRenamed("value", "body")
                .withColumn("_input_file", F.input_file_name())
                .withColumn("_line_id", F.monotonically_increasing_id())
            )
        t = load_collector_config(spark, cfg, receiver_frames={name: df})
        t.write(out_dir, mode="append")

    writer = stream_df.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", os.path.join(out_dir, "_checkpoint")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _connector_output(cname, cspec, target_pipeline, pipelines, frames):
    """Frame a connector delivers INTO target_pipeline, or None if its
    feeder pipelines aren't evaluated yet."""
    kind = cname.split("/")[0]
    feeders = [
        p for p, ps in pipelines.items() if cname in (ps.get("exporters") or [])
    ]
    if any(f not in frames for f in feeders):
        return None
    src = None
    for f in feeders:
        src = frames[f] if src is None else src.unionByName(frames[f], allowMissingColumns=True)
    if src is None:
        raise ValueError(f"connector {cname!r} has no feeding pipeline")
    if kind == "routing":
        table = routing_conditions(cspec or {})
        routes = []
        target_route = None
        for i, (cond_str, targets) in enumerate(table):
            rname = f"r{i}"
            routes.append(conn.Route(rname, _compile_expr(src, cond_str)))
            if target_pipeline in targets:
                target_route = rname
        routed = conn.routed_frame(src, routes)
        if target_route is not None:
            return routed.filter(F.col("route_id") == target_route).drop("route_id")
        if target_pipeline in (cspec.get("default_pipelines") or []):
            return routed.filter(F.col("route_id") == "default").drop("route_id")
        raise ValueError(
            f"pipeline {target_pipeline!r} not a target of connector {cname!r}"
        )
    if kind == "count":
        metrics = []
        logs_spec = (cspec or {}).get("logs") or {"log.record.count": {}}
        for mname, mspec in logs_spec.items():
            mspec = mspec or {}
            conds = [
                _compile_expr(src, c) & _compile_expr(src, c).isNotNull()
                for c in mspec.get("conditions", [])
            ]
            dims = [_field(a["key"]) for a in mspec.get("attributes", [])]
            defaults = {
                _field(a["key"]): a["default_value"]
                for a in mspec.get("attributes", [])
                if "default_value" in a
            }
            metrics.append(
                conn.CountMetric(name=mname, conditions=conds, dimensions=dims, defaults=defaults)
            )
        out = conn.count_connector(src, metrics)
        frames_list = []
        for mname, frame in out.items():
            frames_list.append(frame.withColumn("metric_name", F.lit(mname)))
        res = frames_list[0]
        for extra in frames_list[1:]:
            res = res.unionByName(extra, allowMissingColumns=True)
        return res
    if kind == "sum":
        # connector/sumconnector/config.go:28-34: logs.{metric}: source
        # attribute summed per dimension set under OR'd conditions
        frames_list = []
        for mname, mspec in ((cspec or {}).get("logs") or {}).items():
            mspec = mspec or {}
            cond = None
            for c in mspec.get("conditions", []):
                col = _compile_expr(src, c)
                cond = col if cond is None else (cond | col)
            dims = [_field(a["key"]) for a in mspec.get("attributes", [])]
            out = conn.sum_connector(
                src,
                source_attribute=_field(mspec["source_attribute"]),
                dimensions=dims,
                condition=cond,
                name="sum",
            )
            frames_list.append(out.withColumn("metric_name", F.lit(mname)))
        if not frames_list:
            raise ValueError(f"sum connector {cname!r} defines no logs metrics")
        res = frames_list[0]
        for extra in frames_list[1:]:
            res = res.unionByName(extra, allowMissingColumns=True)
        return res
    if kind == "spanmetrics":
        # connector/spanmetricsconnector/config.go:43-141 — dimensions[].name,
        # histogram.explicit.buckets (durations) or histogram.exponential;
        # flat-model extensions: duration_field (default `duration`),
        # trace_field for exemplars
        cspec = cspec or {}
        dims = [_field(d["name"]) for d in cspec.get("dimensions", [])]
        dur = _field(cspec.get("duration_field") or "duration")
        hist = cspec.get("histogram") or {}
        if "exponential" in hist:
            return conn.span_metrics_exponential(
                src, dims, dur, scale=(hist["exponential"] or {}).get("scale", 2)
            )
        buckets = None
        if "explicit" in hist and (hist["explicit"] or {}).get("buckets"):
            buckets = [_duration_ms(b) for b in hist["explicit"]["buckets"]]
        ex = bool((cspec.get("exemplars") or {}).get("enabled"))
        return conn.span_metrics(
            src, dims, dur, explicit_buckets=buckets, exemplars=ex,
            trace_col=_field(cspec.get("trace_field") or "trace_id") if ex else None,
        )
    if kind == "otlpjson":
        # connector/otlpjsonconnector logs→logs: unmarshal OTLP/JSON bodies
        # into flat records; non-log/invalid payloads skip (logs.go:43-79)
        return conn.otlpjson_logs_connector(src, body_col=(cspec or {}).get("body_field", "body"))
    if kind == "signaltometrics":
        # connector/signaltometricsconnector config/config.go:232-311 — each
        # logs entry carries exactly one metric shape (sum/gauge/histogram/
        # exponential_histogram) with an OTTL value and OR'd conditions
        defs = []
        for mspec in (cspec or {}).get("logs") or []:
            shape, shape_spec = None, {}
            for t in ("sum", "gauge", "histogram", "exponential_histogram"):
                if t in mspec:
                    shape, shape_spec = t, mspec[t] or {}
            if shape is None:
                raise ValueError(
                    f"signaltometrics metric {mspec.get('name')!r} defines no shape"
                )
            defs.append(
                conn.SignalMetricDef(
                    name=mspec["name"],
                    value=str(shape_spec.get("value", "1")),
                    metric_type=shape,
                    conditions=mspec.get("conditions") or [],
                    attributes=mspec.get("attributes") or [],
                    monotonic=bool(shape_spec.get("monotonic", True)),
                    buckets=shape_spec.get("buckets"),
                    scale=int(shape_spec.get("scale", 2)),
                )
            )
        if not defs:
            raise ValueError(f"signaltometrics connector {cname!r} defines no logs metrics")
        out = conn.signal_to_metrics(src, defs)
        frames_list = [
            frame.withColumn("metric_name", F.lit(mname))
            for mname, frame in out.items()
        ]
        res = frames_list[0]
        for extra in frames_list[1:]:
            res = res.unionByName(extra, allowMissingColumns=True)
        return res
    raise ValueError(f"unsupported connector {cname!r}")


def _duration_ms(v) -> float:
    """'100ms' / '2s' / numeric milliseconds → float milliseconds."""
    if isinstance(v, (int, float)):
        return float(v)
    m = re.fullmatch(r"(\d+(?:\.\d+)?)(ms|s|m|h)?", str(v).strip())
    if not m:
        raise ValueError(f"bad duration {v!r}")
    mult = {"ms": 1, "s": 1000, "m": 60_000, "h": 3_600_000, None: 1}[m.group(2)]
    ms = float(m.group(1)) * mult
    # whole-ms buckets keep clean le_<N> histogram column names
    return int(ms) if ms.is_integer() else ms
