"""Collector-style pipeline config → composed DataFrame stages.

The reference wires receivers→processors→connectors→exporters from YAML
(stanza operator lists are type-dispatched via a registry,
``pkg/stanza/operator/registry.go:6-33``; the collector service builds the
pipeline graph). Here a config dict/YAML composes the same graph from the
stage-function registry below — a linear/branching chain of
``DataFrame -> DataFrame`` callables.

Example::

    pipeline:
      source: {type: tokens, path: /data/tokens}
      stages:
        - {type: regex_parser, pattern: '...', parse_from: body}
        - {type: severity_parser, parse_from: sev}
        - {type: transform, statements: ['set(x, "1") where body == "y"']}
        - {type: filter, conditions: ['severity_number < 9']}
        - {type: lookup, dim: dim_source, on: source}
      routes:
        - {name: sink_errors, condition: 'severity_number >= 17'}
      sinks: {out_dir: /data/out}
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import ottl
from ..operators import connectors, parsers, processors, transformers

StageFn = Callable[..., DataFrame]

# type name → builder, mirroring operator/registry.go's Register map
STAGE_REGISTRY: dict[str, StageFn] = {
    "regex_parser": parsers.regex_parser,
    "json_parser": parsers.json_parser,
    "csv_parser": parsers.csv_parser,
    "key_value_parser": parsers.keyvalue_parser,
    "time_parser": parsers.time_parser,
    "severity_parser": parsers.severity_parser,
    "trace_parser": parsers.trace_parser,
    "uri_parser": parsers.uri_parser,
    "container": parsers.container_parser,
    "add": transformers.add,
    "move": transformers.move,
    "copy": transformers.copy,
    "remove": transformers.remove,
    "retain": transformers.retain,
    "flatten": transformers.flatten,
    "assign_keys": transformers.assign_keys,
    "regex_replace": transformers.regex_replace,
    "unquote": transformers.unquote,
    "noop": transformers.noop,
    "attributes": processors.attributes_actions,
    "redaction": processors.redaction,
    "unroll": processors.unroll,
    "group_by_attrs": processors.group_by_attrs,
}


def build_stage(spec: dict) -> Callable[[DataFrame], DataFrame]:
    """One config entry → a DataFrame->DataFrame closure."""
    spec = dict(spec)
    typ = spec.pop("type")
    if typ == "transform":
        stmts = spec["statements"]
        return lambda df: ottl.transform_processor(df, stmts, spec.get("error_mode", "ignore"))
    if typ == "filter":
        conds = spec["conditions"]
        return lambda df: ottl.filter_processor_ottl(df, conds)
    if typ == "grok_parser":
        from ..functions.grok import grok_parser

        return lambda df: grok_parser(df, **spec)
    if typ == "lookup":
        from ..operators.enrich import broadcast_lookup

        dim_ref = spec.pop("dim")
        on = spec.pop("on")
        return lambda df, _d=dim_ref, _o=on, _s=spec: broadcast_lookup(
            df, _resolve_dim(df.sparkSession, _d), _o, **_s
        )
    if typ == "resource_detection":
        from ..operators.enrich import resource_detection

        return lambda df: resource_detection(df, spec["detected"], spec.get("override", False))
    fn = STAGE_REGISTRY.get(typ)
    if fn is None:
        raise ValueError(f"unknown stage type {typ!r}")
    return lambda df: fn(df, **spec)


_DIM_SOURCES: dict[str, Callable[[SparkSession], DataFrame]] = {}


def register_dim(name: str, provider: Callable[[SparkSession], DataFrame]) -> None:
    _DIM_SOURCES[name] = provider


def _resolve_dim(spark: SparkSession, ref: str) -> DataFrame:
    if ref in _DIM_SOURCES:
        return _DIM_SOURCES[ref](spark)
    return spark.read.parquet(ref)  # path reference


# built-in fixture dims
def _dim_source(spark: SparkSession) -> DataFrame:
    from ..sources.tokens import dim_source_rows

    return spark.createDataFrame(dim_source_rows())


def _dim_namespace(spark: SparkSession) -> DataFrame:
    from ..sources.tokens import dim_namespace_rows

    return spark.createDataFrame(dim_namespace_rows())


register_dim("dim_source", _dim_source)
register_dim("dim_namespace", _dim_namespace)


def build_pipeline(config: dict) -> Callable[[SparkSession], dict[str, DataFrame]]:
    """Full config → runner returning {sink_name: DataFrame}."""
    stage_fns = [build_stage(s) for s in config.get("stages", [])]
    route_specs = config.get("routes", [])

    def run(spark: SparkSession) -> dict[str, DataFrame]:
        src = config["source"]
        if src["type"] == "tokens":
            from ..sources.tokens import read_tokens, decode_tokens

            df = decode_tokens(read_tokens(spark, src["path"]))
        elif src["type"] == "parquet":
            df = spark.read.parquet(src["path"])
        else:
            raise ValueError(f"unknown source type {src['type']!r}")
        for fn in stage_fns:
            df = fn(df)
        if not route_specs:
            return {"default": df}
        compiler = ottl.Compiler(ottl.PathResolver(df))
        routes = [
            connectors.Route(r["name"], compiler.compile_condition(r["condition"]), r.get("action", "move"))
            for r in route_specs
        ]
        return connectors.route_fanout(df, routes)

    return run


def load_yaml_pipeline(path: str) -> Callable[[SparkSession], dict[str, DataFrame]]:
    import yaml  # available transitively via pyspark deps

    with open(path) as f:
        cfg = yaml.safe_load(f)
    return build_pipeline(cfg["pipeline"])
