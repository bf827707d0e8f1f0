"""YAML/dict pipeline config composition (registry.go analog)."""

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.plans.config import build_pipeline


def test_config_pipeline_end_to_end(spark, tokens_path):
    cfg = {
        "source": {"type": "tokens", "path": tokens_path},
        "stages": [
            {
                "type": "regex_parser",
                "pattern": r"^(?P<ts>\S+) (?P<sev>\S+) \[(?P<component>[^\]]+)\]",
                "parse_from": "body",
            },
            {"type": "severity_parser", "parse_from": "sev"},
            {"type": "lookup", "dim": "dim_source", "on": "source"},
            {"type": "transform", "statements": ['set(flag, "hot") where severity_number >= 17']},
            {"type": "filter", "conditions": ["severity_number == 0"]},
        ],
        "routes": [
            {"name": "sink_errors", "condition": "severity_number >= 17"},
            {"name": "sink_prod", "condition": 'k8s_namespace_name == "prod"'},
        ],
    }
    sinks = build_pipeline(cfg)(spark)
    assert set(sinks) == {"sink_errors", "sink_prod", "default"}
    err = sinks["sink_errors"]
    rows = err.select("severity_number", "flag").distinct().collect()
    assert all(r.severity_number >= 17 and r.flag == "hot" for r in rows)
    assert sinks["sink_prod"].filter(F.col("k8s_namespace_name") != "prod").count() == 0
    # filter stage dropped severity 0 everywhere
    assert sinks["default"].filter(F.col("severity_number") == 0).count() == 0


def test_yaml_roundtrip(spark, tokens_path, tmp_path):
    import yaml

    from opentelemetry_collector_contrib_spark.plans.config import load_yaml_pipeline

    cfg = {
        "pipeline": {
            "source": {"type": "tokens", "path": tokens_path},
            "stages": [{"type": "add", "field": "env", "value": "prod"}],
        }
    }
    p = tmp_path / "p.yaml"
    p.write_text(yaml.safe_dump(cfg))
    sinks = load_yaml_pipeline(str(p))(spark)
    assert sinks["default"].select("env").first().env == "prod"


def test_unknown_stage_raises():
    with pytest.raises(ValueError, match="unknown stage type"):
        build_pipeline({"source": {"type": "tokens", "path": "x"}, "stages": [{"type": "nope"}]})
