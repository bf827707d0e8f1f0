"""Run a REAL collector-YAML document end-to-end on the Spark engine.

The config shape mirrors the reference's own testdata:
receiver/filelogreceiver/testdata/config.yaml (filelog + regex_parser with
timestamp:/severity: sub-parser blocks), processor/transformprocessor/
testdata/config.yaml (log_statements), connector/routingconnector/testdata/
config (route() where ... table), exporter file.
"""

import os

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.plans.collector_config import (
    load_collector_config,
)

LINES = [
    "2024-03-01 ERROR boom in auth",
    "2024-03-01 INFO hello world",
    "2024-03-02 WARN disk low",
    "2024-03-02 ERROR crash in db",
    "2024-03-02 DEBUG noisy detail",
    "not a log line",
]


@pytest.fixture(scope="module")
def log_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("collector_logs")
    p = d / "simple.log"
    p.write_text("\n".join(LINES) + "\n")
    return str(p)


@pytest.fixture(scope="module")
def config(log_file):
    return {
        "receivers": {
            "filelog": {
                "include": [log_file],
                "start_at": "beginning",
                "operators": [
                    {
                        "type": "regex_parser",
                        "regex": r"^(?P<time>\d{4}-\d{2}-\d{2}) (?P<sev>[A-Z]*) (?P<msg>.*)$",
                        "timestamp": {"parse_from": "attributes.time", "layout": "%Y-%m-%d"},
                        "severity": {"parse_from": "attributes.sev"},
                    },
                ],
            }
        },
        "processors": {
            "transform": {
                "log_statements": [
                    {
                        "context": "log",
                        "statements": [
                            'set(env, "prod")',
                            'set(flagged, "yes") where severity_number >= 17',
                        ],
                    }
                ]
            },
            "filter/drop_debug": {"logs": {"log_record": ["severity_number == 5"]}},
        },
        "connectors": {
            "routing": {
                "default_pipelines": ["logs/other"],
                "table": [
                    {
                        "statement": "route() where severity_number >= 17",
                        "pipelines": ["logs/errors"],
                    }
                ],
            }
        },
        "exporters": {
            "file/errors": {"path": "unused", "format": "json"},
            "file/other": {"path": "unused", "format": "parquet"},
        },
        "service": {
            "pipelines": {
                "logs/in": {
                    "receivers": ["filelog"],
                    "processors": ["transform", "filter/drop_debug"],
                    "exporters": ["routing"],
                },
                "logs/errors": {"receivers": ["routing"], "exporters": ["file/errors"]},
                "logs/other": {"receivers": ["routing"], "exporters": ["file/other"]},
            }
        },
    }


def test_collector_yaml_end_to_end(spark, config, tmp_path):
    t = load_collector_config(spark, config)

    # parse + sub-parsers: severity + timestamp promoted
    inp = t.frames["logs/in"]
    rows = {r.msg: r for r in inp.collect() if r.msg is not None}
    assert rows["boom in auth"].severity_text == "ERROR"
    assert rows["boom in auth"].severity_number == 17
    assert str(rows["boom in auth"].timestamp).startswith("2024-03-01")
    # transform processor applied
    assert rows["boom in auth"].env == "prod" and rows["boom in auth"].flagged == "yes"
    assert rows["hello world"].flagged is None
    # filter processor dropped DEBUG (severity 5)
    assert "noisy detail" not in rows
    # unparseable line flows with _parse_error (on_error=send)
    errs = inp.filter("_parse_error").count()
    assert errs == 1

    # routing connector: first-match move
    errors = {r.msg for r in t.frames["logs/errors"].collect()}
    other = {r.msg for r in t.frames["logs/other"].collect()}
    assert errors == {"boom in auth", "crash in db"}
    assert "hello world" in other and "disk low" in other
    assert errors.isdisjoint(other)

    # file exporters materialize under out_dir per (pipeline, exporter)
    written = t.write(str(tmp_path))
    assert ("logs/errors", "file/errors") in written
    files = os.listdir(written[("logs/errors", "file/errors")])
    assert any(f.endswith(".json") for f in files)


def test_collector_count_connector(spark, config, log_file):
    cfg = dict(config)
    cfg["connectors"] = {
        "count": {
            "logs": {
                "sev.count": {
                    "attributes": [{"key": "sev", "default_value": "none"}],
                }
            }
        }
    }
    cfg["service"] = {
        "pipelines": {
            "logs/in": {
                "receivers": ["filelog"],
                "processors": ["transform", "filter/drop_debug"],
                "exporters": ["count"],
            },
            "logs/counts": {"receivers": ["count"], "exporters": ["file/other"]},
        }
    }
    t = load_collector_config(spark, cfg)
    counts = {r.sev: r["count"] for r in t.frames["logs/counts"].collect()}
    assert counts["ERROR"] == 2 and counts["INFO"] == 1 and counts["WARN"] == 1
    assert counts["none"] == 1  # the unparseable line: default_value bucket


def test_logstransform_processor(spark, config):
    """processor/logstransformprocessor: stanza operators as a processor."""
    cfg = dict(config)
    cfg["processors"] = {
        "logstransform": {
            "operators": [
                {"type": "add", "field": "attributes.stage", "value": "lt"},
                {"type": "copy", "from": "attributes.sev", "to": "attributes.sev2"},
            ]
        }
    }
    cfg["service"] = {
        "pipelines": {
            "logs/in": {
                "receivers": ["filelog"],
                "processors": ["logstransform"],
                "exporters": ["file/other"],
            }
        }
    }
    t = load_collector_config(spark, cfg)
    r = t.frames["logs/in"].filter("msg = 'boom in auth'").first()
    assert r.stage == "lt" and r.sev2 == "ERROR"


def test_filelog_multiline_start_pattern(spark, tmp_path):
    """split.go line_start_pattern: java-stack-trace style grouping."""
    p = tmp_path / "stack.log"
    p.write_text(
        "ERROR boom\n  at a.b.c\n  at d.e.f\nERROR second\n  at x.y.z\n"
    )
    cfg = {
        "receivers": {
            "filelog": {
                "include": [str(p)],
                "multiline": {"line_start_pattern": r"^ERROR"},
            }
        },
        "service": {"pipelines": {"logs": {"receivers": ["filelog"], "exporters": []}}},
    }
    t = load_collector_config(spark, cfg)
    bodies = sorted(r.body for r in t.frames["logs"].collect())
    assert bodies == [
        "ERROR boom\n  at a.b.c\n  at d.e.f",
        "ERROR second\n  at x.y.z",
    ]


def test_container_operator_partials_and_path_metadata(spark, tmp_path):
    """container parser: CRI partial lines (logtag P) recombine into the F
    line (config.go:24) and k8s metadata extracts from the kubelet path
    (parser.go:34)."""
    d = tmp_path / "default_mypod_11111111-2222-3333-4444-555555555555" / "app"
    d.mkdir(parents=True)
    p = d / "0.log"
    p.write_text(
        "2024-01-01T00:00:01Z stdout P part-one-\n"
        "2024-01-01T00:00:02Z stdout P part-two-\n"
        "2024-01-01T00:00:03Z stdout F done\n"
        "2024-01-01T00:00:04Z stderr F whole\n"
    )
    cfg = {
        "receivers": {
            "filelog": {
                "include": [str(p)],
                "operators": [{"type": "container"}],
            }
        },
        "service": {"pipelines": {"logs": {"receivers": ["filelog"], "exporters": []}}},
    }
    t = load_collector_config(spark, cfg)
    rows = {r.log: r for r in t.frames["logs"].collect()}
    assert "part-one-part-two-done" in rows  # combine_with "" joins partials
    assert rows["part-one-part-two-done"].recombined_n == 3
    assert rows["whole"].stream == "stderr"
    meta = rows["whole"]
    assert meta.k8s_namespace_name == "default"
    assert meta.k8s_pod_name == "mypod"
    assert meta.k8s_container_name == "app"
    assert meta.k8s_container_restart_count == "0"


def test_streaming_collector_config(spark, config, tmp_path):
    """The same config document runs as a Structured Streaming job: each
    micro-batch replays the full component graph, exporters append,
    restart resumes from the checkpoint (no reprocessing)."""
    import json
    import os

    from opentelemetry_collector_contrib_spark.plans.collector_config import (
        run_collector_config_streaming,
    )

    out = str(tmp_path / "out")
    q = run_collector_config_streaming(spark, config, out, available_now=True)
    q.awaitTermination(120)
    err_dir = os.path.join(out, "logs_errors__file_errors")
    rows = []
    for f in os.listdir(err_dir):
        if f.endswith(".json"):
            with open(os.path.join(err_dir, f)) as fh:
                rows += [json.loads(line) for line in fh if line.strip()]
    assert {r["msg"] for r in rows} == {"boom in auth", "crash in db"}
    assert all(r["flagged"] == "yes" for r in rows)
    # restart with the same checkpoint: no new input ⇒ nothing re-emitted
    n_before = len(rows)
    q2 = run_collector_config_streaming(spark, config, out, available_now=True)
    q2.awaitTermination(120)
    rows2 = 0
    for f in os.listdir(err_dir):
        if f.endswith(".json"):
            with open(os.path.join(err_dir, f)) as fh:
                rows2 += sum(1 for line in fh if line.strip())
    assert rows2 == n_before


def test_streaming_collector_config_multiline(spark, tmp_path):
    """A receiver `multiline` block in STREAMING mode: entries are assembled
    by the stateful recombine (applyInPandasWithState) upstream of the
    per-batch graph — line_start_pattern opens an entry, continuation lines
    join it, the trailing open entry force-flushes on the state timeout."""
    import json
    import os

    from opentelemetry_collector_contrib_spark.plans.collector_config import (
        run_collector_config_streaming,
    )

    log = tmp_path / "ml.log"
    log.write_text(
        "\n".join(
            [
                "2024-03-01 ERROR boom",
                "  at frame one",
                "  at frame two",
                "2024-03-01 INFO fine",
                "2024-03-02 ERROR crash",
                "  at lonely frame",
            ]
        )
        + "\n"
    )
    cfg = {
        "receivers": {
            "filelog": {
                "include": [str(log)],
                "multiline": {"line_start_pattern": r"^\d{4}-\d{2}-\d{2} "},
                "operators": [
                    {
                        "type": "regex_parser",
                        "regex": r"^(?P<time>\d{4}-\d{2}-\d{2}) (?P<sev>[A-Z]*) (?P<msg>(?s:.*))$",
                        "severity": {"parse_from": "attributes.sev"},
                    },
                ],
            }
        },
        "exporters": {"file/all": {"path": "unused", "format": "json"}},
        "service": {
            "pipelines": {
                "logs/in": {"receivers": ["filelog"], "exporters": ["file/all"]}
            }
        },
    }
    out = str(tmp_path / "out")
    q = run_collector_config_streaming(spark, cfg, out, available_now=True)
    q.awaitTermination(120)
    rows = []
    d = os.path.join(out, "logs_in__file_all")
    for f in os.listdir(d):
        if f.endswith(".json"):
            with open(os.path.join(d, f)) as fh:
                rows += [json.loads(line) for line in fh if line.strip()]
    by_msg = {r["msg"].splitlines()[0]: r for r in rows if r.get("msg")}
    assert by_msg["boom"]["msg"] == "boom\n  at frame one\n  at frame two"
    assert by_msg["boom"]["sev"] == "ERROR"
    assert by_msg["fine"]["msg"] == "fine"
    # trailing open entry: force-flush timeout emits it before the
    # availableNow query drains
    assert by_msg["crash"]["msg"] == "crash\n  at lonely frame"


def test_transform_group_conditions(spark, config):
    """Per-group `conditions` guard every statement in the group
    (transformprocessor/internal/common/logs.go:97-116): conditions are
    OR'd, and a non-matching record is untouched by the whole group —
    including statements carrying their own `where` and fused map-editor
    runs."""
    cfg = dict(config)
    cfg["processors"] = {
        "transform": {
            "log_statements": [
                {
                    "context": "log",
                    "conditions": ['severity_text == "ERROR"', 'severity_text == "WARN"'],
                    "statements": [
                        'set(tagged, "hot")',
                        'set(also, "warned") where severity_text == "WARN"',
                    ],
                },
                {   # unconditioned group still applies to everything
                    "context": "log",
                    "statements": ['set(env, "prod")'],
                },
            ]
        },
    }
    cfg["service"] = {
        "pipelines": {
            "logs/in": {
                "receivers": ["filelog"],
                "processors": ["transform"],
                "exporters": [],
            },
        }
    }
    t = load_collector_config(spark, cfg)
    rows = {r.msg: r for r in t.frames["logs/in"].collect() if r.msg is not None}
    assert rows["boom in auth"].tagged == "hot"          # ERROR: condition hit
    assert rows["disk low"].tagged == "hot"              # WARN: second condition
    assert rows["hello world"].tagged is None            # INFO: group skipped
    assert rows["disk low"].also == "warned"             # where AND conditions
    assert rows["boom in auth"].also is None             # where false, cond true
    assert all(r.env == "prod" for r in rows.values())   # unguarded group

    # fused map-editor run under a group guard: non-matching rows keep the
    # map untouched (keep_keys/truncate_all skipped wholesale)
    from pyspark.sql import functions as F
    from opentelemetry_collector_contrib_spark.functions.ottl import transform_processor

    df = spark.createDataFrame(
        [("a", "ERROR"), ("b", "INFO")], ["id", "severity_text"]
    ).withColumn(
        "attributes",
        F.create_map(
            F.lit("keepme"), F.lit("longvalue"), F.lit("dropme"), F.lit("zz")
        ),
    )
    out = transform_processor(
        df,
        ['keep_keys(attributes, ["keepme"])', "truncate_all(attributes, 4)"],
        conditions=['severity_text == "ERROR"'],
    )
    got = {r.id: dict(r.attributes) for r in out.collect()}
    assert got["a"] == {"keepme": "long"}
    assert got["b"] == {"keepme": "longvalue", "dropme": "zz"}


def test_unsupported_component_raises(spark, config):
    cfg = {
        "receivers": {"otlp": {}},
        "service": {"pipelines": {"logs": {"receivers": ["otlp"], "exporters": []}}},
    }
    with pytest.raises(ValueError, match="unsupported receiver 'otlp'"):
        load_collector_config(spark, cfg)


def test_logdedup_processor_in_config(spark, config):
    """processor/logdedupprocessor via YAML: include_fields key the dedup,
    interval is the tumbling window, log_count_attribute names the count."""
    cfg = dict(config)
    cfg["processors"] = {
        "logdedup": {
            "include_fields": ["sev"],
            "interval": "60s",
            "log_count_attribute": "dedup_count",
        }
    }
    cfg["service"] = {
        "pipelines": {
            "logs/in": {
                "receivers": ["filelog"],
                "processors": ["logdedup"],
                "exporters": [],
            }
        }
    }
    t = load_collector_config(spark, cfg)
    rows = {r.sev: r.dedup_count for r in t.frames["logs/in"].collect() if r.sev}
    # fixture: 2 ERROR, 1 INFO, 1 WARN, 1 DEBUG lines (same timestamp day,
    # one 60s window per calendar day is irrelevant — both ERROR lines are
    # different days, so assert totals instead)
    total = sum(r.dedup_count for r in t.frames["logs/in"].collect())
    assert total == 6  # every input line counted exactly once
    assert set(rows) <= {"ERROR", "INFO", "WARN", "DEBUG", ""}


def test_drain_processor_in_config(spark, tmp_path):
    """processor/drainprocessor via YAML: template attribute attached by the
    true online Drain operator."""
    log = tmp_path / "drain.log"
    log.write_text(
        "\n".join(
            [
                "user alice logged in from hostalpha",
                "user bob logged in from hostbeta",
                "user carol logged in from hostgamma",
                "session closed for peer east",
                "session closed for peer west",
            ]
        )
        + "\n"
    )
    cfg = {
        "receivers": {"filelog": {"include": [str(log)]}},
        "processors": {
            "drain": {
                "tree_depth": 3,
                "merge_threshold": 0.4,
                "template_attribute": "log.record.template",
            }
        },
        "exporters": {},
        "service": {
            "pipelines": {
                "logs/in": {
                    "receivers": ["filelog"],
                    "processors": ["drain"],
                    "exporters": [],
                }
            }
        },
    }
    t = load_collector_config(spark, cfg)
    rows = {r.body: r.log_record_template for r in t.frames["logs/in"].collect()}
    assert rows["user bob logged in from hostbeta"] == "user <*> logged in from <*>"
    assert rows["session closed for peer east"] == "session closed for peer <*>"


def test_metrics_processors_in_config(spark):
    """The metrics-processor family translates: a metric frame flows
    through cumulativetodelta -> metricstransform (rename + scale +
    aggregate_labels) with flat-model series conventions."""
    rows = []
    for host in ("h1", "h2"):
        for i, v in enumerate([10.0, 15.0, 30.0, 31.0]):
            rows.append(("req.count", host, i, v))
    mf = spark.createDataFrame(rows, "metric_name string, host string, ts long, value double")
    cfg = {
        "receivers": {"inmem": {}},
        "processors": {
            "cumulativetodelta": {"series_keys": ["metric_name", "host"], "ts_field": "ts"},
            "metricstransform": {
                "value_field": "delta",
                "transforms": [
                    {
                        "include": "req.count",
                        "action": "update",
                        "new_name": "req.delta",
                        "operations": [
                            {"action": "experimental_scale_value", "experimental_scale": 2.0},
                            {"action": "aggregate_labels", "label_set": ["host"],
                             "aggregation_type": "sum"},
                        ],
                    }
                ],
            },
        },
        "exporters": {},
        "service": {
            "pipelines": {
                "metrics/in": {
                    "receivers": ["inmem"],
                    "processors": ["cumulativetodelta", "metricstransform"],
                    "exporters": [],
                }
            }
        },
    }
    t = load_collector_config(spark, cfg, receiver_frames={"inmem": mf})
    got = {
        (r.metric_name, r.host): (r.delta, r.points_merged)
        for r in t.frames["metrics/in"].collect()
    }
    # per-host deltas: 5,15,1 → sum 21; scaled ×2 → 42; 3 points merged
    assert got == {("req.delta", "h1"): (42.0, 3), ("req.delta", "h2"): (42.0, 3)}


def test_sum_connector_in_config(spark, config):
    """connector/sumconnector via YAML: source_attribute summed per
    dimension under a condition, bridging logs -> metrics pipelines."""
    cfg = dict(config)
    cfg["processors"] = {}
    cfg["connectors"] = {
        "sum": {
            "logs": {
                "chars.sum": {
                    "source_attribute": "attributes.msglen",
                    "conditions": ['sev != ""'],
                    "attributes": [{"key": "sev"}],
                }
            }
        }
    }
    cfg["receivers"]["filelog"]["operators"] = list(
        cfg["receivers"]["filelog"]["operators"]
    ) + [{"type": "add", "field": "attributes.msglen", "value": "EXPR(Len(msg))"}]
    cfg["service"] = {
        "pipelines": {
            "logs/in": {"receivers": ["filelog"], "exporters": ["sum"]},
            "metrics/sums": {"receivers": ["sum"], "exporters": []},
        }
    }
    t = load_collector_config(spark, cfg)
    got = {r.sev: r.sum for r in t.frames["metrics/sums"].collect()}
    # msg lengths: ERROR 'boom in auth'(12)+'crash in db'(11)=23,
    # INFO 'hello world'(11), WARN 'disk low'(8), DEBUG 'noisy detail'(12)
    assert got["ERROR"] == 23 and got["INFO"] == 11
    assert got["WARN"] == 8 and got["DEBUG"] == 12


def test_traces_pipeline_in_config(spark):
    """Traces path through the translator: tail_sampling (reference policy
    nesting) keeps slow/error traces, spanmetrics bridges to a metrics
    pipeline with explicit duration buckets."""
    rows = [
        # trace t1: 2 spans, has status 500 -> sampled by status_code
        ("t1", 0, "GET /a", 200, 30.0),
        ("t1", 1, "GET /a", 500, 80.0),
        # trace t2: fast + ok -> dropped by sampling
        ("t2", 2, "GET /b", 200, 10.0),
        # trace t3: numeric attribute above min -> sampled
        ("t3", 3, "GET /c", 200, 250.0),
    ]
    spans = spark.createDataFrame(
        rows, "trace_id string, ts long, span_name string, status_code int, duration double"
    )
    cfg = {
        "receivers": {"inmem": {}},
        "processors": {
            "tail_sampling": {
                "ts_field": "ts",
                "policies": [
                    {"name": "errs", "type": "status_code",
                     "status_code": {"status_codes": [500]}},
                    {"name": "slow", "type": "numeric_attribute",
                     "numeric_attribute": {"key": "duration", "min_value": 200.0}},
                ],
            }
        },
        "connectors": {
            "spanmetrics": {
                "dimensions": [{"name": "span_name"}],
                "histogram": {"explicit": {"buckets": ["50ms", "100ms", "200ms"]}},
            }
        },
        "exporters": {},
        "service": {
            "pipelines": {
                "traces/in": {
                    "receivers": ["inmem"],
                    "processors": ["tail_sampling"],
                    "exporters": ["spanmetrics"],
                },
                "metrics/span": {"receivers": ["spanmetrics"], "exporters": []},
            }
        },
    }
    t = load_collector_config(spark, cfg, receiver_frames={"inmem": spans})
    kept = {r.trace_id for r in t.frames["traces/in"].collect()}
    assert kept == {"t1", "t3"}  # t2 not sampled by any policy
    m = {r.span_name: (r.calls, r.le_50, r.le_100, r.le_200, r.le_inf)
         for r in t.frames["metrics/span"].collect()}
    assert m["GET /a"] == (2, 1, 1, 0, 0)   # 30ms<=50, 80ms<=100
    assert m["GET /c"] == (1, 0, 0, 0, 1)   # 250ms > 200
    assert "GET /b" not in m  # sampled out upstream of the connector


def test_resourcedetection_in_config(spark, config, monkeypatch):
    """resourcedetectionprocessor: env detector reads OTEL_RESOURCE_ATTRIBUTES
    (internal/env/env.go), static attributes merge, override=false keeps
    pre-existing values."""
    monkeypatch.setenv("OTEL_RESOURCE_ATTRIBUTES", "service.name=checkout, deployment.environment=prod")
    cfg = dict(config)
    cfg["processors"] = {
        "resourcedetection": {
            "detectors": ["env", "static"],
            "attributes": {"cloud.region": "eu-west-1"},
            "override": False,
        }
    }
    cfg["service"] = {
        "pipelines": {
            "logs/in": {
                "receivers": ["filelog"],
                "processors": ["resourcedetection"],
                "exporters": [],
            }
        }
    }
    t = load_collector_config(spark, cfg)
    r = t.frames["logs/in"].first()
    assert r.service_name == "checkout"
    assert r.deployment_environment == "prod"
    assert r.cloud_region == "eu-west-1"


def test_k8sattributes_in_config(spark, config):
    """k8sattributesprocessor: pod metadata (config-provided in this
    environment) broadcast-joins on the association key; unmatched rows
    keep nulls (association-failure path)."""
    cfg = dict(config)
    cfg["processors"] = {
        "k8sattributes": {
            "pod_association_key": "k8s.pod.name",
            "pod_metadata": [
                {"k8s.pod.name": "pod-a", "k8s.namespace.name": "prod",
                 "k8s.node.name": "node-1"},
            ],
        }
    }
    # attach a pod name column derived from severity for the join
    cfg["receivers"]["filelog"]["operators"] = list(
        cfg["receivers"]["filelog"]["operators"]
    ) + [{"type": "add", "field": "attributes.k8s_pod_name",
          "value": "EXPR(When(sev == \"ERROR\", \"pod-a\", nil))"}]
    cfg["service"] = {
        "pipelines": {
            "logs/in": {
                "receivers": ["filelog"],
                "processors": ["k8sattributes"],
                "exporters": [],
            }
        }
    }
    t = load_collector_config(spark, cfg)
    rows = {r.msg: r for r in t.frames["logs/in"].collect() if r.msg}
    assert rows["boom in auth"].k8s_namespace_name == "prod"
    assert rows["boom in auth"].k8s_node_name == "node-1"
    assert rows["hello world"].k8s_namespace_name is None  # no association


def test_lookup_and_geoip_in_config(spark, config):
    """lookup (broadcast dim join) and geoip (broadcast range join) from
    YAML with config-provided tables."""
    cfg = dict(config)
    cfg["processors"] = {
        "lookup": {
            "rows": [
                {"sev": "ERROR", "oncall": "team-a"},
                {"sev": "WARN", "oncall": "team-b"},
            ],
            "on": "sev",
        },
        "geoip": {
            "ip_field": "client_ip",
            "ranges": [
                {"ip_lo": 167772160, "ip_hi": 184549375, "geo_country": "PRIVATE-10"},
            ],
        },
    }
    cfg["receivers"]["filelog"]["operators"] = list(
        cfg["receivers"]["filelog"]["operators"]
    ) + [{"type": "add", "field": "attributes.client_ip", "value": "10.1.2.3"}]
    cfg["service"] = {
        "pipelines": {
            "logs/in": {
                "receivers": ["filelog"],
                "processors": ["lookup", "geoip"],
                "exporters": [],
            }
        }
    }
    t = load_collector_config(spark, cfg)
    rows = {r.msg: r for r in t.frames["logs/in"].collect() if r.msg}
    assert rows["boom in auth"].oncall == "team-a"
    assert rows["disk low"].oncall == "team-b"
    assert rows["hello world"].oncall is None
    assert rows["boom in auth"].geo_country == "PRIVATE-10"


def test_loadbalancing_exporter_in_config(spark, config, tmp_path):
    """loadbalancingexporter: consistent-hash endpoint assignment becomes a
    hive partition per endpoint; same key always lands on the same slice."""
    import os

    cfg = dict(config)
    cfg["processors"] = {}
    cfg["exporters"] = {
        "loadbalancing": {
            "routing_key": "sev",
            "resolver": {"static": {"hostnames": ["be-1", "be-2", "be-3"]}},
        }
    }
    cfg["service"] = {
        "pipelines": {
            "logs/in": {"receivers": ["filelog"], "exporters": ["loadbalancing"]}
        }
    }
    t = load_collector_config(spark, cfg)
    written = t.write(str(tmp_path))
    dest = written[("logs/in", "loadbalancing")]
    parts = sorted(d for d in os.listdir(dest) if d.startswith("endpoint="))
    assert parts  # at least one endpoint slice materialized
    back = spark.read.parquet(dest)
    # deterministic assignment: one endpoint per severity key
    per_key = back.filter("sev IS NOT NULL").groupBy("sev").agg(
        F.count_distinct("endpoint").alias("n")
    ).collect()
    assert per_key and all(r.n == 1 for r in per_key)


def test_signaltometrics_connector_in_config(spark, config):
    """connector/signaltometricsconnector via YAML: logs → metrics with an
    OTTL value expression, OR'd conditions, and attribute defaults."""
    cfg = dict(config)
    cfg["processors"] = {}
    cfg["connectors"] = {
        "signaltometrics": {
            "logs": [
                {
                    "name": "logrecord.count",
                    "sum": {"value": "1", "monotonic": True},
                    "attributes": [{"key": "sev", "default_value": "NONE"}],
                },
                {
                    "name": "msg.len.sum",
                    "sum": {"value": "Len(msg)"},
                    "conditions": ['sev == "ERROR"'],
                },
            ]
        }
    }
    cfg["service"] = {
        "pipelines": {
            "logs/in": {"receivers": ["filelog"], "exporters": ["signaltometrics"]},
            "metrics/out": {"receivers": ["signaltometrics"], "exporters": []},
        }
    }
    t = load_collector_config(spark, cfg)
    rows = t.frames["metrics/out"].collect()
    counts = {r.sev: r.value for r in rows if r.metric_name == "logrecord.count"}
    # LINES: ERROR x2, INFO x2, WARN x1, DEBUG x1 + 1 unparseable (sev null -> NONE)
    assert counts["ERROR"] == 2 and counts.get("NONE") == 1
    msum = [r.value for r in rows if r.metric_name == "msg.len.sum"]
    # 'boom in auth'(12) + 'crash in db'(11)
    assert msum == [23]


def test_otlpjson_connector_in_config(spark, config, tmp_path):
    """connector/otlpjsonconnector via YAML: a logs pipeline whose records
    carry OTLP/JSON payloads bridges into a second logs pipeline with the
    embedded records unmarshalled."""
    payload = (
        '{"resourceLogs":[{"resource":{"attributes":[{"key":"service.name",'
        '"value":{"stringValue":"svc-a"}}]},"scopeLogs":[{"scope":{},'
        '"logRecords":[{"severityNumber":9,"severityText":"Info",'
        '"body":{"stringValue":"embedded hello"},"attributes":'
        '[{"key":"k","value":{"stringValue":"v"}}]}]}]}]}'
    )
    log = tmp_path / "otlp.log"
    log.write_text(payload + "\n" + '{"resourceMetrics": []}' + "\nnot json\n")
    cfg = {
        "receivers": {"filelog": {"include": [str(log)]}},
        "processors": {},
        "connectors": {"otlpjson": {}},
        "exporters": {},
        "service": {
            "pipelines": {
                "logs/in": {"receivers": ["filelog"], "exporters": ["otlpjson"]},
                "logs/extracted": {"receivers": ["otlpjson"], "exporters": []},
            }
        },
    }
    t = load_collector_config(spark, cfg)
    rows = t.frames["logs/extracted"].collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.body == "embedded hello" and r.severity_text == "Info"
    assert dict(r.resource) == {"service.name": "svc-a"}
    assert dict(r.attributes) == {"k": "v"}
