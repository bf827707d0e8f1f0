"""End-to-end pipeline correctness vs a pure-Python oracle.

The oracle independently re-implements parse → enrich → route → count over
the decoded lines (pandas/stdlib, no Spark), mirroring the reference's
golden-file comparison (pkg/golden + plogtest.CompareLogs with
order-insensitive options).
"""

import re

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.functions.severity import (
    SEVERITY_TEXT_TO_NUMBER,
    NUMBER_TO_CANONICAL_TEXT,
)
from opentelemetry_collector_contrib_spark.operators import connectors
from opentelemetry_collector_contrib_spark.plans import pipeline as pl
from opentelemetry_collector_contrib_spark.sources import tokens as tok

RX = re.compile(pl.parsers.DEFAULT_LOG_PATTERN)


def oracle_sev_number(token):
    if token is None:
        return 0
    t = token.strip().lower()
    if t in SEVERITY_TEXT_TO_NUMBER:
        return SEVERITY_TEXT_TO_NUMBER[t]
    try:
        v = int(t)
    except ValueError:
        return 0
    if 1 <= v <= 24:
        return v
    if 200 <= v <= 299:
        return 9
    if 300 <= v <= 399:
        return 10
    if 400 <= v <= 499:
        return 13
    if 500 <= v <= 599:
        return 17
    return 0


def oracle_rows(n=2000, seed=42):
    """Decode + parse + enrich + route, entirely in Python."""
    import json

    t = tok.generate_tokens_table(n, seed)
    dim_s = {d["source"]: d for d in tok.dim_source_rows()}
    dim_n = {d["k8s_namespace_name"]: d for d in tok.dim_namespace_rows()}
    out = []
    for i in range(n):
        row = {
            "doc_id": t.column("doc_id")[i].as_py(),
            "source": t.column("source")[i].as_py(),
        }
        body = bytes(t.column("tokens")[i].as_py()).decode("utf-8")
        if body.startswith("{"):
            try:
                j = json.loads(body)
                row.update(
                    sev_raw=j.get("level"), component=j.get("component"), error=j.get("ts") is None
                )
            except ValueError:
                row.update(sev_raw=None, component=None, error=True)
        else:
            m = RX.match(body)
            if m:
                row.update(sev_raw=m.group("sev"), component=m.group("component"), error=False)
            else:
                row.update(sev_raw=None, component=None, error=True)
        row["severity_number"] = oracle_sev_number(row["sev_raw"])
        row["severity_text"] = NUMBER_TO_CANONICAL_TEXT.get(row["severity_number"], "DEFAULT")
        d = dim_s.get(row["source"], {})
        row["k8s_namespace_name"] = d.get("k8s_namespace_name")
        ns = dim_n.get(row["k8s_namespace_name"], {})
        row["team"] = ns.get("team")
        if row["error"]:
            row["route_id"] = None  # goes to _errors, not routed
        elif row["severity_number"] >= 17:
            row["route_id"] = "sink_errors"
        elif row["k8s_namespace_name"] == "prod":
            row["route_id"] = "sink_prod"
        else:
            row["route_id"] = "default"
        out.append(row)
    return out


@pytest.fixture(scope="module")
def pipeline_result(spark, tokens_path):
    raw = tok.read_tokens(spark, tokens_path)
    parsed = pl.parse_stage(raw)
    enriched = pl.enrich_stage(spark, parsed)
    clean = enriched.filter(~F.col("_parse_error"))
    routed = connectors.routed_frame(clean, pl.default_routes())
    return enriched, routed


def test_routed_row_equality(pipeline_result):
    """Per-row route assignment matches the oracle exactly (token-array
    equality is implied: doc_id is the row identity and tokens are carried
    through untouched)."""
    enriched, routed = pipeline_result
    got = {r.doc_id: r.route_id for r in routed.select("doc_id", "route_id").collect()}
    want = {r["doc_id"]: r["route_id"] for r in oracle_rows() if r["route_id"]}
    assert got == want


def test_error_rows_match_oracle(pipeline_result):
    enriched, _ = pipeline_result
    got = {r.doc_id for r in enriched.filter(F.col("_parse_error")).select("doc_id").collect()}
    want = {r["doc_id"] for r in oracle_rows() if r["error"]}
    assert got == want


def test_enrichment_matches_oracle(pipeline_result):
    enriched, _ = pipeline_result
    got = {
        r.doc_id: (r.k8s_namespace_name, r.team)
        for r in enriched.select("doc_id", "k8s_namespace_name", "team").collect()
    }
    for o in oracle_rows():
        assert got[o["doc_id"]] == (o["k8s_namespace_name"], o["team"])


def test_per_sink_counts(pipeline_result):
    _, routed = pipeline_result
    got = {
        (r.route_id, r.severity_text): r["count"]
        for r in routed.groupBy("route_id", "severity_text").count().collect()
    }
    import collections

    want = collections.Counter(
        (o["route_id"], o["severity_text"]) for o in oracle_rows() if o["route_id"]
    )
    assert got == dict(want)


def test_tokens_carried_through_unchanged(spark, tokens_path, pipeline_result):
    """Routed rows keep byte-exact token arrays (BASELINE per-row invariant)."""
    _, routed = pipeline_result
    orig = {r.doc_id: r.tokens for r in tok.read_tokens(spark, tokens_path).select("doc_id", "tokens").collect()}
    for r in routed.select("doc_id", "tokens").limit(500).collect():
        assert orig[r.doc_id] == r.tokens


def test_run_pipeline_and_resume(spark, tokens_path, tmp_path):
    out = str(tmp_path / "out")
    m1 = pl.run_pipeline(spark, tokens_path, out)
    assert m1["rows_routed"] > 0 and m1["rows_errors"] > 0
    # resume: second run is a lineage no-op returning identical metrics
    m2 = pl.run_pipeline(spark, tokens_path, out)
    assert m2 == m1
    # routed parquet partitioned by route_id exists; _errors is a partition
    routed = spark.read.parquet(str(tmp_path / "out" / "routed"))
    assert routed.count() == m1["rows_routed"] + m1["rows_errors"]
    assert routed.filter(F.col("route_id") == "_errors").count() == m1["rows_errors"]


def test_slim_parse_matches_full(spark, tokens_path, tmp_path):
    """The column-pruned kernel (keep=...) emits exactly the same values for
    the kept columns as the full-width parse, and the sinkless run_pipeline
    (which uses it) reports metrics identical to the sinks run."""
    raw = tok.read_tokens(spark, tokens_path)
    cols = ["doc_id", "source", "component", "severity_number", "severity_text", "_parse_error"]
    full = pl.parse_stage(raw).select(*cols)
    slim = pl.parse_stage(
        raw.select("doc_id", "source", "tokens"), keep=set(cols)
    ).select(*cols)
    assert sorted(map(tuple, full.collect())) == sorted(map(tuple, slim.collect()))

    m_sink = pl.run_pipeline(spark, tokens_path, str(tmp_path / "a"), write_sinks=True)
    m_slim = pl.run_pipeline(spark, tokens_path, str(tmp_path / "b"), write_sinks=False)
    assert (m_slim["rows_routed"], m_slim["rows_errors"]) == (
        m_sink["rows_routed"], m_sink["rows_errors"])
