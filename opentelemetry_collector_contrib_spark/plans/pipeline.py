"""The flagship parse → enrich → route → aggregate pipeline.

This is the end-to-end slice from SURVEY.md §7 step 2, composed from the
operator stage functions. One Spark job covers:

  scan(tokens parquet/Iceberg)
    → decode (Arrow, zero-copy)
    → parse (regex line grammar + JSON variant, time + severity sub-parsers,
             on_error=send with _parse_error flag)          [stanza parsers]
    → enrich (broadcast dim_source → dim_namespace chain)   [k8sattributes]
    → route  (first-match-wins when-chain + copy route)     [routingconnector]
    → sinks  (partitionBy(route_id) parquet + _errors tee)  [fileexporter]
    → counts (per route × severity, per-sink accounting)    [countconnector]
    → _metrics / _lineage                                    [obsreport/checkpoint]

Scale notes: the hot path has NO shuffle until the final counts aggregation
(partial map-side combine ⇒ the exchange carries only group keys); the sink
write shuffles once on route_id so each sink's files are contiguous. Skewed
sources (noisy-svc ≈ 60%) are salted at write time — salting affects file
layout only, never keys or counts.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import connectors, enrich, parsers
from ..sources import tokens as tok
from .lineage import LineageLog

JSON_BODY_SCHEMA = (
    "ts string, level string, component string, user string, ip string, "
    "latency_ms int, msg string"
)


def salted_repartition(df: DataFrame, key: str, partitions: int, salt_buckets: int = 8) -> DataFrame:
    """Spread a skewed key across ``salt_buckets`` sub-partitions.

    The reference's loadbalancing exporter consistent-hash ring
    (``exporter/loadbalancingexporter/config.go:17-53``) is the precedent;
    a hot key (one source = 60% of rows) would otherwise pin one task.
    Salting only changes physical placement — keys and counts are untouched.
    """
    return df.repartition(
        partitions, F.col(key), F.pmod(F.xxhash64("doc_id"), F.lit(salt_buckets))
    )


def parse_stage(df: DataFrame, regex_mode: str = "column") -> DataFrame:
    """decode → line/JSON parse → time + severity. No shuffle."""
    df = tok.decode_tokens(df, "body")
    is_json = F.col("body").startswith("{")
    j = F.from_json(F.col("body"), JSON_BODY_SCHEMA)
    rx = parsers.java_regex(parsers.DEFAULT_LOG_PATTERN)
    line_ok = F.col("body").rlike(rx)

    def grp(i: int) -> Column:
        return F.when(line_ok, F.regexp_extract("body", rx, i))

    df = (
        df.withColumn("ts_raw", F.when(is_json, j["ts"]).otherwise(grp(1)))
        .withColumn("sev_raw", F.when(is_json, j["level"]).otherwise(grp(2)))
        .withColumn("component", F.when(is_json, j["component"]).otherwise(grp(3)))
        .withColumn("user", F.when(is_json, j["user"]).otherwise(grp(4)))
        .withColumn("ip", F.when(is_json, j["ip"]).otherwise(grp(5)))
        .withColumn(
            "latency_ms",
            F.when(is_json, j["latency_ms"]).otherwise(grp(6).try_cast("int")),
        )
        .withColumn("msg", F.when(is_json, j["msg"]).otherwise(grp(7)))
        .withColumn(
            "_parse_error",
            F.when(is_json, j.isNull() | j["ts"].isNull()).otherwise(~line_ok),
        )
    )
    df = parsers.time_parser(df, "ts_raw", "timestamp", "%Y-%m-%dT%H:%M:%S.%fZ")
    df = parsers.severity_parser(df, "sev_raw")
    # observed_timestamp: ingest time in the reference (entry.go:38-43); here
    # the deterministic event time stands in so tests are replayable.
    return df.withColumn("observed_timestamp", F.col("timestamp"))


def enrich_stage(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Broadcast dimension chain: source → namespace (k8sattributes analog)."""
    dim_source = spark.createDataFrame(tok.dim_source_rows())
    dim_ns = spark.createDataFrame(tok.dim_namespace_rows())
    df = enrich.broadcast_lookup(df, dim_source, "source")
    return enrich.broadcast_lookup(df, dim_ns, "k8s_namespace_name")


def default_routes() -> list[connectors.Route]:
    """FIXTURES.md §3 route table (routingconnector semantics)."""
    return [
        connectors.Route("sink_errors", F.col("severity_number") >= 17, "move"),
        connectors.Route("sink_audit", F.col("component") == "auth", "copy"),
        connectors.Route("sink_prod", F.col("k8s_namespace_name") == "prod", "move"),
    ]


def run_pipeline(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    regex_mode: str = "column",
    write_sinks: bool = True,
    salt_partitions: int | None = None,
) -> dict:
    """Full e2e run; returns the metrics dict (also persisted to _metrics).

    Resume: keyed by the input fingerprint — a rerun over an already-committed
    input is a no-op (checkpoint.go:24-60 semantics at job granularity).
    """
    lineage = LineageLog(out_dir)
    fingerprint = input_path.rstrip("/")
    if lineage.completed("pipeline", fingerprint):
        with open(os.path.join(out_dir, "_metrics", "metrics.json")) as f:
            return json.load(f)

    t0 = time.time()
    raw = tok.read_tokens(spark, input_path)
    parsed = parse_stage(raw, regex_mode)
    enriched = enrich_stage(spark, parsed)

    # on_error=send: flagged rows route to _errors, clean rows continue
    # (helper/transformer.go:142-173)
    errors = enriched.filter(F.col("_parse_error"))
    clean = enriched.filter(~F.col("_parse_error"))

    routed = connectors.routed_frame(clean, default_routes())
    if salt_partitions:
        routed = salted_repartition(routed, "route_id", salt_partitions)

    # Per-sink accounting via observe() — collected during the SAME action as
    # the write, no extra pass (the batch processor's accounting analog).
    from pyspark.sql import Observation

    obs = Observation("pipeline")
    routed = routed.observe(
        obs,
        F.count(F.lit(1)).alias("rows_routed"),
        F.sum((F.col("route_id") == "sink_errors").cast("long")).alias("sink_errors"),
        F.sum((F.col("route_id") == "sink_prod").cast("long")).alias("sink_prod"),
        F.sum((F.col("route_id") == "default").cast("long")).alias("sink_default"),
    )

    counts = (
        routed.groupBy("route_id", "severity_text")
        .agg(F.count(F.lit(1)).alias("count"))
    )
    dedup_counts = (
        routed.groupBy(
            F.window("observed_timestamp", "10 seconds").alias("w"), "source", "severity_number"
        )
        .agg(F.count(F.lit(1)).alias("log_count"))
    )

    if write_sinks:
        routed.write.mode("overwrite").partitionBy("route_id").parquet(
            os.path.join(out_dir, "routed")
        )
        # copy route (non-consuming tee): audit rows regardless of move target
        routed.filter(F.col("component") == "auth").write.mode("overwrite").parquet(
            os.path.join(out_dir, "sink_audit")
        )
        errors.write.mode("overwrite").parquet(os.path.join(out_dir, "_errors"))
        counts.write.mode("overwrite").parquet(os.path.join(out_dir, "counts"))
        dedup_counts.drop("w").write.mode("overwrite").parquet(
            os.path.join(out_dir, "dedup_counts")
        )
        routed_n = int(obs.get["rows_routed"])
    else:
        routed_n = routed.count()

    n_err = errors.count()
    metrics = {
        "rows_routed": routed_n,
        "rows_errors": n_err,
        "wall_s": round(time.time() - t0, 3),
    }
    os.makedirs(os.path.join(out_dir, "_metrics"), exist_ok=True)
    with open(os.path.join(out_dir, "_metrics", "metrics.json"), "w") as f:
        json.dump(metrics, f)
    lineage.commit("pipeline", fingerprint, routed_n + n_err, routed_n, metrics)
    return metrics


class LogPipeline:
    """Thin OO wrapper so configs/tests can compose stages individually."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def load(self, path: str) -> DataFrame:
        return tok.read_tokens(self.spark, path)

    def parse(self, df: DataFrame) -> DataFrame:
        return parse_stage(df)

    def enrich(self, df: DataFrame) -> DataFrame:
        return enrich_stage(self.spark, df)

    def route(self, df: DataFrame) -> DataFrame:
        return connectors.routed_frame(df, default_routes())
