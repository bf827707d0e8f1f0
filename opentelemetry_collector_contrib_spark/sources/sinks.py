"""Exporters / sinks — fileexporter & awss3exporter semantics on Spark writers.

Reference anchors:
- ``exporter/fileexporter/config.go:41-137``: format json/proto, compression,
  rotation, flush, and ``group_by``: split output files by a resource
  attribute (grouping_file_exporter.go).
- ``exporter/awss3exporter/config.go:35-40,75-80``: strftime partition format
  (s3_partition_format), per-time-bucket object layout.
- ``exporter/loadbalancingexporter/config.go:17-53``: consistent-hash ring
  on a routing key ⇒ repartition(hash(key)) so one downstream partition sees
  a stable slice of keys.

Spark mapping: every variant is a partitioned columnar write — the physical
file split IS the grouping. JSON-lines output uses Spark's json writer
(whole-stage codegen serialization, no Python).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def file_exporter(
    df: DataFrame,
    path: str,
    format: str = "parquet",
    group_by: str | None = None,
    compression: str | None = None,
    mode: str = "overwrite",
) -> None:
    """fileexporter: JSON-lines or parquet, optional group_by file split.

    ``group_by: attr`` (grouping_file_exporter.go) ⇒ ``partitionBy(attr)`` —
    one directory per attribute value, exactly the reference's one-file-per
    -group behavior but columnar and atomic (_SUCCESS commit).
    """
    w = df.write.mode(mode)
    if group_by:
        w = w.partitionBy(group_by)
    if compression:
        w = w.option("compression", compression)
    if format == "json":
        w.json(path)
    elif format == "parquet":
        w.parquet(path)
    elif format == "iceberg":
        # table-format switch (sources/table_format.py): needs the Iceberg
        # Spark runtime on the classpath
        w.format("iceberg").save(path)
    else:
        raise ValueError(f"unsupported format {format!r}")


def s3_time_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str = "timestamp",
    granularity: str = "hour",
    mode: str = "overwrite",
) -> None:
    """awss3exporter's strftime partition layout: year=/month=/day=/hour=.

    Hive-style partition columns give partition PRUNING on read — a time
    -range query scans only its buckets (the strftime prefix achieved the
    same on S3 listings).
    """
    cols = {
        "year": F.year(ts_col),
        "month": F.month(ts_col),
        "day": F.dayofmonth(ts_col),
        "hour": F.hour(ts_col),
    }
    order = ["year", "month", "day", "hour"]
    keep = order[: order.index(granularity) + 1]
    out = df
    for k in keep:
        out = out.withColumn(k, cols[k])
    out.write.mode(mode).partitionBy(*keep).parquet(path)


def loadbalance_repartition(df: DataFrame, routing_key: str, num_partitions: int) -> DataFrame:
    """loadbalancingexporter: consistent-hash spread on a routing key.

    repartition(n, hash(key)) pins each key to a stable partition across
    runs — the ring semantics minus membership churn (Spark re-plans the
    whole job on topology change anyway).
    """
    return df.repartition(num_partitions, F.xxhash64(F.col(routing_key)))


def kafka_payload(
    df: DataFrame, key_col: str | None = None, value_cols: list[str] | None = None
) -> DataFrame:
    """Shape a frame into the Kafka sink contract: (key binary?, value binary).

    Reference: ``exporter/kafkaexporter`` marshals each record batch to a
    keyed message (otlp_json / otlp_proto); here value = JSON-lines of the
    selected columns (codegen'd ``to_json``, no Python), key = the routing
    column — Kafka partitions by key exactly like the exporter's
    partition_traces_by_id / resource-attribute keying.
    """
    cols = value_cols or [c for c in df.columns if c != key_col]
    value = F.to_json(F.struct(*[F.col(c) for c in cols])).cast("binary").alias("value")
    if key_col:
        return df.select(F.col(key_col).cast("string").cast("binary").alias("key"), value)
    return df.select(value)


def kafka_exporter(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    key_col: str | None = None,
    value_cols: list[str] | None = None,
) -> None:
    """kafkaexporter: batch write to a topic.

    The payload shaping (``kafka_payload``) is fully tested; the actual
    write needs the spark-sql-kafka connector on the classpath and a broker
    — neither exists in this sandbox, so the send itself is runtime-gated
    with a clear error. On a real cluster this is one line of
    ``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>``.
    """
    payload = kafka_payload(df, key_col, value_cols)
    try:
        (
            payload.write.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("topic", topic)
            .save()
        )
    except Exception as e:  # connector jar / broker absent
        raise RuntimeError(
            "kafka sink needs the spark-sql-kafka connector and a reachable "
            f"broker (bootstrap={bootstrap_servers!r}): {e}"
        ) from e


def kafka_stream_exporter(
    stream_df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint: str,
    key_col: str | None = None,
):
    """Streaming form: exactly-once-per-epoch Kafka sink via the commit log."""
    payload = kafka_payload(stream_df, key_col)
    return (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def stdout_exporter(df: DataFrame, n: int = 20) -> None:
    """stanza stdout output (operator/output/stdout/output.go:25-34)."""
    df.show(n, truncate=False)


def write_grouped_counts(df: DataFrame, out_dir: str, group_cols: list[str]) -> None:
    """count-connector sink: per-group counters as a small parquet table."""
    df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("count")).write.mode(
        "overwrite"
    ).parquet(os.path.join(out_dir, "counts"))


def failover_write(
    df: DataFrame,
    sinks: list,
    logger=None,
) -> int:
    """``connector/failoverconnector`` as a sink policy: try each sink
    callable (``fn(df) -> None``) in priority order; the first that succeeds
    wins, failures fall through to the next level — the reference's
    priority-level consumer rotation (failoverconnector README: levels with
    retry), collapsed to its batch meaning (per-write failover, no
    time-based retry state since a batch write either commits or raises).

    Returns the 0-based index of the sink that succeeded; raises the LAST
    error when every level fails (matching the reference's "all levels
    exhausted" propagation).
    """
    last_err: Exception | None = None
    for i, sink in enumerate(sinks):
        try:
            sink(df)
            return i
        except Exception as e:  # noqa: BLE001 — any sink failure falls through
            last_err = e
            if logger is not None:
                logger.warning("failover: sink %d failed: %s", i, e)
    assert last_err is not None
    raise last_err
