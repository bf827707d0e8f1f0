"""Structured Streaming variants of the pipeline stages.

The collector is natively a streaming system (poll → parse → consume with
at-least-once checkpoints); this module re-expresses the same stages on
Spark Structured Streaming:

- source: ``readStream`` over the tokens table directory (file source —
  the filelog receiver's poll loop ``fileconsumer/file.go:114-131`` becomes
  Spark's file-source listing + ``checkpointLocation`` offsets, the exact
  analog of the per-file offset checkpoints in
  ``internal/checkpoint/checkpoint.go:24-44``)
- stages: parse / enrich / route are the SAME stage functions as batch —
  they are shuffle-free narrow transformations, legal in streaming
- sinks: ``foreachBatch`` writes routed parquet + counters per micro-batch
  (the batch processor's send_batch_size/timeout ⇒ trigger interval)
- aggregates: logdedup over event-time tumbling windows with a watermark
  (``withWatermark`` bounds state; the reference has no watermark concept —
  it processes by arrival — so the watermark only gates state eviction)
- ``availableNow`` trigger = "drain the backlog then stop", the streaming
  equivalent of the reference's one-shot file read
  (``testbed TestLargeFileOnce``).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import connectors
from ..plans import pipeline as pl
from ..sources.tokens import TOKENS_SCHEMA


def read_tokens_stream(spark: SparkSession, path: str, max_files_per_trigger: int | None = None) -> DataFrame:
    reader = spark.readStream.schema(TOKENS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


def streaming_pipeline(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """parse→enrich→route→write as a micro-batch stream; returns the query.

    Restart-safe: the checkpoint dir holds source offsets + sink commit log,
    so a killed run resumes from the last committed micro-batch — the
    behavioral contract of the reference's storage-extension checkpoints.
    """
    raw = read_tokens_stream(spark, input_path, max_files_per_trigger)
    parsed = pl.parse_stage(raw)
    enriched = pl.enrich_stage(spark, parsed)
    routed = connectors.routed_frame(enriched, pl.default_routes())
    routed = routed.withColumn(
        "route_id", F.when(F.col("_parse_error"), "_errors").otherwise(F.col("route_id"))
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").partitionBy("route_id").parquet(
            os.path.join(out_dir, "routed")
        )
        (
            batch_df.filter(F.col("route_id") != "_errors")
            .groupBy("route_id", "severity_text")
            .agg(F.count(F.lit(1)).alias("count"))
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(os.path.join(out_dir, "counts"))
        )

    writer = (
        routed.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_logdedup(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    interval: str = "10 seconds",
    watermark: str = "30 seconds",
):
    """logdedupprocessor in streaming form: tumbling-window counts per key
    with bounded state (processor.go:163-301; interval ⇒ window, the
    MaxStale-ish bound ⇒ watermark)."""
    raw = read_tokens_stream(spark, input_path)
    parsed = pl.parse_stage(raw)
    agg = (
        parsed.filter(~F.col("_parse_error"))
        .withWatermark("observed_timestamp", watermark)
        .groupBy(
            F.window("observed_timestamp", interval).alias("w"),
            "source",
            "severity_number",
        )
        .agg(
            F.count(F.lit(1)).alias("log_count"),
            F.min("observed_timestamp").alias("first_observed_timestamp"),
            F.max("observed_timestamp").alias("last_observed_timestamp"),
        )
        .select(F.col("w.start").alias("window_start"), "source", "severity_number",
                "log_count", "first_observed_timestamp", "last_observed_timestamp")
    )
    # update-mode foreachBatch: append-mode would hold the final windows in
    # state forever (the watermark never advances past end-of-stream under
    # availableNow); update emits every changed window per micro-batch with a
    # batch_id, the reader takes the latest per window — the same
    # emit-on-interval behavior as the reference's dedup ticker
    # (processor.go:163-187).
    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            os.path.join(out_dir, "dedup")
        )

    return (
        agg.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", os.path.join(out_dir, "_ck_dedup"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )


def stateful_recombine_stream(
    lines: DataFrame,
    source_col: str = "source",
    order_col: str = "doc_id",
    body_col: str = "body",
    first_pattern: str | None = None,
    last_pattern: str | None = None,
    combine_with: str = "\n",
    force_flush_ms: int = 5000,
) -> DataFrame:
    """``recombine`` as a CUSTOM STATEFUL streaming transform
    (``applyInPandasWithState``) — the stretch form from SURVEY §7 step 9.

    The reference buffers partial multiline entries per source and flushes
    when the entry closes (next line matching ``first_pattern`` opens a new
    entry, or a line matching ``last_pattern`` ends the current one), the
    batch cap hits, or ``force_flush_period`` (default 5s) elapses
    (``transformer/recombine/config.go:40-62``). Here the per-source group
    state holds the OPEN session (start order + joined partial); each
    micro-batch appends rows in order, emits every closed session, and a
    processing-time timeout flushes a session left open across polls —
    exactly the force-flush semantics.

    Returns the streaming DataFrame of combined entries with columns
    (source_col, order_col, body_col, recombined_n).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType, LongType, StringType, StructField, StructType,
    )

    if (first_pattern is None) == (last_pattern is None):
        raise ValueError("exactly one of first_pattern / last_pattern required")

    out_schema = StructType(
        [
            StructField(source_col, StringType()),
            StructField(order_col, LongType()),
            StructField(body_col, StringType()),
            StructField("recombined_n", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("start_id", LongType()),
            StructField("parts", ArrayType(StringType())),
        ]
    )

    def merge(key, pdf_iter, state: GroupState):
        import numpy as np

        source = key[0]
        if state.hasTimedOut:
            # force_flush_period elapsed with an open session → emit it
            start_id, parts = state.get
            state.remove()
            yield pd.DataFrame(
                [{source_col: source, order_col: start_id,
                  body_col: combine_with.join(parts), "recombined_n": len(parts)}]
            )
            return
        carry = state.get if state.exists else None
        chunks = list(pdf_iter)
        rows = pd.concat(chunks) if chunks else pd.DataFrame(columns=[order_col, body_col])
        if len(rows) == 0:
            if carry is not None:
                state.setTimeoutDuration(force_flush_ms)
            return
        rows = rows.sort_values(order_col)
        # vectorized sessionization: regex match + cumsum assigns a session
        # index per row (first-mode: a matching row OPENS a session;
        # last-mode: a matching row CLOSES one, so the group index is the
        # exclusive prefix count). Group 0 continues the carried-over open
        # session. Python touches only SESSIONS (the groupby), never rows.
        bodies = rows[body_col].astype(str)
        if first_pattern is not None:
            marks = bodies.str.contains(first_pattern, regex=True).to_numpy()
            grp = np.cumsum(marks)
        else:
            marks = bodies.str.contains(last_pattern, regex=True).to_numpy()
            grp = np.cumsum(marks) - marks
        rows = rows.assign(_g=grp)
        sessions = [
            (int(sub[order_col].iloc[0]), list(sub[body_col].astype(str)))
            for _, sub in rows.groupby("_g", sort=True)
        ]
        opens_fresh = first_pattern is not None and bool(marks[0])
        if carry is not None:
            if opens_fresh:  # batch opens fresh — the carried session closes as-is
                sessions.insert(0, (int(carry[0]), list(carry[1])))
            else:  # batch continues the open session
                sid0, bodies0 = sessions[0]
                sessions[0] = (int(carry[0]), list(carry[1]) + bodies0)
        if last_pattern is not None and bool(marks[-1]):
            done, open_session = sessions, None  # final row closed its entry
        else:
            done, open_session = sessions[:-1], sessions[-1]
        if open_session is not None:
            state.update((open_session[0], open_session[1]))
            state.setTimeoutDuration(force_flush_ms)
        elif state.exists:
            state.remove()
        if done:
            yield pd.DataFrame(
                [{source_col: source, order_col: s,
                  body_col: combine_with.join(p), "recombined_n": len(p)}
                 for s, p in done]
            )

    return lines.groupBy(source_col).applyInPandasWithState(
        merge, out_schema, state_schema, "append", GroupStateTimeout.ProcessingTimeTimeout
    )


def streaming_recombine(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    schema: str = "source string, doc_id long, body string",
    first_marker: str = "START",
    combine_with: str = "\n",
    force_flush_ms: int = 5000,
):
    """File-to-file wrapper over :func:`stateful_recombine_stream`: rows
    whose body starts with ``first_marker`` open a new entry; combined
    entries (source, doc_id, body, recombined_n) append to
    ``out_dir/recombined``."""
    import re as _re

    raw = spark.readStream.schema(schema).parquet(input_path)
    merged = stateful_recombine_stream(
        raw,
        source_col="source",
        order_col="doc_id",
        body_col="body",
        first_pattern="^" + _re.escape(first_marker),
        combine_with=combine_with,
        force_flush_ms=force_flush_ms,
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(os.path.join(out_dir, "recombined"))

    return (
        merged.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", os.path.join(out_dir, "_ck_recombine"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def streaming_span_metrics(
    spark: SparkSession,
    input_df: DataFrame,
    out_dir: str,
    dimensions: list[str],
    duration_col: str = "duration",
    ts_col: str = "ts",
    interval: str = "10 seconds",
    watermark: str = "30 seconds",
    explicit_buckets: list[float] | None = None,
):
    """spanmetrics connector in streaming form: tumbling-window calls count +
    explicit-bucket duration histogram per dimension set, watermarked so
    window state is bounded (the connector's flush-interval metrics emission,
    ``connector/spanmetricsconnector/config.go:43-141``).

    Reuses the batch operator's bucket aggregates over a windowed groupBy —
    one stateful aggregation, update-mode emission per micro-batch (append
    would hold final windows in state until a watermark that availableNow
    never advances past end-of-stream). Output rows append to
    ``out_dir/span_metrics`` with a batch_id; readers take the latest row
    per (window_start, dimensions).
    """
    from ..operators.connectors import span_metrics

    windowed = (
        input_df.withWatermark(ts_col, watermark)
        .withColumn("w", F.window(ts_col, interval))
    )
    agg = span_metrics(
        windowed, ["w", *dimensions], duration_col, explicit_buckets=explicit_buckets
    )
    agg = agg.select(
        F.col("w.start").alias("window_start"),
        *[c for c in agg.columns if c != "w"],
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            os.path.join(out_dir, "span_metrics")
        )

    return (
        agg.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", os.path.join(out_dir, "_ck_spanmetrics"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )


def streaming_signal_to_metrics(
    spark: SparkSession,
    input_df: DataFrame,
    out_dir: str,
    defs: list,
    ts_col: str = "ts",
    interval: str = "10 seconds",
    watermark: str = "30 seconds",
    overrides: dict[str, str] | None = None,
):
    """signaltometrics connector in streaming form: the reference emits one
    metric set per Consume* call (no cross-batch state — README "Metrics
    types"); the streaming analog makes the batch boundary explicit as a
    tumbling window, watermarked so state stays bounded.

    Reuses the batch operator per def over the windowed frame; each def's
    aggregate is its own sink subdirectory (``out_dir/<metric_name>``) so
    downstream pipelines subscribe per metric. Update-mode emission per
    micro-batch, same reader contract as streaming_span_metrics.
    """
    from ..operators.connectors import signal_to_metrics

    windowed = (
        input_df.withWatermark(ts_col, watermark)
        .withColumn("_w", F.window(ts_col, interval))
    )
    out = signal_to_metrics(windowed, defs, overrides=overrides, window_col="_w")
    queries = []
    for mname, frame in out.items():
        frame = frame.select(
            F.col("_w.start").alias("window_start"),
            *[c for c in frame.columns if c != "_w"],
        )

        def make_writer(name):
            def write_batch(batch_df: DataFrame, batch_id: int) -> None:
                batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
                    "append"
                ).parquet(os.path.join(out_dir, name.replace("/", "_")))

            return write_batch

        queries.append(
            frame.writeStream.foreachBatch(make_writer(mname))
            .option(
                "checkpointLocation",
                os.path.join(out_dir, f"_ck_s2m_{mname.replace('/', '_')}"),
            )
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
    return queries


def stateful_service_graph_stream(
    spans: DataFrame,
    trace_col: str = "trace_id",
    span_col: str = "span_id",
    parent_col: str = "parent_span_id",
    kind_col: str = "span_kind",
    service_col: str = "service",
    duration_col: str = "duration",
    failed_col: str | None = None,
    store_ttl_ms: int = 30000,
    emit_expired_virtual: bool = False,
    peer_cols: tuple[str, ...] = ("peer_service",),
) -> DataFrame:
    """servicegraph pair-matching as a CUSTOM STATEFUL streaming transform.

    The reference keeps a continuous in-memory store keyed by
    (traceID, spanID): a CLIENT span waits for the SERVER span whose
    parentSpanID equals its spanID, edges emit when the pair completes, and
    unmatched entries expire after the store TTL
    (``connector/servicegraphconnector/connector.go:263-300``,
    ``internal/store/store.go``). Here the store IS the group state of
    ``applyInPandasWithState`` keyed by (trace, join_span): each side
    buffers until its counterpart arrives — possibly in a LATER micro-batch
    — then one edge row per pair emits; a processing-time timeout evicts
    unmatched state after ``store_ttl_ms`` (the TTL). FIFO one-to-one
    matching, like the store's single entry per key.

    With ``emit_expired_virtual=True`` the TTL eviction reproduces the
    reference's virtual-node edges (``connector/servicegraphconnector/
    connector.go:356-388`` onExpire): an expired CLIENT half becomes an
    edge to its peer host — the first non-null of ``peer_cols`` on the
    span, default ``"unknown"`` (``connector.go:723-732`` getPeerHost,
    ``:50-52`` defaultPeerAttributes) — and an expired SERVER half whose
    join span (parentSpanID) is empty becomes an edge from the virtual
    client ``"user"`` (``connector.go:371-380`` SpanIDIsEmpty). Non-root
    orphan servers expire silently, as the reference only counts them.
    Rows then carry ``connection_type`` (``""`` matched /
    ``"virtual_node"`` expired) and ``virtual_node`` — WHICH side is the
    virtual one: ``"server"`` for an expired client's edge, ``"client"``
    for an expired root server's edge (the reference's virtual_node label,
    ``connector.go:356-388``; golden: testdata/virtual-node-label-*).

    Returns the streaming DataFrame of EDGE rows (client_service,
    server_service, client_duration, server_duration, failed) — feed them
    to the same aggregation the batch operator uses. Scale shape: state is
    partitioned by the join key across executors; per-key state is O(dup
    spans) ≈ O(1).
    """
    import json

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType, BooleanType, DoubleType, StringType, StructField, StructType,
    )

    present_peers = [c for c in peer_cols if c in spans.columns]
    peer_expr = (
        F.coalesce(*[F.col(c) for c in present_peers])
        if present_peers
        else F.lit(None).cast("string")
    )
    clients = spans.filter(
        F.upper(F.col(kind_col)).isin("CLIENT", "SPAN_KIND_CLIENT")
    ).select(
        F.col(trace_col).alias("_t"),
        F.col(span_col).alias("_jspan"),
        F.lit("c").alias("_role"),
        F.col(service_col).alias("_svc"),
        F.col(duration_col).cast("double").alias("_dur"),
        (F.col(failed_col) if failed_col else F.lit(False)).alias("_failed"),
        peer_expr.alias("_peer"),
    )
    servers = spans.filter(
        F.upper(F.col(kind_col)).isin("SERVER", "SPAN_KIND_SERVER")
    ).select(
        F.col(trace_col).alias("_t"),
        F.col(parent_col).alias("_jspan"),
        F.lit("s").alias("_role"),
        F.col(service_col).alias("_svc"),
        F.col(duration_col).cast("double").alias("_dur"),
        (F.col(failed_col) if failed_col else F.lit(False)).alias("_failed"),
        F.lit(None).cast("string").alias("_peer"),
    )
    both = clients.unionByName(servers)

    out_fields = [
        StructField("client_service", StringType()),
        StructField("server_service", StringType()),
        StructField("client_duration", DoubleType()),
        StructField("server_duration", DoubleType()),
        StructField("failed", BooleanType()),
    ]
    if emit_expired_virtual:
        out_fields.append(StructField("connection_type", StringType()))
        out_fields.append(StructField("virtual_node", StringType()))
    out_schema = StructType(out_fields)
    # unmatched halves ride as JSON strings: tiny (one pending span per key
    # in the normal case), schema-stable
    state_schema = StructType(
        [
            StructField("clients", ArrayType(StringType())),
            StructField("servers", ArrayType(StringType())),
        ]
    )

    def match(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:  # store TTL: evict unmatched halves
            virtual = []
            if emit_expired_virtual and state.exists:
                pc, ps = state.get
                for rec in pc:  # onExpire: client → peer-host virtual node
                    c = json.loads(rec)
                    virtual.append(
                        {
                            "client_service": c["svc"],
                            "server_service": c.get("p") or "unknown",
                            "client_duration": c["dur"],
                            "server_duration": None,
                            "failed": c["f"],
                            "connection_type": "virtual_node",
                            "virtual_node": "server",
                        }
                    )
                if not key[1]:  # root server (empty parent) → "user" client
                    for rec in ps:
                        s = json.loads(rec)
                        virtual.append(
                            {
                                "client_service": "user",
                                "server_service": s["svc"],
                                "client_duration": None,
                                "server_duration": s["dur"],
                                "failed": s["f"],
                                "connection_type": "virtual_node",
                                "virtual_node": "client",
                            }
                        )
            state.remove()
            if virtual:
                yield pd.DataFrame(virtual)
            return
        pend_c, pend_s = ([], [])
        if state.exists:
            pc, ps = state.get
            pend_c, pend_s = list(pc), list(ps)
        for pdf in pdf_iter:
            for _, r in pdf.iterrows():
                rec = {"svc": r["_svc"], "dur": float(r["_dur"]), "f": bool(r["_failed"])}
                if r["_role"] == "c":
                    if emit_expired_virtual and isinstance(r["_peer"], str):
                        rec["p"] = r["_peer"]
                    pend_c.append(json.dumps(rec))
                else:
                    pend_s.append(json.dumps(rec))
        edges = []
        while pend_c and pend_s:
            c = json.loads(pend_c.pop(0))
            s = json.loads(pend_s.pop(0))
            edge = {
                "client_service": c["svc"],
                "server_service": s["svc"],
                "client_duration": c["dur"],
                "server_duration": s["dur"],
                "failed": c["f"] or s["f"],
            }
            if emit_expired_virtual:
                edge["connection_type"] = ""
                edge["virtual_node"] = ""
            edges.append(edge)
        if pend_c or pend_s:
            state.update((pend_c, pend_s))
            state.setTimeoutDuration(store_ttl_ms)
        elif state.exists:
            state.remove()
        if edges:
            yield pd.DataFrame(edges)

    return both.groupBy("_t", "_jspan").applyInPandasWithState(
        match, out_schema, state_schema, "append", GroupStateTimeout.ProcessingTimeTimeout
    )


def streaming_service_graph(
    spark: SparkSession,
    input_df: DataFrame,
    out_dir: str,
    buckets: list[float] | None = None,
    store_ttl_ms: int = 30000,
    emit_expired_virtual: bool = False,
    **span_cols,
):
    """File-to-file servicegraph: stateful pair matching
    (:func:`stateful_service_graph_stream`) then the SAME edge aggregation
    the batch operator computes, per micro-batch (append with batch_id —
    additive aggregates, so readers SUM across batch rows per edge; pinned
    equal to batch ``service_graph`` in tests/test_streaming2.py). With
    ``emit_expired_virtual`` the sink gains a ``connection_type`` grouping
    dimension, so virtual-node edges (expired halves; the reference's
    onExpire metrics) aggregate separately from matched edges — their
    one-sided durations sum as NULL-skipping partial sums."""
    edges = stateful_service_graph_stream(
        input_df,
        store_ttl_ms=store_ttl_ms,
        emit_expired_virtual=emit_expired_virtual,
        **span_cols,
    )
    aggs = service_graph_edge_aggs(buckets)

    group_cols = ["client_service", "server_service"]
    if emit_expired_virtual:
        group_cols.append("connection_type")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.groupBy(*group_cols)
            .agg(*aggs)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(os.path.join(out_dir, "service_graph"))
        )

    return (
        edges.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", os.path.join(out_dir, "_ck_servicegraph"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def service_graph_edge_aggs(buckets: list[float] | None = None) -> list[Column]:
    """The servicegraph edge aggregate set (request totals, failure count,
    one-sided duration sums, server-duration histogram buckets) shared by
    the per-micro-batch sink writer and the post-query state drain."""
    bounds = buckets or [2, 4, 6, 8, 10, 50, 100, 200, 400, 800]
    sdur = F.col("server_duration")
    aggs = [
        F.count(F.lit(1)).alias("req_total"),
        F.sum(F.col("failed").cast("long")).alias("req_failed_total"),
        F.sum("client_duration").alias("client_duration_sum"),
        F.sum("server_duration").alias("server_duration_sum"),
    ]
    lo = None
    for b in bounds:
        cond = (sdur <= b) if lo is None else ((sdur > lo) & (sdur <= b))
        aggs.append(F.sum(cond.cast("long")).alias(f"server_le_{str(b).replace('.', '_')}"))
        lo = b
    aggs.append(F.sum((sdur > lo).cast("long")).alias("server_le_inf"))
    return aggs


def drain_service_graph_to_sink(
    spark: SparkSession,
    out_dir: str,
    buckets: list[float] | None = None,
    peer_default: str = "unknown",
) -> int:
    """After an ``availableNow`` :func:`streaming_service_graph` query
    terminates, aggregate the still-unmatched state halves into virtual-node
    edge rows and APPEND them to the same ``service_graph`` sink with
    ``batch_id = -1`` (readers already SUM across batch rows per edge, so
    the drained rows fold in additively). Use with queries started with
    ``emit_expired_virtual=True`` — their sink carries the
    ``connection_type`` grouping column these rows slot into. Returns the
    number of edge rows appended."""
    edges = drain_service_graph_state(
        spark, os.path.join(out_dir, "_ck_servicegraph"), peer_default=peer_default
    )
    agg = (
        edges.groupBy("client_service", "server_service", "connection_type")
        .agg(*service_graph_edge_aggs(buckets))
        .withColumn("batch_id", F.lit(-1))
    )
    agg.persist()
    n = agg.count()
    if n:
        agg.write.mode("append").parquet(os.path.join(out_dir, "service_graph"))
    agg.unpersist()
    return n


def drain_service_graph_state(
    spark: SparkSession, checkpoint_dir: str, peer_default: str = "unknown"
) -> DataFrame:
    """BATCH drain of unmatched halves left in the servicegraph state store
    after a finished (e.g. ``availableNow``) query.

    Processing-time TTL timeouts only fire when a LATER micro-batch runs, so
    halves still unmatched when the final batch commits never get their
    onExpire virtual-node edges (``connector/servicegraphconnector/
    connector.go:356-388``) from the stream itself. This closes that gap the
    Spark-native way: read the committed state via the state-store data
    source (``spark.read.format("statestore")``, Spark 4) and derive the
    SAME edges the in-stream expiry path emits — expired client → peer host
    (``p`` on the pending record, else ``peer_default``; getPeerHost,
    ``connector.go:723-732``), expired ROOT server (empty parent span id in
    the group key) → virtual client ``"user"``; non-root orphan servers
    drain silently. Pure ``explode`` + ``from_json`` Column work over the
    state rows — no Python per row, partition-parallel over the store's
    shuffle partitions, so it scales with the state, not the stream.

    Returns edge rows in :func:`stateful_service_graph_stream`'s
    ``emit_expired_virtual`` schema; feed them to the same aggregation
    (:func:`service_graph_edge_aggs`) and append to the sink.
    """
    st = spark.read.format("statestore").load(checkpoint_dir)
    # state format v2 nests the user tuple under groupState next to the
    # timeout timestamp; tolerate the flat (v1) layout too
    vfields = [f.name for f in st.schema["value"].dataType.fields]
    v = "value.groupState" if "groupState" in vfields else "value"
    rec = "struct<svc:string,dur:double,f:boolean,p:string>"
    clients = (
        st.select(F.explode(f"{v}.clients").alias("_rec"))
        .select(F.from_json("_rec", rec).alias("r"))
        .select(
            F.col("r.svc").alias("client_service"),
            F.coalesce(F.col("r.p"), F.lit(peer_default)).alias("server_service"),
            F.col("r.dur").alias("client_duration"),
            F.lit(None).cast("double").alias("server_duration"),
            F.col("r.f").alias("failed"),
            F.lit("virtual_node").alias("connection_type"),
            F.lit("server").alias("virtual_node"),
        )
    )
    servers = (
        st.filter(F.col("key._jspan") == "")
        .select(F.explode(f"{v}.servers").alias("_rec"))
        .select(F.from_json("_rec", rec).alias("r"))
        .select(
            F.lit("user").alias("client_service"),
            F.col("r.svc").alias("server_service"),
            F.lit(None).cast("double").alias("client_duration"),
            F.col("r.dur").alias("server_duration"),
            F.col("r.f").alias("failed"),
            F.lit("virtual_node").alias("connection_type"),
            F.lit("client").alias("virtual_node"),
        )
    )
    return clients.unionByName(servers)


def streaming_exceptions(
    spark: SparkSession,
    input_df: DataFrame,
    out_dir: str,
    dimensions: list[str] | None = None,
    ts_col: str = "ts",
    interval: str = "10 seconds",
    watermark: str = "30 seconds",
    **conn_kwargs,
):
    """exceptionsconnector in streaming form: tumbling-window exception
    counts per (service, span name, kind, status) — the reference emits its
    counters continuously per Consume* call; the window makes the emission
    boundary explicit and the watermark bounds state. Reuses the batch
    operator over the windowed frame (one stateful aggregation);
    update-mode emission, same reader contract as streaming_span_metrics."""
    from ..operators.connectors import exceptions_connector

    windowed = (
        input_df.withWatermark(ts_col, watermark)
        .withColumn("_w", F.window(ts_col, interval))
    )
    agg = exceptions_connector(
        windowed, dimensions=dimensions, window_col="_w", **conn_kwargs
    )
    agg = agg.select(
        F.col("_w.start").alias("window_start"),
        *[c for c in agg.columns if c != "_w"],
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            os.path.join(out_dir, "exceptions")
        )

    return (
        agg.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", os.path.join(out_dir, "_ck_exceptions"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )


def stateful_group_by_trace_stream(
    spans: DataFrame,
    trace_col: str = "trace_id",
    decision_wait_ms: int = 30000,
    root_wait_ms: int | None = None,
    parent_col: str = "parent_span_id",
) -> DataFrame:
    """groupbytrace / tailsampling trace ASSEMBLY as a custom stateful
    streaming transform: buffer every span of a trace until the trace's
    decision deadline, then release the whole trace in one burst (all spans
    in the same micro-batch downstream).

    Mirrors the tailsamplingprocessor's batcher (``processor.go:196`` —
    traces wait ``decision_wait`` from FIRST span arrival, late spans join
    the buffered trace but do not extend the deadline) including root-span
    acceleration (``processor.go:1000-1001``, ``decision_wait_after_root_
    received``: seeing the root span moves the deadline earlier). The
    deadline is stored IN the state (epoch ms), so each micro-batch re-arms
    the processing-time timeout with the remaining time instead of
    restarting the clock.

    Output schema == input schema; rows ride the state as JSON strings
    (numpy scalars unwrapped, timestamps ISO-ized and re-coerced on emit).
    Scale shape: state is hash-partitioned by trace id; per-key state is
    O(spans-per-trace), exactly the reference's per-trace buffer.
    """
    import json
    import time as _time

    import numpy as _np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType, DoubleType, StringType, StructField, StructType, TimestampType,
    )

    out_schema = spans.schema
    ts_fields = [f.name for f in out_schema.fields if isinstance(f.dataType, TimestampType)]
    cols = [f.name for f in out_schema.fields]
    state_schema = StructType(
        [
            StructField("rows", ArrayType(StringType())),
            StructField("deadline_ms", DoubleType()),
        ]
    )

    def _jsonable(v):
        if isinstance(v, _np.generic):
            return v.item()
        if isinstance(v, (pd.Timestamp,)):
            return v.isoformat()
        if isinstance(v, _np.ndarray):
            return v.tolist()
        return v

    def _emit(rows: list[str]) -> pd.DataFrame:
        pdf = pd.DataFrame([json.loads(r) for r in rows], columns=cols)
        for c in ts_fields:
            pdf[c] = pd.to_datetime(pdf[c])
        return pdf

    def assemble(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:
            rows, _dl = state.get
            state.remove()
            if rows:
                yield _emit(list(rows))
            return
        now_ms = _time.time() * 1000.0
        rows, deadline = ([], None)
        if state.exists:
            prev_rows, deadline = state.get
            rows = list(prev_rows)
        saw_root = False
        for pdf in pdf_iter:
            for _, r in pdf.iterrows():
                rec = {c: _jsonable(r[c]) for c in cols}
                if root_wait_ms is not None and not rec.get(parent_col):
                    saw_root = True
                rows.append(json.dumps(rec))
        if deadline is None:
            deadline = now_ms + decision_wait_ms
        if saw_root:
            deadline = min(deadline, now_ms + root_wait_ms)
        state.update((rows, float(deadline)))
        state.setTimeoutDuration(max(1, int(deadline - now_ms)))
        return
        yield  # generator form required by applyInPandasWithState

    return spans.groupBy(trace_col).applyInPandasWithState(
        assemble, out_schema, state_schema, "append",
        GroupStateTimeout.ProcessingTimeTimeout,
    )


def streaming_tail_sampling(
    spark: SparkSession,
    input_df: DataFrame,
    out_dir: str,
    policies: list[dict],
    trace_col: str = "trace_id",
    ts_col: str = "ts",
    decision_wait_ms: int = 30000,
    root_wait_ms: int | None = None,
    parent_col: str = "parent_span_id",
):
    """tailsamplingprocessor in streaming form: buffer spans per trace for
    ``decision_wait`` (:func:`stateful_group_by_trace_stream`), then run the
    FULL batch policy engine (``operators.templates.tail_sampling`` — all 11
    policy types, drop precedence, OR of top-level policies) over each
    micro-batch of released traces. Correct by construction: a trace's spans
    all emerge in the same micro-batch, so per-trace aggregates (latency,
    span_count) see the complete trace — the reference's decision point.

    Sampled spans append to ``out_dir/sampled`` with a ``batch_id`` column.
    Traces still buffered when an ``availableNow`` run ends are recoverable
    via :func:`drain_group_by_trace_state` + the batch operator.
    """
    from ..operators import templates

    complete = stateful_group_by_trace_stream(
        input_df,
        trace_col=trace_col,
        decision_wait_ms=decision_wait_ms,
        root_wait_ms=root_wait_ms,
        parent_col=parent_col,
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        kept = templates.tail_sampling(
            batch_df, policies, trace_col=trace_col, ts_col=ts_col
        )
        kept.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            os.path.join(out_dir, "sampled")
        )

    return (
        complete.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", os.path.join(out_dir, "_ck_tailsampling"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def drain_group_by_trace_state(
    spark: SparkSession, checkpoint_dir: str, schema
) -> DataFrame:
    """BATCH drain of traces still buffered when a
    :func:`stateful_group_by_trace_stream` query terminated (availableNow
    runs: no later batch exists to fire the remaining decision deadlines —
    the same gap :func:`drain_service_graph_state` closes for servicegraph).
    Reads the committed state store and rebuilds the buffered span rows;
    feed the result to the batch ``tail_sampling`` for the final decision.

    ``schema`` is the span DataFrame's schema (``df.schema``) — the state
    rides as JSON strings of exactly those columns.
    """
    st = spark.read.format("statestore").load(checkpoint_dir)
    vfields = [f.name for f in st.schema["value"].dataType.fields]
    v = "value.groupState" if "groupState" in vfields else "value"
    return (
        st.select(F.explode(f"{v}.rows").alias("_rec"))
        .select(F.from_json("_rec", schema).alias("r"))
        .select("r.*")
    )
