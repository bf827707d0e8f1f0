"""Streaming servicegraph + exceptions pinned equal to their batch forms.

The servicegraph test splits client and server spans into SEPARATE input
files consumed one per micro-batch (maxFilesPerTrigger=1), so pairs only
complete when the applyInPandasWithState store carries the waiting half
across batches — the reference's wait-for-pair semantics
(connector/servicegraphconnector/connector.go:263-300), not a same-batch
join.
"""

import datetime

from pyspark.sql import Window
from pyspark.sql import functions as F

SPAN_SCHEMA = (
    "trace_id string, span_id string, parent_span_id string, span_kind string, "
    "service string, duration double, failed boolean"
)


def _spans():
    rows = []
    for i in range(60):
        t = f"tr{i}"
        rows.append((t, f"c{i}", "root", "CLIENT", f"svc{i % 3}", float(10 + i % 40), i % 7 == 0))
        # 50 matched server spans; 10 traces left unmatched (client only)
        if i < 50:
            rows.append((t, f"s{i}", f"c{i}", "SERVER", f"be{i % 2}", float(5 + i % 90), i % 11 == 0))
    return rows


def test_streaming_service_graph_matches_batch(spark, tmp_path):
    from opentelemetry_collector_contrib_spark.operators.connectors import service_graph
    from opentelemetry_collector_contrib_spark.streaming.stream import (
        streaming_service_graph,
    )

    rows = _spans()
    df = spark.createDataFrame(rows, SPAN_SCHEMA)
    inp = tmp_path / "spans_in"
    # clients in file 1, servers in file 2 → pair halves arrive in
    # different micro-batches; the state store must hold the clients
    df.filter("span_kind = 'CLIENT'").coalesce(1).write.parquet(str(inp / "f1"))
    df.filter("span_kind = 'SERVER'").coalesce(1).write.parquet(str(inp / "f2"))

    stream_in = (
        spark.readStream.schema(SPAN_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(inp / "*"))
    )
    out = str(tmp_path / "sg_out")
    q = streaming_service_graph(
        spark, stream_in, out, failed_col="failed", buckets=[20, 60]
    )
    q.awaitTermination(180)

    got_df = spark.read.parquet(out + "/service_graph")
    # additive per-batch aggregates: SUM across batch rows per edge
    num_cols = [c for c in got_df.columns if c not in
                ("client_service", "server_service", "batch_id")]
    got = {
        (r.client_service, r.server_service): tuple(r[c] for c in num_cols)
        for r in got_df.groupBy("client_service", "server_service")
        .agg(*[F.sum(c).alias(c) for c in num_cols])
        .collect()
    }

    batch = service_graph(df, failed_col="failed", buckets=[20, 60])
    want = {
        (r.client_service, r.server_service): tuple(r[c] for c in num_cols)
        for r in batch.collect()
    }
    assert got == want and len(want) >= 4
    # unmatched clients never form edges
    assert sum(v[0] for v in got.values()) == 50


def test_streaming_service_graph_pairs_span_batches(spark, tmp_path):
    """Sanity on the state itself: with one file per micro-batch, batch 1
    (clients only) emits nothing; edges only appear once servers arrive."""
    from opentelemetry_collector_contrib_spark.streaming.stream import (
        streaming_service_graph,
    )

    rows = _spans()
    df = spark.createDataFrame(rows, SPAN_SCHEMA)
    inp = tmp_path / "in2"
    df.filter("span_kind = 'CLIENT'").coalesce(1).write.parquet(str(inp / "f1"))
    df.filter("span_kind = 'SERVER'").coalesce(1).write.parquet(str(inp / "f2"))
    stream_in = (
        spark.readStream.schema(SPAN_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(inp / "*"))
    )
    out = str(tmp_path / "sg_out2")
    q = streaming_service_graph(spark, stream_in, out, failed_col="failed")
    q.awaitTermination(180)
    got_df = spark.read.parquet(out + "/service_graph")
    batches_with_edges = {r.batch_id for r in got_df.select("batch_id").distinct().collect()}
    assert len(batches_with_edges) == 1  # only the batch where pairs completed


def test_streaming_service_graph_expiry_virtual_nodes(spark, tmp_path):
    """TTL expiry emits the reference's virtual-node edges (onExpire,
    connector/servicegraphconnector/connector.go:356-388): an expired
    client becomes an edge to its peer host (getPeerHost, :723-732,
    default "unknown"); an expired ROOT server (empty parent span id)
    becomes an edge from the virtual client "user"; non-root orphan
    servers expire silently. File f1 carries all the expiry targets plus
    the client half of one matched pair; f2 (next micro-batch, 1 ms TTL
    long past) carries the matching server and triggers the timeouts."""
    from opentelemetry_collector_contrib_spark.streaming.stream import (
        stateful_service_graph_stream,
    )

    schema = SPAN_SCHEMA + ", peer_service string"
    f1 = [
        # matched pair's client — must NOT expire (data for its key in f2)
        ("tr0", "c0", "root", "CLIENT", "front", 12.0, False, None),
        # orphan client with a peer attribute → virtual edge to the peer
        ("tr1", "c1", "root", "CLIENT", "front", 20.0, True, "db.example"),
        # orphan client without peer → virtual edge to "unknown"
        ("tr2", "c2", "root", "CLIENT", "web", 30.0, False, None),
        # ROOT server (empty parent) → virtual edge from "user"
        ("tr3", "s3", "", "SERVER", "gateway", 40.0, False, None),
        # non-root orphan server → expires SILENTLY
        ("tr4", "s4", "missing", "SERVER", "lost", 50.0, False, None),
    ]
    f2 = [("tr0", "s0", "c0", "SERVER", "back", 6.0, False, None)]
    inp = tmp_path / "exp_in"
    spark.createDataFrame(f1, schema).coalesce(1).write.parquet(str(inp / "f1"))
    spark.createDataFrame(f2, schema).coalesce(1).write.parquet(str(inp / "f2"))

    stream_in = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(inp / "*"))
    )
    edges = stateful_service_graph_stream(
        stream_in, failed_col="failed", store_ttl_ms=1, emit_expired_virtual=True
    )
    out = str(tmp_path / "exp_out")
    q = (
        edges.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "exp_ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r.client_service, r.server_service): r
        for r in spark.read.parquet(out).collect()
    }
    assert got[("front", "db.example")].connection_type == "virtual_node"
    assert got[("front", "db.example")].failed is True
    assert got[("front", "db.example")].server_duration is None
    assert got[("front", "db.example")].virtual_node == "server"
    assert got[("web", "unknown")].connection_type == "virtual_node"
    assert got[("web", "unknown")].virtual_node == "server"
    assert got[("user", "gateway")].connection_type == "virtual_node"
    assert got[("user", "gateway")].client_duration is None
    assert got[("user", "gateway")].virtual_node == "client"
    assert got[("front", "back")].connection_type == ""  # matched, not expired
    # the non-root orphan server leaves no edge at all
    assert not any("lost" in k for k in got)
    assert len(got) == 4


def test_streaming_service_graph_aggregates_virtual_separately(spark, tmp_path):
    """The file-to-file wrapper groups by connection_type when virtual-node
    emission is on, so expired-edge aggregates never mix with matched-edge
    aggregates for the same (client, server) pair."""
    from opentelemetry_collector_contrib_spark.streaming.stream import (
        streaming_service_graph,
    )

    schema = SPAN_SCHEMA + ", peer_service string"
    f1 = [
        ("tr0", "c0", "root", "CLIENT", "front", 12.0, False, None),
        ("tr1", "c1", "root", "CLIENT", "front", 20.0, True, "db.example"),
        ("tr2", "c2", "root", "CLIENT", "front", 30.0, False, "db.example"),
    ]
    f2 = [("tr0", "s0", "c0", "SERVER", "back", 6.0, False, None)]
    inp = tmp_path / "aggv_in"
    spark.createDataFrame(f1, schema).coalesce(1).write.parquet(str(inp / "f1"))
    spark.createDataFrame(f2, schema).coalesce(1).write.parquet(str(inp / "f2"))
    stream_in = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(inp / "*"))
    )
    out = str(tmp_path / "aggv_out")
    q = streaming_service_graph(
        spark, stream_in, out, failed_col="failed", buckets=[20],
        store_ttl_ms=1, emit_expired_virtual=True,
    )
    q.awaitTermination(180)

    got_df = spark.read.parquet(out + "/service_graph")
    got = {
        (r.client_service, r.server_service, r.connection_type): r
        for r in got_df.collect()
    }
    v = got[("front", "db.example", "virtual_node")]
    assert v.req_total == 2 and v.req_failed_total == 1
    assert v.client_duration_sum == 50.0 and v.server_duration_sum is None
    m = got[("front", "back", "")]
    assert m.req_total == 1 and m.server_duration_sum == 6.0
    assert len(got) == 2


def test_drain_service_graph_state_after_available_now(spark, tmp_path):
    """Halves still unmatched when an availableNow query's FINAL micro-batch
    commits never fire their processing-time TTL (no later batch exists), so
    the stream emits no virtual edges for them. drain_service_graph_state
    reads the committed state store back (state-store data source) and
    derives the same onExpire virtual-node edges in batch;
    drain_service_graph_to_sink folds them into the sink as batch_id=-1."""
    from opentelemetry_collector_contrib_spark.streaming.stream import (
        drain_service_graph_state,
        drain_service_graph_to_sink,
        streaming_service_graph,
    )

    schema = SPAN_SCHEMA + ", peer_service string"
    rows = [
        # matched in the single micro-batch — must NOT appear in the drain
        ("tr0", "c0", "root", "CLIENT", "front", 12.0, False, None),
        ("tr0", "s0", "c0", "SERVER", "back", 6.0, False, None),
        # unmatched client with a peer attribute → virtual edge to the peer
        ("tr1", "c1", "root", "CLIENT", "front", 20.0, True, "db.example"),
        # unmatched ROOT server (empty parent) → virtual edge from "user"
        ("tr3", "s3", "", "SERVER", "gateway", 40.0, False, None),
        # non-root orphan server → drains silently
        ("tr4", "s4", "missing", "SERVER", "lost", 50.0, False, None),
    ]
    inp = tmp_path / "drain_in"
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(inp / "f1"))
    stream_in = spark.readStream.schema(schema).parquet(str(inp / "*"))
    out = str(tmp_path / "drain_out")
    # TTL far in the future: nothing expires in-stream, everything unmatched
    # is still in the store when the query terminates
    q = streaming_service_graph(
        spark, stream_in, out, failed_col="failed", buckets=[20],
        store_ttl_ms=600_000, emit_expired_virtual=True,
    )
    q.awaitTermination(180)

    edges = drain_service_graph_state(spark, out + "/_ck_servicegraph").collect()
    got = {(r.client_service, r.server_service): r for r in edges}
    assert len(got) == 2  # the "lost" non-root orphan server is silent
    assert got[("front", "db.example")].failed is True
    assert got[("front", "db.example")].virtual_node == "server"
    assert got[("front", "db.example")].client_duration == 20.0
    assert got[("user", "gateway")].virtual_node == "client"
    assert got[("user", "gateway")].server_duration == 40.0

    n = drain_service_graph_to_sink(spark, out, buckets=[20])
    assert n == 2
    sink = spark.read.parquet(out + "/service_graph")
    drained = {
        (r.client_service, r.server_service): r
        for r in sink.filter("batch_id = -1").collect()
    }
    assert set(drained) == {("front", "db.example"), ("user", "gateway")}
    assert drained[("front", "db.example")].req_failed_total == 1
    assert drained[("front", "db.example")].connection_type == "virtual_node"
    # matched edge from the live query is untouched
    m = sink.filter("batch_id >= 0 and client_service = 'front'").collect()
    assert len(m) == 1 and m[0].server_service == "back"


def test_streaming_exceptions_matches_batch(spark, tmp_path):
    from opentelemetry_collector_contrib_spark.operators.connectors import (
        exceptions_connector,
    )
    from opentelemetry_collector_contrib_spark.streaming.stream import (
        streaming_exceptions,
    )

    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    for i in range(120):
        rows.append(
            (
                base + datetime.timedelta(seconds=i % 25),
                f"svc{i % 2}", f"op{i % 3}", "SERVER", "ERROR", f"t{i}",
                [{"name": "exception",
                  "attributes": {"exception.type": "IOError" if i % 2 else "ValueError"}}]
                if i % 4 else [],
            )
        )
    schema = (
        "ts timestamp, service string, span_name string, span_kind string, "
        "status_code string, trace_id string, "
        "events array<struct<name:string, attributes:map<string,string>>>"
    )
    df = spark.createDataFrame(rows, schema)
    inp = tmp_path / "exc_in"
    df.coalesce(1).write.parquet(str(inp))

    stream_in = spark.readStream.schema(schema).parquet(str(inp))
    out = str(tmp_path / "exc_out")
    q = streaming_exceptions(
        spark, stream_in, out, dimensions=["exception.type"],
        interval="10 seconds",
    )
    q.awaitTermination(120)

    got_df = spark.read.parquet(out + "/exceptions")
    w = Window.partitionBy(
        "window_start", "service_name", "span_name", "exception_type"
    ).orderBy(F.desc("batch_id"))
    latest = (
        got_df.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1").drop("_rn")
    )
    got = {
        (str(r.window_start), r.service_name, r.span_name, r.exception_type): r.exceptions
        for r in latest.collect()
    }

    batch = exceptions_connector(
        df.withColumn("_w", F.window("ts", "10 seconds")),
        dimensions=["exception.type"],
        window_col="_w",
    )
    want = {
        (str(r["_w"].start), r.service_name, r.span_name, r.exception_type): r.exceptions
        for r in batch.collect()
    }
    assert got == want and len(want) > 4


def test_streaming_tail_sampling_matches_batch(spark, tmp_path):
    """Streaming tail sampling == batch tail sampling over the same spans:
    traces buffer across micro-batches (spans of one trace split over two
    input files), release on the decision-wait deadline, and each released
    batch goes through the SAME policy engine; traces still buffered at the
    availableNow end are recovered via drain_group_by_trace_state and the
    batch operator."""
    from opentelemetry_collector_contrib_spark.operators import templates
    from opentelemetry_collector_contrib_spark.streaming.stream import (
        drain_group_by_trace_state,
        streaming_tail_sampling,
    )

    schema = (
        "trace_id string, span_id string, parent_span_id string, "
        "service string, ts double, env string, status string"
    )
    rows1, rows2 = [], []
    for i in range(20):
        t = f"tr{i}"
        # first span in file 1; second (widening the latency span) in file 2
        rows1.append((t, f"a{i}", "", f"svc{i % 3}", 100.0 + i, "prod" if i % 2 else "dev", "OK"))
        rows2.append((t, f"b{i}", f"a{i}", f"svc{i % 3}",
                      100.0 + i + (50.0 if i % 4 == 0 else 5.0),
                      "prod" if i % 2 else "dev", "ERROR" if i % 5 == 0 else "OK"))
        if i % 3 == 0:  # some traces get a third span (span_count policy)
            rows2.append((t, f"c{i}", f"a{i}", f"svc{i % 3}", 101.0 + i,
                          "prod" if i % 2 else "dev", "OK"))
    inp = tmp_path / "ts_in"
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(str(inp / "f1"))
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(str(inp / "f2"))

    policies = [
        {"type": "latency", "threshold_ms": 20_000},  # ts unit: seconds
        {"type": "string_attribute", "key": "env", "values": ["dev"]},
        {"type": "span_count", "min_spans": 3},
    ]

    all_spans = spark.read.parquet(str(inp / "*"))
    want = {
        tuple(r) for r in templates.tail_sampling(
            all_spans, policies, trace_col="trace_id", ts_col="ts"
        ).select("trace_id", "span_id").collect()
    }
    assert want  # policies select a real subset
    n_all = all_spans.select("trace_id", "span_id").distinct().count()
    assert len(want) < n_all

    stream_in = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(inp / "*"))
    )
    out = str(tmp_path / "ts_out")
    q = streaming_tail_sampling(
        spark, stream_in, out, policies,
        trace_col="trace_id", ts_col="ts", decision_wait_ms=1,
    )
    q.awaitTermination(240)

    import os as _os

    got = set()
    if _os.path.isdir(out + "/sampled"):
        got = {
            tuple(r) for r in spark.read.parquet(out + "/sampled")
            .select("trace_id", "span_id").collect()
        }
    # traces whose deadline never fired (buffered at query end) → drain
    remaining = drain_group_by_trace_state(
        spark, out + "/_ck_tailsampling", all_spans.schema
    )
    drained = {
        tuple(r) for r in templates.tail_sampling(
            remaining, policies, trace_col="trace_id", ts_col="ts"
        ).select("trace_id", "span_id").collect()
    }
    assert got | drained == want
    assert not (got & drained)  # a trace decides exactly once


def test_group_by_trace_root_acceleration(spark, tmp_path):
    """decision_wait_after_root_received: a trace whose ROOT span arrived
    gets the shorter deadline — it releases while a rootless trace with the
    same arrival time stays buffered (processor.go:1000-1001)."""
    import time as _time

    from opentelemetry_collector_contrib_spark.streaming.stream import (
        stateful_group_by_trace_stream,
    )

    schema = "trace_id string, span_id string, parent_span_id string, ts double"
    inp = tmp_path / "root_in"
    # trace A has its root (empty parent) → accelerated; trace B does not
    spark.createDataFrame(
        [("A", "a1", "", 1.0), ("B", "b2", "missing", 1.0)], schema
    ).coalesce(1).write.parquet(str(inp / "f1"))
    # second batch just advances processing time past the short deadline
    spark.createDataFrame([("C", "c1", "", 9.0)], schema).coalesce(1).write.parquet(
        str(inp / "f2")
    )

    stream_in = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(inp / "*"))
    )
    released = stateful_group_by_trace_stream(
        stream_in, decision_wait_ms=600_000, root_wait_ms=1
    )
    out = str(tmp_path / "root_out")
    q = (
        released.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "root_ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {r.trace_id for r in spark.read.parquet(out).collect()}
    assert "A" in got  # root-accelerated deadline fired
    assert "B" not in got  # full decision_wait: still buffered
