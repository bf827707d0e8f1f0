"""Streaming pipeline: availableNow drain produces batch-identical results,
and a restart resumes from the checkpoint without duplicating output."""

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.sources.tokens import write_tokens_parquet
from opentelemetry_collector_contrib_spark.streaming.stream import (
    streaming_logdedup,
    streaming_pipeline,
)


@pytest.fixture(scope="module")
def stream_input(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("stream") / "tokens")
    write_tokens_parquet(p, n=3000, seed=7, chunk=1000)
    return p


def test_streaming_matches_batch(spark, stream_input, tmp_path):
    out = str(tmp_path / "sout")
    q = streaming_pipeline(spark, stream_input, out, available_now=True, max_files_per_trigger=1)
    q.awaitTermination(300)

    from opentelemetry_collector_contrib_spark.plans import pipeline as pl
    from opentelemetry_collector_contrib_spark.operators import connectors
    from opentelemetry_collector_contrib_spark.sources import tokens as tok

    raw = tok.read_tokens(spark, stream_input)
    enriched = pl.enrich_stage(spark, pl.parse_stage(raw))
    routed = connectors.routed_frame(enriched, pl.default_routes())
    routed = routed.withColumn(
        "route_id", F.when(F.col("_parse_error"), "_errors").otherwise(F.col("route_id"))
    )
    want = {(r.doc_id, r.route_id) for r in routed.select("doc_id", "route_id").collect()}
    got_df = spark.read.parquet(out + "/routed")
    got = {(r.doc_id, r.route_id) for r in got_df.select("doc_id", "route_id").collect()}
    assert got == want
    # counts table: per-batch partial counts sum to batch totals
    counts = spark.read.parquet(out + "/counts")
    total = counts.agg(F.sum("count")).first()[0]
    assert total == routed.filter(F.col("route_id") != "_errors").count()


def test_streaming_restart_is_idempotent(spark, stream_input, tmp_path):
    out = str(tmp_path / "sout2")
    q = streaming_pipeline(spark, stream_input, out, available_now=True)
    q.awaitTermination(300)
    n1 = spark.read.parquet(out + "/routed").count()
    # restart with same checkpoint: no new input ⇒ no new output
    q2 = streaming_pipeline(spark, stream_input, out, available_now=True)
    q2.awaitTermination(300)
    n2 = spark.read.parquet(out + "/routed").count()
    assert n1 == n2 == 3000


def test_streaming_logdedup_windows(spark, stream_input, tmp_path):
    out = str(tmp_path / "sout3")
    q = streaming_logdedup(spark, stream_input, out, interval="10 seconds")
    q.awaitTermination(300)
    dd = spark.read.parquet(out + "/dedup")
    assert dd.count() > 0
    assert dd.filter(F.col("log_count") <= 0).count() == 0
    # windows align to 10s boundaries
    mis = dd.filter(F.unix_timestamp("window_start") % 10 != 0).count()
    assert mis == 0


def test_streaming_recombine_stateful(spark, tmp_path):
    """applyInPandasWithState recombine: sessions closed by the next
    first-line are emitted; the trailing open session stays in state (flushes
    on force_flush timeout / a later poll — reference force_flush_period)."""
    import pandas as pd

    from opentelemetry_collector_contrib_spark.streaming.stream import streaming_recombine

    inp = tmp_path / "rc_in"
    inp.mkdir()
    rows = []
    for src in ("svcA", "svcB"):
        base = 0 if src == "svcA" else 100
        rows += [
            (src, base + 0, "START req handled"),
            (src, base + 1, "  detail line 1"),
            (src, base + 2, "  detail line 2"),
            (src, base + 3, "START second"),
            (src, base + 4, "  tail"),
            (src, base + 5, "START closer"),  # closes 'second'
        ]
    pd.DataFrame(rows, columns=["source", "doc_id", "body"]).to_parquet(inp / "a.parquet")

    out = str(tmp_path / "rc_out")
    q = streaming_recombine(spark, str(inp), out)
    q.awaitTermination(120)

    got = {
        (r.source, r.doc_id): (r.body, r.recombined_n)
        for r in spark.read.parquet(out + "/recombined").collect()
    }
    for src, base in (("svcA", 0), ("svcB", 100)):
        assert got[(src, base)] == (
            "START req handled\n  detail line 1\n  detail line 2", 3)
        assert got[(src, base + 3)] == ("START second\n  tail", 2)
        # trailing open session: force_flush timeout fires before the
        # availableNow query drains (reference force_flush_period flush)
        assert got[(src, base + 5)] == ("START closer", 1)


def test_streaming_span_metrics(spark, tmp_path):
    """spanmetrics in streaming form: watermarked tumbling-window explicit
    histograms must agree with the batch operator over the same rows."""
    import datetime

    from pyspark.sql import functions as F

    from opentelemetry_collector_contrib_spark.operators.connectors import span_metrics
    from opentelemetry_collector_contrib_spark.streaming.stream import (
        streaming_span_metrics,
    )

    inp = tmp_path / "spans_in"
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    for i in range(400):
        rows.append(
            (
                base + datetime.timedelta(seconds=i % 25),
                "op_a" if i % 3 else "op_b",
                float((i * 37) % 300),
            )
        )
    # write the fixture via Spark: pandas emits TIMESTAMP(NANOS) which the
    # streaming reader's micros schema refuses
    spark.createDataFrame(
        rows, "ts timestamp, span_name string, duration double"
    ).coalesce(1).write.mode("overwrite").parquet(str(inp))

    out = str(tmp_path / "spans_out")
    stream_in = spark.readStream.schema(
        "ts timestamp, span_name string, duration double"
    ).parquet(str(inp))
    q = streaming_span_metrics(
        spark, stream_in, out, ["span_name"], "duration", "ts",
        interval="10 seconds", explicit_buckets=[50, 100, 200],
    )
    q.awaitTermination(120)

    got_df = spark.read.parquet(out + "/span_metrics")
    # latest emission per (window, dims) — update mode re-emits on change
    w = __import__("pyspark").sql.Window.partitionBy("window_start", "span_name").orderBy(
        F.desc("batch_id")
    )
    got = {
        (str(r.window_start), r.span_name): (r.calls, r.le_50, r.le_100, r.le_200, r.le_inf)
        for r in got_df.withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .collect()
    }

    batch_df = spark.createDataFrame(rows, "ts timestamp, span_name string, duration double")
    batch = span_metrics(
        batch_df.withColumn("w", F.window("ts", "10 seconds")),
        ["w", "span_name"], "duration", explicit_buckets=[50, 100, 200],
    )
    want = {
        (str(r["w"].start), r.span_name): (r.calls, r.le_50, r.le_100, r.le_200, r.le_inf)
        for r in batch.collect()
    }
    assert got == want and len(want) >= 4


def test_streaming_signal_to_metrics(spark, tmp_path):
    """signaltometrics in streaming form: watermarked tumbling-window sums
    must agree with the batch operator windowed over the same rows."""
    import datetime

    from pyspark.sql import functions as F

    from opentelemetry_collector_contrib_spark.operators.connectors import (
        SignalMetricDef,
        signal_to_metrics,
    )
    from opentelemetry_collector_contrib_spark.streaming.stream import (
        streaming_signal_to_metrics,
    )

    inp = tmp_path / "s2m_in"
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (
            base + datetime.timedelta(seconds=i % 25),
            "GET" if i % 3 else "POST",
            (i * 7) % 50,
        )
        for i in range(300)
    ]
    spark.createDataFrame(
        rows, "ts timestamp, method string, latency int"
    ).coalesce(1).write.mode("overwrite").parquet(str(inp))

    defs = [
        SignalMetricDef(
            name="lat.sum", value="latency", metric_type="sum",
            conditions=['method == "GET"'],
        )
    ]
    out = str(tmp_path / "s2m_out")
    stream_in = spark.readStream.schema(
        "ts timestamp, method string, latency int"
    ).parquet(str(inp))
    queries = streaming_signal_to_metrics(
        spark, stream_in, out, defs, ts_col="ts", interval="10 seconds"
    )
    for q in queries:
        q.awaitTermination(120)

    got_df = spark.read.parquet(out + "/lat.sum")
    w = __import__("pyspark").sql.Window.partitionBy("window_start").orderBy(
        F.desc("batch_id")
    )
    got = {
        str(r.window_start): r.value
        for r in got_df.withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .collect()
    }

    batch_df = spark.createDataFrame(rows, "ts timestamp, method string, latency int")
    expect = {
        str(r._w.start): r.value
        for r in signal_to_metrics(
            batch_df.withColumn("_w", F.window("ts", "10 seconds")),
            defs, window_col="_w",
        )["lat.sum"].collect()
    }
    assert got == expect and len(expect) >= 2
