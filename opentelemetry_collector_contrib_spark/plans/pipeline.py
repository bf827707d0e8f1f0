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
from pyspark.sql import types as T

from ..operators import connectors, enrich, parsers
from ..sources import tokens as tok
from .lineage import LineageLog

JSON_BODY_SCHEMA = (
    "ts string, level string, component string, user string, ip string, "
    "latency_ms int, msg string"
)

#: the flagship pipeline's explicit severity mapping config (HTTP status →
#: level, a mapping feature per severity_builder.go:94-105, not a builtin)
PIPELINE_SEVERITY_MAPPING = {"info": "2xx", "info2": "3xx", "warn": "4xx", "error": "5xx"}


def fused_parse_arrow(df: DataFrame, keep: set[str] | None = None) -> DataFrame:
    """Fused decode + parse in ONE Arrow pass (no second Python roundtrip).

    Per batch: rebuild the body StringArray zero-copy from the token
    ListArray buffers (sources/tokens.decode_tokens), then a single
    ``Series.str.extract`` for all 7 named groups, ``json.loads`` only on
    the JSON-body subset, and vectorized severity mapping. This is the
    regex_parser + json_parser + severity_parser stack of
    ``pkg/stanza/operator/parser/{regex,jsonparser,severity}`` collapsed
    into the decode pass.

    ``keep``: optional set of output column names to emit (input
    passthroughs and parse outputs alike). mapInArrow is opaque to
    Catalyst, so the column pruning the optimizer would do for a plain
    projection (guide §4.2) must be done by hand here: a terminal
    aggregate that only consumes a handful of parsed columns should not
    pay Arrow transport + row conversion for ``tokens``/``body`` on the
    way back to the JVM. Every row is still decoded and parsed
    identically — ``keep`` changes which columns cross the boundary,
    never what is computed from each row.
    """
    import re as _re

    import pandas as pd

    from ..functions.severity import NUMBER_TO_CANONICAL_TEXT, SEVERITY_TEXT_TO_NUMBER

    in_fields = list(df.schema.fields)
    extra = [
        T.StructField("body", T.StringType()),
        T.StructField("ts_raw", T.StringType()),
        T.StructField("sev_raw", T.StringType()),
        T.StructField("component", T.StringType()),
        T.StructField("user", T.StringType()),
        T.StructField("ip", T.StringType()),
        T.StructField("latency_ms", T.IntegerType()),
        T.StructField("msg", T.StringType()),
        T.StructField("severity_number", T.IntegerType()),
        T.StructField("severity_text", T.StringType()),
        T.StructField("_parse_error", T.BooleanType()),
    ]
    all_fields = in_fields + extra
    if keep is None:
        out_fields = all_fields
    else:
        out_fields = [f for f in all_fields if f.name in keep]
    out_schema = T.StructType(out_fields)
    emit_names = [f.name for f in out_fields]
    tok_idx = df.schema.fieldNames().index("tokens")
    rx = _re.compile(parsers.DEFAULT_LOG_PATTERN)
    groups = ["ts", "sev", "component", "user", "ip", "latency_ms", "msg"]
    jkeys = ["ts", "level", "component", "user", "ip", "latency_ms", "msg"]
    group_out = {"ts": "ts_raw", "sev": "sev_raw"}
    emitted = set(emit_names)
    want_sev = bool({"sev_raw", "severity_number", "severity_text"} & emitted)
    # 'ts' always participates (drives _parse_error); 'sev' when any
    # severity output is emitted; the rest only when their column is kept
    need_groups = [
        g
        for g in groups
        if g == "ts"
        or (g == "sev" and want_sev)
        or group_out.get(g, g) in emitted
    ]

    def _sev_for_unique(u):
        # one unique severity token -> (number, canonical text); replicates
        # the base-map-then-numeric-range np.select the pandas path used,
        # evaluated O(distinct) instead of O(rows)
        n = SEVERITY_TEXT_TO_NUMBER.get(u)
        if n is None:
            try:
                v = float(u)
            except (TypeError, ValueError):
                v = None
            if v is not None and 1 <= v <= 24:
                n = int(v)
            elif v is not None and 200 <= v <= 299:
                n = 9
            elif v is not None and 300 <= v <= 399:
                n = 10
            elif v is not None and 400 <= v <= 499:
                n = 13
            elif v is not None and 500 <= v <= 599:
                n = 17
            else:
                n = 0
        return n, NUMBER_TO_CANONICAL_TEXT.get(n, "DEFAULT")

    def _fn(batches):
        import json as _json

        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            col = batch.column(tok_idx)
            offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            vals = col.values.to_numpy(zero_copy_only=False).astype(np.uint8)
            lo, hi = int(offs[0]), int(offs[-1])
            data = vals[lo:hi].tobytes()
            rel = (offs - lo).astype(np.int32)
            sa = pa.StringArray.from_buffers(len(col), pa.py_buffer(rel.tobytes()), pa.py_buffer(data))
            try:
                sa.validate(full=True)
            except pa.ArrowInvalid:
                sa = pa.array(
                    [data[rel[i]: rel[i + 1]].decode("utf-8", "replace") for i in range(len(col))],
                    type=pa.string(),
                )

            # RE2 (pyarrow C++) single-pass extract over the Arrow array —
            # no GIL, no per-row Python; the whole batch stays Arrow-native
            # (no object-dtype pandas round-trip — measured as the dominant
            # cost of the previous kernel). Exactness: every group in
            # DEFAULT_LOG_PATTERN is mandatory (no optional groups), so
            # RE2's ''-for-nonparticipating ambiguity cannot arise; the one
            # remaining Python-re divergence ($ matches before a trailing
            # newline, RE2 does not) is guarded by re-extracting the
            # trailing-newline subset with Python re. ArrowInvalid (RE2
            # rejecting the pattern) falls back to pandas wholesale.
            try:
                res = pc.extract_regex(sa, rx.pattern)
                cols = {g: pc.struct_field(res, g) for g in need_groups}
                nl = pc.fill_null(pc.ends_with(sa, pattern="\n"), False)
                if pc.any(nl).as_py():
                    sub = sa.filter(nl).to_pandas().str.extract(rx)
                    sub.columns = groups
                    for g in need_groups:
                        rep = pa.array(
                            [None if pd.isna(v) else v for v in sub[g]],
                            type=pa.string(),
                        )
                        cols[g] = pc.replace_with_mask(cols[g], nl, rep)
            except pa.ArrowInvalid:
                ex = sa.to_pandas().str.extract(rx)  # one vectorized pass
                ex.columns = groups
                cols = {
                    g: pa.Array.from_pandas(ex[g], type=pa.string())
                    for g in need_groups
                }
            is_json = pc.fill_null(pc.starts_with(sa, pattern="{"), False)
            err = pc.and_(pc.is_null(cols["ts"]), pc.invert(is_json))
            if pc.any(is_json).as_py():
                parsed = []
                jerr = []
                for line in sa.filter(is_json).to_pylist():
                    try:
                        o = _json.loads(line)
                        parsed.append(o if isinstance(o, dict) else {})
                        jerr.append(not isinstance(o, dict) or "ts" not in o)
                    except ValueError:
                        parsed.append({})
                        jerr.append(True)
                for g, k in zip(groups, jkeys):
                    if g not in cols:
                        continue
                    rep = pa.array(
                        [None if p.get(k) is None else str(p.get(k)) for p in parsed],
                        type=pa.string(),
                    )
                    cols[g] = pc.replace_with_mask(cols[g], is_json, rep)
                err = pc.replace_with_mask(err, is_json, pa.array(jerr, pa.bool_()))

            produced = {f.name: batch.column(i) for i, f in enumerate(in_fields)}
            produced["body"] = sa
            produced["_parse_error"] = err
            for g in need_groups:
                produced[group_out.get(g, g)] = cols[g]
            if "latency_ms" in cols:
                try:
                    produced["latency_ms"] = pc.cast(cols["latency_ms"], pa.int32())
                except pa.ArrowInvalid:
                    # non-integral/garbage latency token (JSON bodies only;
                    # the regex group is digits-only) — pandas coerce path
                    produced["latency_ms"] = pa.Array.from_pandas(
                        pd.to_numeric(
                            cols["latency_ms"].to_pandas(), errors="coerce"
                        ).astype("Int32"),
                        type=pa.int32(),
                    )
            if want_sev:
                # builtin default mapping (aliases + "1".."24") PLUS the
                # flagship pipeline's explicit severity mapping config
                # {info: 2xx, info2: 3xx, warn: 4xx, error: 5xx} — HTTP
                # ranges are a mapping feature in the reference
                # (severity_builder.go:94-105), not builtin defaults; this
                # fused kernel hard-wires the flagship's FIXTURES.md config
                # (PIPELINE_SEVERITY_MAPPING). Dictionary-encode first: the
                # severity vocabulary is tiny, so the mapping runs per
                # DISTINCT value, then a C++ take().
                enc = pc.dictionary_encode(pc.utf8_lower(cols["sev"]))
                mapped = [_sev_for_unique(u) for u in enc.dictionary.to_pylist()]
                produced["severity_number"] = pc.fill_null(
                    pc.take(
                        pa.array([m[0] for m in mapped], pa.int32()), enc.indices
                    ),
                    0,
                )
                produced["severity_text"] = pc.fill_null(
                    pc.take(
                        pa.array([m[1] for m in mapped], pa.string()), enc.indices
                    ),
                    NUMBER_TO_CANONICAL_TEXT.get(0, "DEFAULT"),
                )

            yield pa.RecordBatch.from_arrays(
                [produced[n] for n in emit_names], names=emit_names
            )

    return df.mapInArrow(_fn, out_schema)


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


def parse_stage(
    df: DataFrame, regex_mode: str = "arrow", keep: set[str] | None = None
) -> DataFrame:
    """decode → line/JSON parse → time + severity. No shuffle.

    mode="arrow" (default): ONE fused mapInArrow pass does decode + a
    single-pass vectorized regex extract + JSON-subset parse + severity
    mapping. Measured ~4× faster than the pure-Column path, whose repeated
    regexp_extract (7×/row) and un-CSE'd from_json references (6×/row)
    dominate. mode="column" keeps everything in whole-stage codegen and is
    retained for differential testing.

    ``keep`` (arrow mode): column-prune the opaque kernel's OUTPUT to the
    named columns — what Catalyst would do automatically for a transparent
    projection (guide §4.2). Per-row parse work is unchanged; only the
    Arrow payload crossing back to the JVM shrinks.
    """
    if regex_mode == "arrow":
        kernel_keep = None
        if keep is not None:
            kernel_keep = set(keep) - {"timestamp", "observed_timestamp"}
            if {"timestamp", "observed_timestamp"} & set(keep):
                kernel_keep.add("ts_raw")
        df = fused_parse_arrow(df, keep=kernel_keep)
        if kernel_keep is None or "ts_raw" in kernel_keep:
            df = parsers.time_parser(df, "ts_raw", "timestamp", "%Y-%m-%dT%H:%M:%S.%fZ")
            df = df.withColumn("observed_timestamp", F.col("timestamp"))
        return df
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
    df = parsers.severity_parser(df, "sev_raw", mapping=PIPELINE_SEVERITY_MAPPING)
    # observed_timestamp: ingest time in the reference (entry.go:38-43); here
    # the deterministic event time stands in so tests are replayable.
    return df.withColumn("observed_timestamp", F.col("timestamp"))


def enrich_stage(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Dimension chain: source → namespace (k8sattributes analog).

    The two dims are static in-repo config tables (5 + 3 rows), so the
    lookup is folded to constant literal maps (``GetMapValue`` — missing
    key ⇒ null, exactly the left-join association-failure path): zero
    broadcast-build jobs and zero driver ``createDataFrame`` fixed cost
    per run, same values (pinned by test_enrichment_matches_oracle). Same
    move the r6 severity_parser row made. The broadcast-join-shaped
    operator itself lives on in ``operators/enrich.py`` and is exercised
    by the ``enrich_broadcast_chain`` catalog row, where the dimension is
    a real table, not static config.
    """

    def attach(frame: DataFrame, rows: list[dict], key: str) -> DataFrame:
        payload = [c for c in rows[0] if c != key]
        out_cols = {}
        for c in payload:
            m = F.create_map(
                *[x for r in rows for x in (F.lit(r[key]), F.lit(r.get(c)))]
            )
            out_cols[c] = m[F.col(key)]
        return frame.withColumns(out_cols)

    df = attach(df, tok.dim_source_rows(), "source")
    return attach(df, tok.dim_namespace_rows(), "k8s_namespace_name")


def default_routes() -> list[connectors.Route]:
    """FIXTURES.md §3 route table (routingconnector semantics)."""
    return [
        connectors.Route("sink_errors", F.col("severity_number") >= 17, "move"),
        connectors.Route("sink_audit", F.col("component") == "auth", "copy"),
        connectors.Route("sink_prod", F.col("k8s_namespace_name") == "prod", "move"),
    ]


def _input_fingerprint(input_path: str) -> str:
    """Resume key: path + md5 over the (name, size) listing — content-derived
    so a rerun after the data under the path changed recomputes instead of
    returning stale cached metrics."""
    import hashlib

    base = input_path.rstrip("/")
    parts = []
    if os.path.isdir(base):
        for f in sorted(os.listdir(base)):
            p = os.path.join(base, f)
            if os.path.isfile(p):
                parts.append(f"{f}:{os.stat(p).st_size}")
    elif os.path.isfile(base):
        parts.append(f"{os.path.basename(base)}:{os.stat(base).st_size}")
    digest = hashlib.md5("|".join(parts).encode()).hexdigest()[:16]
    return f"{base}:{digest}"


def run_pipeline(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    regex_mode: str = "arrow",
    write_sinks: bool = True,
    salt_partitions: int | None = None,
) -> dict:
    """Full e2e run; returns the metrics dict (also persisted to _metrics).

    Resume: keyed by the input fingerprint — a rerun over an already-committed
    input is a no-op (checkpoint.go:24-60 semantics at job granularity).
    """
    lineage = LineageLog(out_dir)
    fingerprint = _input_fingerprint(input_path)
    if lineage.completed("pipeline", fingerprint):
        # fingerprint covers the input listing+sizes, so changed data under
        # the same path recomputes; a missing metrics file (cleaned out from
        # under the lineage record) also falls through to recompute
        mpath = os.path.join(out_dir, "_metrics", "metrics.json")
        if os.path.exists(mpath):
            with open(mpath) as f:
                return json.load(f)

    t0 = time.time()
    raw = tok.read_tokens(spark, input_path)
    parsed = parse_stage(raw, regex_mode)
    enriched = enrich_stage(spark, parsed)

    # on_error=send (helper/transformer.go:142-173): flagged rows get the
    # reserved "_errors" route so ONE write covers every sink — the heavy
    # decode+parse DAG executes exactly once; all downstream sinks/aggregates
    # derive from cheap column-pruned re-scans of the routed table.
    routed = connectors.routed_frame(enriched, default_routes())
    routed = routed.withColumn(
        "route_id", F.when(F.col("_parse_error"), "_errors").otherwise(F.col("route_id"))
    )
    if salt_partitions:
        routed = salted_repartition(routed, "route_id", salt_partitions)

    # Per-sink accounting via observe() — collected during the SAME action as
    # the write, no extra pass (the batch processor's accounting analog).
    from pyspark.sql import Observation

    obs = Observation("pipeline")
    routed = routed.observe(
        obs,
        F.count(F.lit(1)).alias("rows_total"),
        F.sum((F.col("route_id") == "_errors").cast("long")).alias("rows_errors"),
    )

    routed_path = os.path.join(out_dir, "routed")
    if write_sinks:
        from ..sources.table_format import read_dataset, write_dataset

        write_dataset(routed, routed_path, partition_by=["route_id"])
        n_total = int(obs.get["rows_total"])
        n_err = int(obs.get["rows_errors"])
        back = read_dataset(spark, routed_path)  # partition-pruned derived reads
        # copy route (non-consuming tee): audit rows regardless of move target
        clean = back.filter(F.col("route_id") != "_errors")

        def _w_audit() -> None:
            write_dataset(
                back.filter(
                    (F.col("component") == "auth") & (F.col("route_id") != "_errors")
                ),
                os.path.join(out_dir, "sink_audit"),
            )

        def _w_counts() -> None:
            write_dataset(
                clean.groupBy("route_id", "severity_text").agg(
                    F.count(F.lit(1)).alias("count")
                ),
                os.path.join(out_dir, "counts"),
            )

        def _w_dedup_counts() -> None:
            write_dataset(
                clean.groupBy(
                    F.window("observed_timestamp", "10 seconds").alias("w"),
                    "source", "severity_number",
                ).agg(F.count(F.lit(1)).alias("log_count")).drop("w"),
                os.path.join(out_dir, "dedup_counts"),
            )

        # The three derived sinks are independent re-scans of the committed
        # routed table — run them as concurrent jobs so each job's task tail
        # back-fills the executors the others free (guide §2.6). Exceptions
        # propagate through pool.map; inheritable_thread_target keeps job
        # descriptions/locals correct on the JVM side.
        from concurrent.futures import ThreadPoolExecutor

        from pyspark import inheritable_thread_target

        with ThreadPoolExecutor(max_workers=3) as pool:
            list(
                pool.map(
                    inheritable_thread_target(lambda f: f()),
                    [_w_audit, _w_counts, _w_dedup_counts],
                )
            )
    else:
        # sinkless mode: parse→enrich→route→AGGREGATE in one action — the
        # countconnector stage (groupBy + count) is the terminal aggregate;
        # used by bench for the compute-scaling measurement. The terminal
        # aggregate consumes only (route_id, severity_text, _parse_error)
        # plus the enrich/route inputs, so the opaque parse kernel is told
        # to emit exactly those columns (manual column pruning, guide §4.2
        # — Catalyst cannot see through mapInArrow): every row is still
        # decoded/parsed/enriched/routed identically, but tokens/body and
        # the other unused parse outputs stop crossing the Python→JVM
        # boundary. Differential equality with the full-width parse is
        # pinned in tests/test_pipeline_e2e.py.
        slim = parse_stage(
            raw.select("source", "tokens"),
            regex_mode,
            keep={
                "source",
                "component",
                "severity_number",
                "severity_text",
                "_parse_error",
            },
        )
        slim = enrich_stage(spark, slim)
        slim_routed = connectors.routed_frame(slim, default_routes())
        slim_routed = slim_routed.withColumn(
            "route_id",
            F.when(F.col("_parse_error"), "_errors").otherwise(F.col("route_id")),
        )
        rows = (
            slim_routed.groupBy("route_id", "severity_text")
            .agg(F.count(F.lit(1)).alias("count"))
            .collect()
        )
        n_total = sum(r["count"] for r in rows)
        n_err = sum(r["count"] for r in rows if r["route_id"] == "_errors")

    metrics = {
        "rows_routed": n_total - n_err,
        "rows_errors": n_err,
        "wall_s": round(time.time() - t0, 3),
    }
    os.makedirs(os.path.join(out_dir, "_metrics"), exist_ok=True)
    with open(os.path.join(out_dir, "_metrics", "metrics.json"), "w") as f:
        json.dump(metrics, f)
    lineage.commit("pipeline", fingerprint, n_total, n_total - n_err, metrics)
    return metrics


def run_pipeline_incremental(spark: SparkSession, input_path: str, out_dir: str) -> dict:
    """Per-file incremental run — the filelog poll cycle at Spark granularity.

    Each poll: list input files, skip those whose (name, size) fingerprint
    is already committed in ``_lineage`` (the reference checkpoints
    {Fingerprint, Offset} per file after every poll —
    ``fileconsumer/internal/reader/reader.go:30-40``), run the full
    parse→enrich→route DAG over ONLY the new files, APPEND to the routed
    sink, and append delta rows to the counts table — countconnector emits
    monotonic *delta* sums per flush (``counter.go:39-127``), so the counts
    table is additive by design: summing the deltas per key reproduces the
    batch run's totals exactly.

    Per-file rows_in/rows_out land in ``_lineage`` (one record per file) via
    one cheap ``groupBy(input_file_name())`` over the routed output.
    """
    import glob as _glob

    lineage = LineageLog(out_dir)
    files = sorted(_glob.glob(os.path.join(input_path, "*.parquet")))
    done = lineage.files_done("file")
    todo = [f for f in files if LineageLog.file_fingerprint(f) not in done]
    if not todo:
        return {"rows_routed": 0, "rows_errors": 0, "files_processed": 0, "skipped": True}

    t0 = time.time()
    raw = spark.read.schema(tok.TOKENS_SCHEMA).parquet(*todo).withColumn(
        "_input_file", F.input_file_name()
    )
    parsed = parse_stage(raw)
    enriched = enrich_stage(spark, parsed)
    routed = connectors.routed_frame(enriched, default_routes())
    routed = routed.withColumn(
        "route_id", F.when(F.col("_parse_error"), "_errors").otherwise(F.col("route_id"))
    )
    routed_path = os.path.join(out_dir, "routed")
    # three actions consume `routed` (sink write, per-file accounting, delta
    # counts) — persist so the decode+parse DAG runs once per poll cycle
    from ..sources.table_format import write_dataset

    routed = routed.persist()
    write_dataset(routed, routed_path, mode="append", partition_by=["route_id"])

    # per-file accounting from the just-written rows (column-pruned re-scan of
    # only the new data is not possible post-append, so account pre-write via
    # one aggregate over the same DAG — it reuses shuffle-free narrow stages)
    per_file = (
        routed.groupBy("_input_file")
        .agg(
            F.count(F.lit(1)).alias("rows_in"),
            F.sum((F.col("route_id") != "_errors").cast("long")).alias("rows_out"),
        )
        .collect()
    )
    by_name = {os.path.basename(r["_input_file"].replace("file://", "")): r for r in per_file}
    n_total = n_err = 0
    tallies = []
    for f in todo:
        r = by_name.get(os.path.basename(f))
        rows_in = int(r["rows_in"]) if r else 0
        rows_out = int(r["rows_out"]) if r else 0
        n_total += rows_in
        n_err += rows_in - rows_out
        tallies.append((f, rows_in, rows_out))

    # delta counts (countconnector per-flush delta sums): APPEND, never merge
    write_dataset(
        routed.filter(F.col("route_id") != "_errors")
        .groupBy("route_id", "severity_text")
        .agg(F.count(F.lit(1)).alias("count")),
        os.path.join(out_dir, "counts_delta"),
        mode="append",
    )
    routed.unpersist()

    # the lineage record is the LAST thing written — a crash anywhere above
    # leaves the files un-committed so the next poll reprocesses them
    # (at-least-once, matching checkpoint-after-poll in checkpoint.go:24-44);
    # committing before the counts_delta append would instead lose deltas
    # permanently on a crash between the two writes
    for f, rows_in, rows_out in tallies:
        lineage.commit_file("file", LineageLog.file_fingerprint(f), rows_in, rows_out)
    return {
        "rows_routed": n_total - n_err,
        "rows_errors": n_err,
        "files_processed": len(todo),
        "wall_s": round(time.time() - t0, 3),
    }


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
