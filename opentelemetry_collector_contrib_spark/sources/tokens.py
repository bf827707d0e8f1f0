"""Primary input: the pre-tokenized training-sequence table, and its decoder.

Input shape (BASELINE.json input_hint):
    ``doc_id:string, tokens:array<int32>, n_tok:int32, source:string``

Token id == byte value (0-255) of the UTF-8 encoding of a synthetic log line;
the invariant ``decode(tokens) == line`` is exact and round-trips.

The synthetic corpus mirrors the reference's testbed log lines
(``testbed/tests/log_test.go:262-266`` — ~100 B/line) and the named-group
regex fixtures (``pkg/stanza/operator/parser/regex/parser_test.go``), with a
Zipf-skewed ``source`` distribution (noisy-svc ≈ 60% of rows) to exercise
skew-aware repartitioning.

Everything here is vectorized: generation builds one big byte buffer +
offsets with numpy and materializes the ``tokens`` list column zero-copy via
Arrow ListArray buffers; decoding reconstructs an Arrow StringArray from the
ListArray's buffers (no per-row Python in either direction).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TOKENS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType(), False), False),
        T.StructField("n_tok", T.IntegerType(), False),
        T.StructField("source", T.StringType(), False),
    ]
)

# source → share of rows. noisy-svc dominates (skew fixture, FIXTURES.md §1).
SOURCES = ["app-a", "app-b", "nginx", "k8s", "noisy-svc"]
SOURCE_WEIGHTS = [0.12, 0.12, 0.10, 0.06, 0.60]

_SEVS = [
    "TRACE", "DEBUG", "INFO", "WARN", "WARNING", "ERROR", "ERR", "FATAL",
    "17", "404", "503", "info", "error",
]
_COMPONENTS = ["auth", "billing", "api", "db", "cache", "scheduler"]
_WORDS = [
    "request", "completed", "failed", "retry", "timeout", "connection",
    "user", "login", "cache", "miss", "hit", "flush", "queue", "drained",
    "rotation", "checkpoint", "shard", "rebalanced", "lease", "renewed",
]
_EPOCH_2026 = 1767225600  # 2026-01-01T00:00:00Z


def _build_lines(n: int, seed: int) -> tuple[list[str], np.ndarray]:
    """Return (lines, source_idx) for n rows, fully seeded.

    Line grammar (FIXTURES.md §1):
      <ts> <sev> [<component>] user=<user> ip=<ip> latency_ms=<int> msg="<text>"
    ~5% malformed (missing sev / broken quote), ~3% exact duplicates,
    app-b rows use a JSON body instead.
    """
    rng = np.random.default_rng(seed)
    src_idx = rng.choice(len(SOURCES), size=n, p=SOURCE_WEIGHTS)
    sev = rng.integers(0, len(_SEVS), size=n)
    comp = rng.integers(0, len(_COMPONENTS), size=n)
    user = rng.integers(0, 500, size=n)
    ip3 = rng.integers(0, 256, size=n)
    ip4 = rng.integers(1, 255, size=n)
    lat = rng.integers(0, 5000, size=n)
    w1 = rng.integers(0, len(_WORDS), size=n)
    w2 = rng.integers(0, len(_WORDS), size=n)
    # monotone-within-source timestamps: base + row_index * 1ms + jitter<1ms
    micros = _EPOCH_2026 * 1_000_000 + np.arange(n, dtype=np.int64) * 1000 + rng.integers(0, 1000, size=n)
    malformed = rng.random(n) < 0.05
    dup = rng.random(n) < 0.03

    secs = micros // 1_000_000
    frac = micros % 1_000_000
    # vectorized strftime via pandas
    import pandas as pd

    ts_str = pd.Series(pd.to_datetime(secs, unit="s", utc=True)).dt.strftime("%Y-%m-%dT%H:%M:%S").to_numpy()
    lines: list[str] = []
    for i in range(n):
        s = SOURCES[src_idx[i]]
        if dup[i] and i > 0:
            lines.append(lines[i - 1])
            continue
        ts = f"{ts_str[i]}.{frac[i]:06d}Z"
        c = _COMPONENTS[comp[i]]
        msg = f"{_WORDS[w1[i]]} {_WORDS[w2[i]]}"
        if s == "app-b":
            # JSON body variant (tests json parser / ParseJSON)
            lines.append(
                '{"ts":"%s","level":"%s","component":"%s","user":"u%d","ip":"10.0.%d.%d",'
                '"latency_ms":%d,"msg":"%s"}'
                % (ts, _SEVS[sev[i]].lower(), c, user[i], ip3[i], ip4[i], lat[i], msg)
            )
        elif malformed[i]:
            # missing sev token OR broken quote — exercises on_error routing
            if i % 2 == 0:
                lines.append(f"{ts} [{c}] user=u{user[i]} ip=10.0.{ip3[i]}.{ip4[i]} latency_ms={lat[i]} msg=\"{msg}\"")
            else:
                lines.append(f"{ts} {_SEVS[sev[i]]} [{c}] user=u{user[i]} msg=\"{msg}")
        else:
            lines.append(
                f"{ts} {_SEVS[sev[i]]} [{c}] user=u{user[i]} ip=10.0.{ip3[i]}.{ip4[i]} "
                f'latency_ms={lat[i]} msg="{msg}"'
            )
    return lines, src_idx


def _lines_to_arrow(lines: list[str], src_idx: np.ndarray) -> pa.Table:
    """Encode lines → tokens list column zero-copy through Arrow buffers.

    A StringArray's (offsets, data) buffers are exactly a ListArray<uint8>'s
    (offsets, values); we cast values to int32 once, vectorized.
    """
    sa = pa.array(lines, type=pa.string())
    n = len(sa)
    offsets = np.frombuffer(sa.buffers()[1], dtype=np.int32, count=n + 1)
    data = np.frombuffer(sa.buffers()[2], dtype=np.uint8, count=int(offsets[-1]))
    values = pa.array(data.astype(np.int32), type=pa.int32())
    tokens = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), values)
    n_tok = pa.array((offsets[1:] - offsets[:-1]).astype(np.int32), type=pa.int32())
    srcs = pa.array([SOURCES[i] for i in src_idx], type=pa.string())
    doc_id = pa.array([f"{SOURCES[src_idx[i]]}-{i:012d}" for i in range(n)], type=pa.string())
    return pa.table({"doc_id": doc_id, "tokens": tokens, "n_tok": n_tok, "source": srcs})


def encode_lines_to_tokens_table(lines: list[str], sources: list[str]) -> pa.Table:
    """Public helper for tests: arbitrary lines → tokens table."""
    src_map = {s: i for i, s in enumerate(SOURCES)}
    idx = np.array([src_map.get(s, 0) for s in sources])
    tbl = _lines_to_arrow(lines, idx)
    # honor caller-provided sources verbatim (may be outside SOURCES)
    return tbl.set_column(3, "source", pa.array(sources, type=pa.string()))


def generate_tokens_table(n: int, seed: int = 42) -> pa.Table:
    lines, src_idx = _build_lines(n, seed)
    return _lines_to_arrow(lines, src_idx)


def _write_chunk(args: tuple) -> None:
    path, i, m, seed, row_group_size = args
    tbl = generate_tokens_table(m, seed + i)
    # small row groups keep the files splittable — a single giant row
    # group caps scan parallelism at file count regardless of cores
    pq.write_table(
        tbl, os.path.join(path, f"part-{i:05d}.parquet"), row_group_size=row_group_size
    )


def write_tokens_parquet(
    path: str,
    n: int,
    seed: int = 42,
    chunk: int = 250_000,
    row_group_size: int = 32_768,
    workers: int | None = None,
) -> str:
    """Materialize the synthetic table to parquet, chunked so memory stays flat.

    Each chunk is generated with seed+chunk_index — deterministic for a given
    (n, seed, chunk) regardless of worker count. Files are written
    one-per-chunk so Spark parallelizes the scan; chunks are generated by a
    process pool (chunk generation is pure CPU — single-threaded, 80M rows
    would cost ~20 min; 16 workers bring it under 2).
    """
    os.makedirs(path, exist_ok=True)
    done = os.path.join(path, "_SUCCESS")
    if os.path.exists(done):
        return path
    jobs = []
    i, start = 0, 0
    while start < n:
        m = min(chunk, n - start)
        jobs.append((path, i, m, seed, row_group_size))
        start += m
        i += 1
    if workers is None:
        workers = min(16, os.cpu_count() or 4, len(jobs))
    if workers <= 1 or len(jobs) == 1:
        for j in jobs:
            _write_chunk(j)
    else:
        from concurrent.futures import ProcessPoolExecutor

        with ProcessPoolExecutor(max_workers=workers) as ex:
            list(ex.map(_write_chunk, jobs, chunksize=1))
    with open(done, "w"):
        pass
    return path


def read_tokens(spark: SparkSession, path: str) -> DataFrame:
    """Scan stage — the filelog-receiver analog.

    Reference: ``pkg/stanza/fileconsumer/file.go:114-175`` polls files and
    checkpoints offsets; in Spark the scan is a parquet/Iceberg snapshot read
    and resumability lives in the lineage table (plans/lineage.py).
    """
    return spark.read.schema(TOKENS_SCHEMA).parquet(path)


def decode_tokens(df: DataFrame, out: str = "body", mode: str = "arrow") -> DataFrame:
    """tokens(array<int32> of byte values) → ``body`` string column.

    This is the byte→text step of the parse path (the reference decodes via
    ``golang.org/x/text`` encodings in ``pkg/stanza/decode``; here the corpus
    is UTF-8 bytes-as-token-ids).

    mode="arrow": mapInArrow; rebuilds a StringArray directly from the
      ListArray's (offsets, values) buffers — zero-copy, no per-row Python.
      Handles arbitrary UTF-8; invalid bytes fall back to a per-row
      ``errors='replace'`` decode (sanitize_utf8 semantics,
      ``operator/transformer/sanitizeutf8/transformer.go:70``).
    mode="expr": pure Column expression (whole-stage codegen, no Python
      worker at all) — correct for ASCII corpora only, since char(id)
      maps codepoints, not UTF-8 bytes.
    """
    if mode == "expr":
        return df.withColumn(out, F.concat_ws("", F.transform("tokens", lambda x: F.char(x))))

    in_schema = df.schema
    out_schema = T.StructType(in_schema.fields + [T.StructField(out, T.StringType(), True)])
    tok_idx = in_schema.fieldNames().index("tokens")

    def _decode(batches):
        for batch in batches:
            col = batch.column(tok_idx)
            if isinstance(col, pa.ChunkedArray):  # pragma: no cover - defensive
                col = col.combine_chunks()
            # ListArray slices keep a view: offsets already absolute into values
            offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            vals = col.values.to_numpy(zero_copy_only=False).astype(np.uint8)
            lo, hi = int(offs[0]), int(offs[-1])
            data = vals[lo:hi].tobytes()
            rel = (offs - lo).astype(np.int32)
            sa = pa.StringArray.from_buffers(
                len(col), pa.py_buffer(rel.tobytes()), pa.py_buffer(data)
            )
            try:
                sa.validate(full=True)
            except pa.ArrowInvalid:
                sa = pa.array(
                    [data[rel[i]: rel[i + 1]].decode("utf-8", "replace") for i in range(len(col))],
                    type=pa.string(),
                )
            arrays = [batch.column(i) for i in range(batch.num_columns)] + [sa]
            yield pa.RecordBatch.from_arrays(arrays, schema=pa.schema(list(batch.schema) + [pa.field(out, pa.string())]))

    return df.mapInArrow(_decode, out_schema)


def dim_source_rows() -> list[dict]:
    """dim_source — the k8sattributes pod-association analog (FIXTURES.md §2).

    Reference: ``processor/k8sattributesprocessor/processor.go:185-208``
    (pod lookup by association key). One source (``k8s``) has NO row →
    left-join miss ⇒ nulls (association-failure path).
    """
    return [
        {"source": "app-a", "k8s_namespace_name": "prod", "k8s_pod_name": "app-a-7f9c",
         "k8s_node_name": "node-3", "service_version": "1.4.2"},
        {"source": "app-b", "k8s_namespace_name": "prod", "k8s_pod_name": "app-b-22d1",
         "k8s_node_name": "node-1", "service_version": "2.0.1"},
        {"source": "nginx", "k8s_namespace_name": "edge", "k8s_pod_name": "nginx-0a11",
         "k8s_node_name": "node-2", "service_version": "1.25.3"},
        {"source": "noisy-svc", "k8s_namespace_name": "dev", "k8s_pod_name": "noisy-6b2f",
         "k8s_node_name": "node-3", "service_version": "0.9.0"},
    ]


def dim_namespace_rows() -> list[dict]:
    """dim_namespace — secondary lookup (``processor.go:230-240``)."""
    return [
        {"k8s_namespace_name": "prod", "team": "core", "cost_center": "cc-100"},
        {"k8s_namespace_name": "edge", "team": "traffic", "cost_center": "cc-200"},
        {"k8s_namespace_name": "dev", "team": "platform", "cost_center": "cc-300"},
    ]
