"""Token table generation + decode round-trip invariants."""

import numpy as np
import pyarrow as pa

from opentelemetry_collector_contrib_spark.sources import tokens as tok


def test_generate_deterministic():
    a = tok.generate_tokens_table(500, seed=42)
    b = tok.generate_tokens_table(500, seed=42)
    assert a.equals(b)
    c = tok.generate_tokens_table(500, seed=43)
    assert not a.equals(c)


def test_tokens_roundtrip_bytes():
    t = tok.generate_tokens_table(300, seed=1)
    toks = t.column("tokens").to_pylist()
    n_tok = t.column("n_tok").to_pylist()
    for row, n in zip(toks[:50], n_tok[:50]):
        assert len(row) == n
        line = bytes(row).decode("utf-8")
        assert line  # decodable, non-empty
        assert all(0 <= v <= 255 for v in row)


def test_source_skew():
    t = tok.generate_tokens_table(5000, seed=42)
    import collections

    c = collections.Counter(t.column("source").to_pylist())
    assert c["noisy-svc"] / 5000 > 0.5  # Zipf skew fixture holds


def test_decode_tokens_arrow_matches_python(spark, tokens_path):
    df = tok.read_tokens(spark, tokens_path).limit(200)
    out = tok.decode_tokens(df, "body").select("doc_id", "tokens", "body").collect()
    for r in out:
        assert r.body == bytes(r.tokens).decode("utf-8")


def test_decode_expr_matches_arrow_on_ascii(spark, tokens_path):
    df = tok.read_tokens(spark, tokens_path).limit(200)
    a = {r.doc_id: r.body for r in tok.decode_tokens(df, "body", mode="arrow").select("doc_id", "body").collect()}
    e = {r.doc_id: r.body for r in tok.decode_tokens(df, "body", mode="expr").select("doc_id", "body").collect()}
    assert a == e


def test_decode_handles_invalid_utf8(spark):
    tbl = pa.table(
        {
            "doc_id": ["x"],
            "tokens": pa.array([[72, 105, 255, 33]], type=pa.list_(pa.int32())),
            "n_tok": pa.array([4], type=pa.int32()),
            "source": ["app-a"],
        }
    )
    df = spark.createDataFrame(tbl.to_pandas(), schema=tok.TOKENS_SCHEMA)
    row = tok.decode_tokens(df, "body").collect()[0]
    assert row.body == b"Hi\xff!".decode("utf-8", "replace")
