"""Engine-portable 40-bit hash family: Spark == DuckDB == Python, bit-for-bit.

These tests are what lets the minhash_lsh / ann_lsh_topk catalog rows carry a
DuckDB oracle: every layer (word hash, mixer, folds, signatures, bucket
membership) must agree across all three renderings in
``functions/portable_hash.py``.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.functions import portable_hash as ph
from opentelemetry_collector_contrib_spark.operators import dedup, similarity

WORDS = ["hello", "WORLD", "", "x", "token-42", "日本語", "a b", "ümlaut"]
INTS = [0, 1, 41, 2**39, (1 << 40) - 1, 987654321987]


def test_mix40_three_renderings_agree(spark):
    con = duckdb.connect()
    for x in INTS:
        py = ph.mix40_py(x)
        sql = con.execute(f"SELECT {ph.mix40_sql(str(x) + '::BIGINT')}").fetchone()[0]
        assert py == sql, x
    rows = (
        spark.createDataFrame([(x,) for x in INTS], "x long")
        .select("x", ph.mix40_col(F.col("x")).alias("h"))
        .collect()
    )
    for r in rows:
        assert r.h == ph.mix40_py(r.x), r.x


def test_w40_three_renderings_agree(spark):
    con = duckdb.connect()
    for w in WORDS:
        py = ph.w40_py(w)
        sql = con.execute(f"SELECT {ph.w40_sql('?')}", [w]).fetchone()[0]
        assert py == sql, w
    rows = (
        spark.createDataFrame([(w,) for w in WORDS], "w string")
        .select("w", ph.w40_col(F.col("w")).alias("h"))
        .collect()
    )
    for r in rows:
        assert r.h == ph.w40_py(r.w), r.w


def test_polyfold40_matches(spark):
    con = duckdb.connect()
    vals = [3, 2**39, 17, (1 << 40) - 5]
    py = ph.polyfold40_py(vals)
    sql = con.execute(f"SELECT {ph.polyfold40_sql(str(vals))}").fetchone()[0]
    assert py == sql
    got = (
        spark.createDataFrame([(vals,)], "a array<long>")
        .select(ph.polyfold40_col(F.col("a")).alias("h"))
        .first()[0]
    )
    assert got == py


@pytest.fixture(scope="module")
def docs(spark):
    base = [
        "the quick brown fox jumps over the lazy dog and runs far away today",
        "pack my box with five dozen liquor jugs before the night ends here",
        "sphinx of black quartz judge my vow while the world keeps spinning",
    ]
    rows = []
    i = 0
    for b in base:
        for _ in range(3):
            rows.append((i, b))
            i += 1
        rows.append((i, b.replace("the", "a", 1)))
        i += 1
    rows.append((i, "completely different text with no overlap whatsoever in words"))
    i += 1
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_portable_minhash_finds_dup_clusters(spark, docs):
    """Portable mode preserves the operator's semantics (same clusters the
    xxhash64 mode recovers in test_dedup_similarity.py)."""
    pairs = dedup.minhash_lsh_pairs(
        docs, "text", "doc_id", num_hashes=32, bands=16, k_shingle=3,
        jaccard_threshold=0.5, hash_fn="portable",
    ).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    for base in (0, 4, 8):
        for a in range(base, base + 3):
            for b in range(a + 1, base + 3):
                assert (a, b) in got, (a, b)
    assert not any(12 in p for p in got)


def test_portable_signature_equals_duckdb(spark, docs):
    """Full portable signature + simhash pipeline: Spark vs DuckDB per doc."""
    k, nh = 3, 16
    hs = dedup.shingle_hash_frame(docs, "text", "doc_id", k, hash_fn="portable")
    sig = {
        r.id: list(r.sig)
        for r in hs.select(
            "id",
            dedup.minhash_signature_from_hashes(F.col("hs"), nh, hash_fn="portable").alias("sig"),
        ).collect()
    }
    sims = {
        r.doc_id: r.sh
        for r in docs.select(
            "doc_id", dedup.simhash(F.col("text"), bits=40, hash_fn="portable").alias("sh")
        ).collect()
    }

    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    shingle = ph.mix40_sql(ph.polyfold40_sql(f"wh[i+1:i+{k}]"))
    sig_exprs = ", ".join(
        f"list_min(list_transform(shs, h -> (h * {a} + {b}) & {ph.MASK40}))"
        for a, b in dedup.minhash_salts(nh)
    )
    simhash40 = (
        "list_reduce(list_concat([0::BIGINT], list_transform(range(0, 40), i -> "
        "CASE WHEN 2 * list_sum(list_transform(wh, h -> (h >> i) & 1)) > len(wh) "
        "THEN (1::BIGINT << i) ELSE 0::BIGINT END)), (a, b) -> a | b)"
    )
    q = rf"""
    WITH words AS (
      SELECT doc_id,
             list_transform(string_split_regex(lower(text), '\s+'),
                            w -> {ph.w40_sql('w')}) AS wh
      FROM documents),
    sh AS (SELECT doc_id, wh,
                  list_distinct(list_transform(range(0, greatest(len(wh)-{k},0)+1),
                                               i -> {shingle})) AS shs
           FROM words)
    SELECT doc_id, [{sig_exprs}] AS sig, {simhash40} AS sh40 FROM sh
    """
    for did, dsig, dsh in con.execute(q).fetchall():
        assert sig[did] == list(dsig), did
        assert sims[did] == dsh, did


def test_lsh_topk_deterministic_recovers_planted_neighbor(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    dim = 16
    q = rng.standard_normal(dim)
    rows = [(0, (q + rng.standard_normal(dim) * 0.01).tolist())]  # planted near-dup
    for i in range(1, 60):
        rows.append((i, rng.standard_normal(dim).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.lsh_topk_deterministic(df, q.tolist(), k=5, bits=8, bands=4).collect()
    assert out and out[0].vec_id == 0 and out[0].cos_sim > 0.99


def test_lsh_deterministic_buckets_equal_duckdb(spark):
    """Bucket membership (the approximation-defining decision) is identical
    across engines under floor-quantized integer dots."""
    import math

    import numpy as np

    rng = np.random.default_rng(5)
    dim, bits = 8, 6
    rows = [(i, rng.standard_normal(dim).astype(np.float32).tolist()) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    planes = [ph.rademacher(f"annlsh:p{p}", dim) for p in range(bits)]

    vec = F.transform("embedding", lambda x: x.cast("double"))
    vq = F.transform(vec, lambda x: F.floor(x * 1_000_000).cast("long"))
    d = df.withColumn("_vq", vq)
    sig = F.lit(0).cast("long")
    for p in range(bits):
        w = F.array(*[F.lit(int(x)).cast("long") for x in planes[p]])
        dot = F.aggregate(
            F.zip_with(F.col("_vq"), w, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda a, b: a + b,
        )
        sig = sig + F.when(dot > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
    spark_sigs = {r.vec_id: r.s for r in d.select("vec_id", sig.alias("s")).collect()}

    for i, emb in rows:
        vq_py = [math.floor(float(v) * 1_000_000) for v in emb]
        s = 0
        for p in range(bits):
            if sum(a * b for a, b in zip(vq_py, planes[p])) > 0:
                s |= 1 << p
        assert spark_sigs[i] == s, i

    con = duckdb.connect()
    con.register("embeddings", df.toPandas())
    sig_terms = " + ".join(
        f"(CASE WHEN list_sum(list_transform(range(1, {dim} + 1), "
        f"i -> vq[i] * ({planes[p]}::BIGINT[])[i])) > 0 "
        f"THEN {1 << p}::BIGINT ELSE 0::BIGINT END)"
        for p in range(bits)
    )
    duck = dict(
        con.execute(
            f"""
        SELECT vec_id, ({sig_terms}) AS sig
        FROM (SELECT vec_id, list_transform(embedding,
                     x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS vq
              FROM embeddings)
        """
        ).fetchall()
    )
    assert duck == spark_sigs
