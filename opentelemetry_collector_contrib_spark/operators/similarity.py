"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — pure Column math (zip_with/aggregate),
JVM-side, no UDF; one pass over the table per query vector.

Scale path: random-hyperplane LSH (a.k.a. SimHash for vectors) bucketing —
each vector hashes to a small signature; candidates share a bucket in at
least one band. Turns O(n) per query into an equi-join probe, and
all-pairs search into a bucket-local join, exactly like minhash LSH for
text (operators/dedup.py). An IVF variant (k-means coarse quantizer) would
slot in the same way; the hyperplane scheme avoids an iterative training
job while keeping the bucket-join shape.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def cosine(a: Column, b: Column) -> Column:
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, v: s + v))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda s, v: s + v))
    return dot / (na * nb)


def hyperplane_signature_udf(dim: int | None, bits: int = 16, seed: int = 7):
    """Vectorized (Arrow) signature: one numpy matmul per batch.

    sign(V @ P.T) packed into a long — identical bit convention to
    ``hyperplane_signature`` (bit_i = 1 iff v·h_i > 0), but the per-row cost
    is a BLAS row in a (B×dim)@(dim×bits) product instead of ``bits``
    interpreted HOF aggregates (each of which also re-evaluates the cast
    subtree — no CSE inside HOF lambdas). Measured ~10× on the LSH pair
    queries. This is the input_hint's sanctioned slow-path: Arrow-batched
    pandas UDF, never per-row Python.

    ``dim=None`` defers plane generation to the first batch (r6): the planes
    depend only on (seed, bits, dim), so deriving dim from the data instead
    of a driver-side ``.first()`` removes one job per query while producing
    the identical matrix.
    """
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((bits, dim)) if dim is not None else None
    weights = (1 << np.arange(bits, dtype=np.int64))

    @pandas_udf("long")
    def sig(emb: pd.Series) -> pd.Series:
        nonlocal planes
        m = np.stack(emb.to_numpy()).astype(np.float64)
        if planes is None:
            planes = np.random.default_rng(seed).standard_normal((bits, m.shape[1]))
        bitsm = (m @ planes.T) > 0
        return pd.Series((bitsm * weights).sum(axis=1).astype(np.int64))

    return sig


def cosine_udf():
    """Vectorized pairwise cosine over two array columns (Arrow batch)."""

    @pandas_udf("double")
    def cos(a: pd.Series, b: pd.Series) -> pd.Series:
        ma = np.stack(a.to_numpy()).astype(np.float64)
        mb = np.stack(b.to_numpy()).astype(np.float64)
        dot = np.einsum("ij,ij->i", ma, mb)
        return pd.Series(dot / (np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)))

    return cos


def brute_force_topk(
    df: DataFrame, query: list[float], k: int = 10, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Exact cosine top-k for one query vector. Scan + per-partition top-k
    (Spark's TakeOrderedAndProject keeps only k rows per partition — no full
    sort, no shuffle of the table)."""
    qcol = F.array(*[F.lit(float(v)) for v in query])
    vec = F.transform(vec_col, lambda x: x.cast("double"))
    return (
        df.select(id_col, cosine(vec, qcol).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), id_col)
        .limit(k)
    )


def hyperplane_signature(
    vec_col: Column, dim: int, bits: int = 16, seed: int = 7
) -> Column:
    """Random-hyperplane LSH signature as an int: bit_i = sign(v · h_i).

    Hyperplanes are driver-side constants (seeded) — the per-row work is
    ``bits`` dot products, all Column math inside codegen.
    """
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((bits, dim))
    sig = F.lit(0).cast("long")
    for i in range(bits):
        h = F.array(*[F.lit(float(x)) for x in planes[i]])
        dot = F.aggregate(F.zip_with(vec_col, h, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)
        sig = sig + F.when(dot > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return sig


def lsh_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 12,
    bands: int = 3,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: probe only vectors sharing ≥1 LSH band with the
    query. At 10^12 scale the signature column is precomputed/persisted and
    partition-pruned; here it's computed inline. Recall rises with bands.
    """
    dim = len(query)
    vec = F.transform(vec_col, lambda x: x.cast("double"))
    band_bits = bits // bands
    mask = (1 << band_bits) - 1

    sig = hyperplane_signature_udf(dim, bits, seed)
    df = df.withColumn("_v", vec).withColumn("_sig", sig(F.col("_v")))

    # query signature computed driver-side with the same planes
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((bits, dim))
    q = np.array(query, dtype=np.float64)
    qsig = 0
    for i in range(bits):
        if planes[i].dot(q) > 0:
            qsig |= 1 << i
    cond = None
    for b in range(bands):
        shift = b * band_bits
        band_eq = (F.shiftrightunsigned(F.col("_sig"), shift).bitwiseAND(F.lit(mask))) == ((qsig >> shift) & mask)
        cond = band_eq if cond is None else (cond | band_eq)

    qcol = F.array(*[F.lit(float(v)) for v in query])
    return (
        df.filter(cond)
        .select(id_col, cosine(vec, qcol).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), id_col)
        .limit(k)
    )


def lsh_topk_deterministic(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 12,
    bands: int = 4,
    tag: str = "annlsh",
    scale: int = 1_000_000,
) -> DataFrame:
    """Hyperplane-LSH top-k with engine-portable bucket assignment.

    Same probe shape as ``lsh_topk`` (share ≥1 band with the query → exact
    cosine on survivors), but the hyperplanes are deterministic Rademacher
    (±1) vectors derived from ``functions/portable_hash.rademacher`` and the
    per-plane dot products run over FLOOR-QUANTIZED integer components
    (``floor(double(v) * scale)``). Integer sums are exact in any engine and
    any summation order, so bucket membership — the one approximation-
    defining decision — is bit-for-bit reproducible in DuckDB SQL: this is
    the variant the correctness oracle pins. Column-only (no Python worker);
    the numpy/BLAS ``lsh_topk`` stays the throughput path for wide ``bits``.
    """
    from ..functions import portable_hash as ph

    dim = len(query)
    planes = [ph.rademacher(f"{tag}:p{p}", dim) for p in range(bits)]
    pm = np.array(planes, dtype=np.int64)  # (bits, dim) of ±1
    weights = 1 << np.arange(bits, dtype=np.int64)

    # signature via ONE integer numpy matmul per Arrow batch: float64
    # quantize (floor(v·scale)) then int64 dot products — integer sums are
    # exact in any order, so the result is BIT-IDENTICAL to the per-element
    # Column/SQL formulation the oracle uses, at BLAS speed rather than
    # interpreted-HOF speed (measured ~9× on the sf0.1 row).
    @pandas_udf("long")
    def sig_udf(emb: pd.Series) -> pd.Series:
        m = np.stack(emb.to_numpy()).astype(np.float64)
        q = np.floor(m * scale).astype(np.int64)
        bitsm = (q @ pm.T) > 0
        return pd.Series((bitsm * weights).sum(axis=1))

    df = df.withColumn("_sig", sig_udf(F.col(vec_col)))

    import math

    qint = [math.floor(float(v) * scale) for v in query]
    qsig = 0
    for p in range(bits):
        if sum(a * b for a, b in zip(qint, planes[p])) > 0:
            qsig |= 1 << p

    band_bits = bits // bands
    mask = (1 << band_bits) - 1
    cond = None
    for b in range(bands):
        shift = b * band_bits
        band_eq = (
            F.shiftrightunsigned(F.col("_sig"), shift).bitwiseAND(F.lit(mask))
        ) == ((qsig >> shift) & mask)
        cond = band_eq if cond is None else (cond | band_eq)

    qcol = F.array(*[F.lit(float(v)) for v in query])
    vecd = F.transform(vec_col, lambda x: x.cast("double"))
    return (
        df.filter(cond)
        .select(id_col, cosine(vecd, qcol).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), id_col)
        .limit(k)
    )


def train_ivf_centroids(
    df: DataFrame,
    k: int = 16,
    vec_col: str = "embedding",
    sample_rows: int = 2048,
    iters: int = 10,
    seed: int = 7,
):
    """IVF coarse quantizer: k-means on a bounded driver-side sample.

    The sample is capped (``sample_rows``) so driver memory stays constant
    regardless of table size — at 10^12 rows you train on a fixed sample and
    broadcast the centroids, exactly the FAISS IVF recipe. Deterministic:
    seeded init, fixed iteration count. Returns a (k, dim) numpy array of
    L2-normalized centroids.
    """
    sample = np.array(
        [r[0] for r in df.select(vec_col).limit(sample_rows).collect()],
        dtype=np.float64,
    )
    sample /= np.linalg.norm(sample, axis=1, keepdims=True).clip(min=1e-12)
    rng = np.random.default_rng(seed)
    cent = sample[rng.choice(len(sample), size=min(k, len(sample)), replace=False)]
    for _ in range(iters):
        sims = sample @ cent.T  # cosine on normalized vectors
        assign = sims.argmax(axis=1)
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cent[c] = m / max(np.linalg.norm(m), 1e-12)
    return cent


def ivf_assign_udf(centroids):
    """Nearest-centroid assignment — one numpy matmul per Arrow batch."""
    cent = np.asarray(centroids, dtype=np.float64)

    @pandas_udf("int")
    def assign(emb: pd.Series) -> pd.Series:
        m = np.stack(emb.to_numpy()).astype(np.float64)
        m /= np.linalg.norm(m, axis=1, keepdims=True).clip(min=1e-12)
        return pd.Series((m @ cent.T).argmax(axis=1).astype(np.int32))

    return assign


def ivf_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 7,
    centroids=None,
) -> DataFrame:
    """IVF approximate top-k: probe only the ``n_probe`` inverted lists
    whose centroids are nearest the query.

    The alternative scale path to hyperplane LSH (``lsh_topk``): centroids
    come from a bounded k-means (``train_ivf_centroids``); each vector
    carries a centroid id (at 10^12 scale: precomputed and used as a
    PARTITION column, so the probe is partition pruning, not a filter);
    query time scans ~n_probe/n_centroids of the data then exact-cosines the
    survivors. Recall rises with n_probe; n_probe == n_centroids is exact.
    """
    if centroids is None:
        centroids = train_ivf_centroids(df, n_centroids, vec_col, seed=seed)
    q = np.asarray(query, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probe = np.argsort(-(centroids @ qn))[:n_probe].tolist()
    assign = ivf_assign_udf(centroids)
    cand = df.withColumn("_list", assign(F.col(vec_col))).filter(
        F.col("_list").isin(probe)
    )
    qcol = F.array(*[F.lit(float(v)) for v in query])
    vec = F.transform(vec_col, lambda x: x.cast("double"))
    return (
        cand.select(id_col, cosine(vec, qcol).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), id_col)
        .limit(k)
    )


def all_pairs_above(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 60,
    bands: int = 4,
    seed: int = 7,
    max_bucket_size: int = 500,
) -> DataFrame:
    """Embedding near-duplicate pairs: LSH band bucket join → exact cosine
    verify. Same shape as minhash_lsh_pairs (slim keys in the join, hot
    buckets capped, vectors re-attached by id for the verify).

    Default geometry is 4 bands × 15 bits: 32k buckets per band keeps the
    candidate set near the true-pair count instead of quadratic (2-bit
    bands = 4 buckets put ~half of all pairs through the cosine verify).
    Identical duplicates share every band at ANY width; near-dup recall
    per band is (1-θ/π)^band_bits — pick fewer bits for fuzzy-recall
    corpora, more for dedup of exact/near-exact copies."""
    vec = F.transform(vec_col, lambda x: x.cast("double"))
    # dim is inferred from the first Arrow batch inside the UDF (same seeded
    # matrix) — no driver-side .first() job per query.
    sig = hyperplane_signature_udf(None, bits, seed)
    base = df.select(F.col(id_col).alias("id"), vec.alias("v")).withColumn(
        "_sig", sig(F.col("v"))
    )
    # base is referenced 3x (banding + both verify sides) and its signature
    # column is an Arrow-UDF matmul — persist so the embedding scan + UDF
    # run once, exactly as lsh_pairs_from_signatures does for minhash.
    from pyspark import StorageLevel

    base = base.persist(StorageLevel.MEMORY_AND_DISK)
    band_bits = bits // bands
    mask = (1 << band_bits) - 1
    banded = base.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("_sig"), b * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bh")
    # r6: one collect_list aggregation + in-array pair generation replaces
    # the [bucket-count agg + filter-join + bucket self-join] form — same
    # pair set, one Exchange of the slim membership rows instead of three
    # (see dedup._bucket_pairs).
    from .dedup import _bucket_pairs

    pairs = _bucket_pairs(banded, "band", "bh", max_bucket_size=max_bucket_size)
    va = base.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"))
    vb = base.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"))
    out = pairs.join(va, "id_a").join(vb, "id_b")
    cos = cosine_udf()
    return (
        out.withColumn("cos_sim", cos(F.col("v_a"), F.col("v_b")))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", F.round("cos_sim", 4).alias("cos_sim"))
    )
