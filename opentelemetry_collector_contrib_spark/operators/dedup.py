"""Deduplication — logdedup parity plus the training-data dedup family.

``log_dedup`` rebuilds ``processor/logdedupprocessor`` exactly; the rest
(exact / minhash-LSH / simhash / n-gram Jaccard) are the large-scale
training-pipeline operators the reference lacks, built scale-first:
candidate generation is always a band/bucket equi-join (shuffle on short
keys), never an O(n²) cross join.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import portable_hash as ph


def log_dedup(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "observed_timestamp",
    interval: str = "10 seconds",
) -> DataFrame:
    """Aggregate duplicate records over a tumbling interval.

    Reference: ``processor/logdedupprocessor/processor.go:163-301``,
    ``counter.go:19-75,160-180`` — key = record minus excluded fields; emits
    one record per key per interval with ``log_count`` and
    first/last_observed_timestamp.
    """
    return (
        df.groupBy(F.window(F.col(ts_col), interval).alias("w"), *key_cols)
        .agg(
            F.count(F.lit(1)).alias("log_count"),
            F.min(ts_col).alias("first_observed_timestamp"),
            F.max(ts_col).alias("last_observed_timestamp"),
        )
        .withColumn("window_start", F.col("w.start"))
        .drop("w")
    )


# --------------------------------------------------------------------------
# Training-data dedup family (beyond the reference; first-class per brief)
# --------------------------------------------------------------------------

def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: keep the lowest-id row per content hash.

    Hash-groupBy on xxhash64(text) — one shuffle on an 8-byte key, not the
    document bodies (map-side partial min keeps shuffle tiny).
    """
    h = F.xxhash64(F.col(text_col))
    return (
        df.withColumn("_h", h)
        .withColumn("_rn", F.row_number().over(Window.partitionBy("_h").orderBy(id_col)))
        .filter(F.col("_rn") == 1)
        .drop("_h", "_rn")
    )


def shingles(col: Column, k: int = 5) -> Column:
    """Word k-shingles of a text column as array<string> (distinct)."""
    words = F.split(F.lower(col), r"\s+")
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, k)))
    )


def shingle_hash_frame(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 5,
    hash_fn: str = "xxhash64", keep_word_hashes: bool = False,
) -> DataFrame:
    """(id, hs[, wh]): distinct word k-shingle HASHES as array<long> — no
    shingle strings ever materialize. ``keep_word_hashes=True`` also carries
    the per-word hash array (column ``wh``) so callers can derive SimHash /
    other word-level features from the SAME scan instead of re-tokenizing.

    Each word is hashed once (xxhash64); adjacent word-hashes combine into a
    shingle hash with one k-ary xxhash64 per position — O(1) string work per
    word instead of O(k) string copying per position (slice+concat_ws builds
    every shingle string; at ~200 words/doc that dominates minhash cost).
    The word-hash array is materialized as a REAL column before the indexed
    lambda: an inline subtree referenced k times inside a HOF lambda is
    re-evaluated per reference (no CSE in interpreted HOFs — measured 4×
    slowdown), while a bound column reference is an O(1) row-field read.
    Hash-set equality stands in for shingle-set equality (64-bit collisions
    negligible at any realistic corpus size).

    ``hash_fn="portable"`` swaps both hash layers for the engine-portable
    40-bit family (``functions/portable_hash.py``): word hash = md5-derived
    w40, shingle hash = mix40(polynomial fold of the k word hashes). Same
    plan shape and cost class; the output is bit-for-bit reproducible in
    DuckDB SQL, which is what gives the minhash catalog row its oracle.
    """
    if hash_fn == "portable":
        wh = F.transform(F.split(F.lower(F.col(text_col)), r"\s+"), ph.w40_col)
        d = df.select(F.col(id_col).alias("id"), wh.alias("_wh"))
        n = F.size("_wh")
        idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
        hs = F.array_distinct(
            F.transform(
                idx,
                lambda i: ph.mix40_col(ph.polyfold40_col(F.slice(F.col("_wh"), i + 1, k))),
            )
        )
    else:
        wh = F.transform(
            F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: F.xxhash64(w)
        )
        d = df.select(F.col(id_col).alias("id"), wh.alias("_wh"))
        n = F.size("_wh")
        idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
        hs = F.array_distinct(
            F.transform(idx, lambda i: F.xxhash64(*[F.get(F.col("_wh"), i + j) for j in range(k)]))
        )
    if keep_word_hashes:
        return d.select("id", hs.alias("hs"), F.col("_wh").alias("wh"))
    return d.select("id", hs.alias("hs"))


def minhash_salts(num_hashes: int, seed: int = 1) -> list[tuple[int, int]]:
    """Deterministic (a, b) coefficient pairs for the portable signature's
    affine permutation family — plain integer literals both Spark and
    DuckDB SQL embed verbatim. ``a`` is odd and < 2^22 so ``a*x`` stays
    under 2^62 (ANSI-safe) while ``(a*x + b) mod 2^40`` remains a BIJECTION
    on Z_2^40 (odd multiplier) — i.e. each hash function is a genuine
    permutation, the textbook minhash construction."""
    out = []
    for i in range(num_hashes):
        a = (ph.salt40(f"mha{seed}:{i}") & ((1 << 22) - 1)) | 1
        b = ph.salt40(f"mhb{seed}:{i}")
        out.append((a, b))
    return out


def minhash_signature_from_hashes(
    hash_col: Column, num_hashes: int = 64, seed: int = 1, hash_fn: str = "xxhash64"
) -> Column:
    """MinHash signature as array<long> from pre-hashed shingles (array<long>).

    The i-th hash function is xxhash64(h, seed+i) over the 8-byte shingle
    hash — each variable-length shingle STRING is hashed exactly once
    upstream; the 64 rehashes run over fixed 8-byte longs (~4× cheaper than
    re-hashing the string per function). Pure Column expressions, JVM-side.

    ``hash_fn="portable"``: the i-th function is the affine permutation
    ``(a_i·h + b_i) mod 2^40`` over portable 40-bit shingle hashes — same
    min-over-set structure, DuckDB-reproducible output (the oracle embeds
    the identical (a, b) literals). Three arithmetic ops per element keeps
    the interpreted-HOF cost in the same class as the xxhash64 intrinsic
    (the first portable cut ran a 15-op mixer per element — measured 6×
    slower on the sf0.1 row).
    """
    if hash_fn == "portable":
        # NB: bind coefficients via a factory, NOT default args —
        # F.transform passes (element, index) to 2-parameter lambdas,
        # silently shadowing default-arg bindings with the array index.
        def _fn(a, b):
            return lambda h: (h * F.lit(a) + F.lit(b)).bitwiseAND(F.lit(ph.MASK40))

        return F.array(
            *[
                F.array_min(F.transform(hash_col, _fn(a, b)))
                for a, b in minhash_salts(num_hashes, seed)
            ]
        )
    return F.array(
        *[
            F.array_min(F.transform(hash_col, lambda h: F.xxhash64(h, F.lit(seed + i))))
            for i in range(num_hashes)
        ]
    )


def minhash_signature(shingle_col: Column, num_hashes: int = 64, seed: int = 1) -> Column:
    """MinHash signature from raw shingle strings (convenience form).

    Prefer hashing the shingles into a column first and calling
    ``minhash_signature_from_hashes`` — referenced inline, the string-hash
    subtree is evaluated per hash function (no CSE across array elements).
    """
    return minhash_signature_from_hashes(
        F.transform(shingle_col, lambda s: F.xxhash64(s)), num_hashes, seed
    )


def portable_minhash_sig_udf(num_hashes: int = 64, seed: int = 1):
    """Vectorized portable-minhash signature: array<long> shingle hashes →
    array<long> signature, via ONE numpy broadcast per Arrow batch —
    (a[:,None]·hs[None,:] + b[:,None]) & MASK, min over shingles.
    int64 intermediates stay < 2^62 (a < 2^22, hs < 2^40) so this is
    BIT-IDENTICAL to the Column/SQL formulation the DuckDB oracle pins —
    just evaluated at numpy speed instead of interpreted-HOF speed."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ab = np.array(minhash_salts(num_hashes, seed), dtype=np.int64)
    av, bv = ab[:, 0:1], ab[:, 1:2]

    # no type hints: `from __future__ import annotations` stringifies
    # them and the resolver can't see the function-local pandas import
    @pandas_udf("array<long>")
    def sig_udf(col):
        out = []
        for hsv in col:
            h = np.asarray(hsv, dtype=np.int64)[None, :]
            out.append(((av * h + bv) & ph.MASK40).min(axis=1))
        return pd.Series(out)

    return sig_udf


def portable_minhash_sig_simhash_udf(num_hashes: int = 64, seed: int = 1, bits: int = 40):
    """Fused portable signature + simhash vote in ONE vectorized pass:
    (array<long> shingle hashes, array<long> word hashes) →
    struct<sig:array<long>, sh:long>. Same numpy broadcast as
    ``portable_minhash_sig_udf`` for the signature; the simhash bit vote
    ((wh >> i) & 1 counts, bit set iff 2·count > n) replaces the r5
    interpreted-HOF aggregate (bits × n_words lambda evaluations per row —
    measured the dominant minhash-row cost at sf1). Bit-identical to the
    Column/SQL formulation the DuckDB oracle pins: int64 intermediates stay
    < 2^62 and the vote is exact integer math."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ab = np.array(minhash_salts(num_hashes, seed), dtype=np.int64)
    av, bv = ab[:, 0:1], ab[:, 1:2]
    shifts = np.arange(bits, dtype=np.int64)

    @pandas_udf("struct<sig:array<long>, sh:long>")
    def sig_sh_udf(hs_col, wh_col):
        sigs: list = []
        shs: list = []
        for hsv, whv in zip(hs_col, wh_col):
            if hsv is None or whv is None:
                sigs.append(None)
                shs.append(None)
                continue
            h = np.asarray(hsv, dtype=np.int64)[None, :]
            sigs.append(((av * h + bv) & ph.MASK40).min(axis=1))
            w = np.asarray(whv, dtype=np.int64)
            cnt = ((w[:, None] >> shifts) & 1).sum(axis=0)
            bitvec = (2 * cnt > len(w)).astype(np.int64)
            shs.append(int((bitvec << shifts).sum()))
        return pd.DataFrame({"sig": sigs, "sh": shs})

    return sig_sh_udf


def portable_minhash_features_udf(
    k: int = 5, num_hashes: int = 64, seed: int = 1, bits: int = 40
):
    """Whole portable-minhash feature step in ONE flat-vectorized Arrow
    pass: array<string> words → struct<sig:array<long>, sh:long>.

    Replaces the r5 chain (per-word md5 Column, per-position interpreted
    polyfold/mix40 HOF — measured ~4.5 s alone at sf1) with numpy over the
    batch's FLATTENED word stream: md5 runs once per distinct word
    (pd.factorize + a memo dict — vocabulary-bounded), the k-step
    polynomial fold and mix40 run as whole-array int64 vector ops, per-row
    signature minima via minimum.reduceat, and the simhash bit vote via
    add.reduceat per bit. Every operation is the same masked int64
    arithmetic as the Column/SQL forms (products < 2^63 — no overflow), so
    the output is BIT-IDENTICAL to the formulation the DuckDB oracle pins;
    equality against the Column path is pinned in tests. Shingle
    de-duplication is skipped on purpose: the signature is a min over the
    shingle multiset and duplicates cannot change a min.

    Rows shorter than k words (single truncated window) and empty rows
    take a tiny per-row Python path; null rows yield null."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ab = np.array(minhash_salts(num_hashes, seed), dtype=np.int64)
    av, bv = ab[:, 0], ab[:, 1]
    shifts = np.arange(bits, dtype=np.int64)
    memo: dict = {}

    def _w40_many(uniques) -> np.ndarray:
        out = np.empty(len(uniques), dtype=np.int64)
        for i, u in enumerate(uniques):
            v = memo.get(u)
            if v is None:
                v = ph.w40_py(u)
                if len(memo) < 2_000_000:  # vocabulary cap, never evicts
                    memo[u] = v
            out[i] = v
        return out

    def _mix40_vec(h: np.ndarray) -> np.ndarray:
        h = h & ph.MASK40
        for m, s in zip((ph.M1, ph.M2, ph.M3), ph.SHIFTS):
            h = (h * m) & ph.MASK40
            h = h ^ (h >> s)
        return h

    @pandas_udf("struct<sig:array<long>, sh:long>")
    def feats_udf(col):
        vals = col.to_numpy()
        null_mask = np.array([v is None for v in vals])
        rows = [np.asarray(v, dtype=object) for v in vals[~null_mask]]
        R = len(rows)
        # null words row: the Column form yields a signature ARRAY of nulls
        # (array of per-function array_min(null)) and a null simhash
        sig_out: list = [[None] * num_hashes] * len(vals)
        sh_out: list = [None] * len(vals)
        live_idx = np.flatnonzero(~null_mask)
        if R:
            lens = np.fromiter((len(r) for r in rows), dtype=np.int64, count=R)
            flat = (
                np.concatenate(rows) if lens.sum() else np.empty(0, dtype=object)
            )
            codes, uniques = pd.factorize(flat)
            W = _w40_many(uniques)[codes] if len(uniques) else np.empty(0, np.int64)
            starts = np.zeros(R + 1, dtype=np.int64)
            np.cumsum(lens, out=starts[1:])
            # --- full k-windows, flat: acc_p = polyfold(W[p..p+k-1]) ------
            N = len(W)
            Wpad = np.concatenate([W, np.zeros(k, dtype=np.int64)])
            acc = np.zeros(N, dtype=np.int64)
            for j in range(k):
                acc = (((acc * ph.MPOLY) & ph.MASK40) + Wpad[j : j + N]) & ph.MASK40
            rowid = np.repeat(np.arange(R), lens)
            pos = np.arange(N, dtype=np.int64)
            valid = pos + k <= starts[rowid + 1]  # window stays inside its row
            hs = _mix40_vec(acc[valid])
            n_win = np.maximum(lens - k + 1, 0)  # full windows per row
            hs_starts = np.zeros(R + 1, dtype=np.int64)
            np.cumsum(n_win, out=hs_starts[1:])
            # --- signatures: 40-bit affine permutation minima -------------
            sigs = np.empty((R, num_hashes), dtype=np.int64)
            full = n_win > 0
            if full.any():
                seg = hs_starts[:-1][full]
                for j in range(num_hashes):
                    vj = (av[j] * hs + bv[j]) & ph.MASK40
                    sigs[full, j] = np.minimum.reduceat(vj, seg)
            for i in np.flatnonzero(~full):  # rows shorter than k words
                wrow = W[starts[i] : starts[i + 1]]
                h = _mix40_vec(np.array([ph.polyfold40_py(wrow)], dtype=np.int64))
                sigs[i] = (av * h[0] + bv) & ph.MASK40
            # --- simhash: per-bit majority vote over word hashes ----------
            cnts = np.zeros((R, bits), dtype=np.int64)
            nonempty = lens > 0
            if nonempty.any():
                seg = starts[:-1][nonempty]
                for i in range(bits):
                    cnts[nonempty, i] = np.add.reduceat((W >> i) & 1, seg)
            sh = ((2 * cnts > lens[:, None]).astype(np.int64) << shifts).sum(axis=1)
            for r, gi in enumerate(live_idx):
                sig_out[gi] = sigs[r]
                sh_out[gi] = int(sh[r])
        return pd.DataFrame({"sig": sig_out, "sh": sh_out})

    return feats_udf


def minhash_signature_frame(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    k_shingle: int = 5,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, sig): one MinHash signature row per document.

    The signature TABLE is the natural materialization point of an LSH
    dedup pipeline (compute once, band-join many): downstream
    ``lsh_pairs_from_signatures`` references it three times (banding +
    both verify sides) and persists it, so the text scan + hashing run
    exactly once per job instead of once per reference.
    """
    # materialize shingles as a real column BEFORE the signature: the
    # signature references it num_hashes times, and Spark does no CSE across
    # those references — inline, the shingle build would run 32×/row.
    hs = shingle_hash_frame(df, text_col, id_col, k_shingle, hash_fn=hash_fn)
    if hash_fn == "portable":
        return hs.select("id", portable_minhash_sig_udf(num_hashes)(F.col("hs")).alias("sig"))
    return hs.select(
        "id",
        minhash_signature_from_hashes(F.col("hs"), num_hashes, hash_fn=hash_fn).alias("sig"),
    )


def lsh_pairs_from_signatures(
    base: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.7,
    max_bucket_size: int = 200,
    hash_fn: str = "xxhash64",
    persist: bool = True,
    carry: dict | None = None,
) -> DataFrame:
    """LSH banding + verify over a prebuilt (id, sig, *extra) signature frame.

    ``base`` is referenced three times (band explode, verify side A, verify
    side B), so it is persisted (MEMORY_AND_DISK) unless already persisted or
    ``persist=False`` — at 8·num_hashes + ~8 bytes/row the signature table is
    far smaller than the corpus it summarizes, and recomputing the text scan
    + hash pipeline 3× measured ~3× the whole job's wall at sf0.1. Extra
    columns on ``base`` ride along in the cache so callers can join
    per-doc features (e.g. simhash) from the same materialization;
    lifecycle belongs to the caller (Spark evicts LRU).

    ``carry`` maps extra ``base`` columns to their (side-a, side-b) output
    names: the verify id-joins already re-attach ``base`` to each pair, so a
    per-doc feature rides those joins instead of costing the caller two more.
    """
    rows_per_band = num_hashes // bands
    if persist and not (base.storageLevel.useMemory or base.storageLevel.useDisk):
        from pyspark import StorageLevel

        base = base.persist(StorageLevel.MEMORY_AND_DISK)
    if hash_fn == "portable":
        def band_hash(b):
            return ph.mix40_col(
                ph.polyfold40_col(F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band))
            )
    else:
        def band_hash(b):
            return F.xxhash64(
                F.concat_ws(
                    ",",
                    *[
                        F.element_at("sig", b * rows_per_band + r + 1).cast("string")
                        for r in range(rows_per_band)
                    ],
                )
            )
    banded = base.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), band_hash(b).alias("bh"))
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bh")
    # One aggregation replaces [bucket-count agg + filter-join + bucket
    # self-join] (guide §2.4): collect the member ids per bucket, drop hot
    # buckets by array size (same ≤ max_bucket_size rule — singleton buckets
    # produce no pairs either way), and generate the i<j pairs INSIDE the
    # sorted array. The pair set is identical; the banded rows cross the
    # network once instead of three times, and the whole candidate step is
    # one Exchange instead of three plus a join.
    pairs = _bucket_pairs(banded, "band", "bh", max_bucket_size=max_bucket_size)
    sig_a = base.select(
        F.col("id").alias("id_a"), F.col("sig").alias("sig_a"),
        *[F.col(c).alias(a) for c, (a, _) in (carry or {}).items()],
    )
    sig_b = base.select(
        F.col("id").alias("id_b"), F.col("sig").alias("sig_b"),
        *[F.col(c).alias(b) for c, (_, b) in (carry or {}).items()],
    )
    pairs = pairs.join(sig_a, "id_a").join(sig_b, "id_b")
    est = (
        F.aggregate(
            F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
            F.lit(0),
            lambda acc, v: acc + v,
        )
        / F.lit(num_hashes)
    )
    extra = [n for pair in (carry or {}).values() for n in pair]
    return (
        pairs.withColumn("jaccard_est", est)
        .filter(F.col("jaccard_est") >= jaccard_threshold)
        .select("id_a", "id_b", F.round("jaccard_est", 4).alias("jaccard_est"), *extra)
    )


def _bucket_pairs(
    banded: DataFrame, *bucket_cols: str, max_bucket_size: int, id_col: str = "id"
) -> DataFrame:
    """Distinct (id_a < id_b) candidate pairs from bucket-membership rows.

    ``collect_list`` per bucket + in-array pair generation: one shuffle of
    the slim membership rows, versus the agg + filter-join + self-join form
    which moves them three times. Buckets above ``max_bucket_size`` are
    dropped whole (the standard LSH hot-bucket guard — a B-member bucket
    yields B²/2 pairs), so the generated array is bounded at
    max_bucket_size²/2 structs per bucket row.
    """
    buckets = (
        banded.groupBy(*bucket_cols)
        .agg(F.array_sort(F.collect_list(id_col)).alias("_ids"))
        .filter((F.size("_ids") >= 2) & (F.size("_ids") <= max_bucket_size))
    )
    ids = F.col("_ids")
    pair_structs = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + F.lit(2), F.size(ids)),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    return (
        buckets.select(F.explode(pair_structs).alias("_p"))
        .select("_p.id_a", "_p.id_b")
        .dropDuplicates(["id_a", "id_b"])
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    k_shingle: int = 5,
    jaccard_threshold: float = 0.7,
    max_bucket_size: int = 200,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Near-duplicate candidate pairs via MinHash + LSH banding.

    Scale path, in order:
      1. signature per doc (``minhash_signature_frame`` — Column/Arrow only),
         persisted: the table is referenced 3× downstream,
      2. explode into ``bands`` slim (id, band, band_hash) rows — signatures
         are NOT carried into the join (the shuffle moves 24 bytes/row, not
         the 8*num_hashes-byte signature),
      3. drop pathological buckets (> ``max_bucket_size`` members): a bucket
         of B docs yields B²/2 pairs; beyond the cap the members are near
         identical and the surviving pairs re-surface via other bands or the
         exact-dedup pass. Standard LSH skew guard — without it one hot
         bucket is quadratic,
      4. self-equi-join per bucket → distinct candidate pairs,
      5. re-attach both signatures by id join and verify estimated Jaccard.
    No cross join ever materializes. Returns (id_a, id_b, jaccard_est).
    """
    base = minhash_signature_frame(df, text_col, id_col, num_hashes, k_shingle, hash_fn)
    return lsh_pairs_from_signatures(
        base, num_hashes, bands, jaccard_threshold, max_bucket_size, hash_fn
    )


def simhash_from_hashes(hashes: Column, bits: int = 64, n: Column | None = None) -> Column:
    """SimHash per-bit majority vote over a prebuilt word-hash array.

    bit_i(sig) = 1 iff 2·count_i > n — identical decisions to the textbook
    ±1 vote (vote = 2·count − n), but ONE aggregate pass instead of ``bits``
    aggregates. Callers that already carry word hashes (e.g.
    ``shingle_hash_frame(keep_word_hashes=True)``) vote over the same array
    the minhash pipeline hashed — no re-tokenization. ``n`` overrides the
    element count: pass it when ``hashes`` is an INLINE hash expression
    (``F.size`` on it would re-run the hashing just to count — no CSE).
    """

    def _masks():
        return [F.lit(1 << i) if i < 63 else F.lit(-(2**63)) for i in range(bits)]

    counts = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), bits),
        lambda acc, h: F.zip_with(
            acc,
            F.array(*[(h.bitwiseAND(m) != 0).cast("int") for m in _masks()]),
            lambda a, b: a + b,
        ),
    )
    if n is None:
        n = F.size(hashes)
    # fold counts→bits→long with `counts` referenced exactly once (HOFs are
    # interpreted, not codegen'd — don't rely on CSE across 64 references)
    mask_arr = F.array(*[m.cast("long") for m in _masks()])
    return F.aggregate(
        F.zip_with(
            counts, mask_arr,
            lambda c, m: F.when(c * 2 > n, m).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda a, b: a.bitwiseOR(b),
    )


def simhash(col: Column, bits: int = 64, hash_fn: str = "xxhash64") -> Column:
    """64-bit SimHash of whitespace tokens, as a long.

    Per-bit majority vote over xxhash64(token): bit_i(sig) = 1 iff
    sum_tokens(±1 by bit_i(hash)) > 0. Expressed with higher-order functions —
    JVM-side. O(bits) aggregate ops per row.

    ``hash_fn="portable"`` votes over the 40-bit md5-derived word hash
    instead (``bits`` must be ≤ 40) — DuckDB-reproducible output.
    """
    if hash_fn == "portable" and bits > 40:
        raise ValueError("portable simhash carries 40 hash bits")
    words = F.split(F.lower(col), r"\s+")
    if hash_fn == "portable":
        hashes = F.transform(words, ph.w40_col)
    else:
        hashes = F.transform(words, lambda w: F.xxhash64(w))
    return simhash_from_hashes(hashes, bits, n=F.size(words))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_grams: int = 200,
    max_gram_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard with PREFIX-FILTERED candidate generation
    (AllPairs/PPJoin family — Bayardo et al., "Scaling Up All Pairs
    Similarity Search", WWW'07).

    Grams are globally ordered by (document frequency, gram) ascending;
    each doc contributes only its PREFIX of ``|g| - ceil(t·|g|) + 1``
    rarest grams to the candidate self-join. Two docs with Jaccard ≥ t
    must share a prefix gram (with the length filter
    ``t·max(|a|,|b|) ≤ min(|a|,|b|)``), so the output is EXACT while
    ubiquitous grams — the B²/2 quadratic blowup — effectively never
    reach the join: candidates form on the rarest grams, which have the
    smallest fan-out. The full gram arrays verify |A∩B|/|A∪B| exactly.

    ``max_grams`` caps the explode fan-out (documented truncation).
    ``max_gram_df`` (optional, default off since prefix filtering removes
    the need) additionally drops grams shared by more docs from candidate
    GENERATION only — a lossy backstop for adversarial corpora where even
    prefixes go hot; the Jaccard verify still uses every gram.
    """
    # explode_outer everywhere a HOF-built array is exploded: plain explode
    # makes InferFiltersFromGenerate push a size(...)>0 filter to the SCAN
    # with the whole shingle tree inlined per array reference — measured 10×
    # the stage cost at sf0.1. The arrays are never empty (the window index
    # is sequence(0, greatest(n-k, 0))), and null text is pre-filtered, so
    # outer ≡ inner here.
    df = df.filter(F.col(text_col).isNotNull())
    base = shingle_hash_frame(df, text_col, id_col, n).select(
        "id", F.slice("hs", 1, max_grams).alias("g")
    )
    # base is referenced three times (gram explode + both verify sides); the
    # shingle build is the expensive part, so materialize it once (guide §5).
    if not (base.storageLevel.useMemory or base.storageLevel.useDisk):
        from pyspark import StorageLevel

        base = base.persist(StorageLevel.MEMORY_AND_DISK)
    # r6 (guide §2.4): document frequency comes from a window count over the
    # gram partitioning instead of a separate aggregate joined back (one
    # Exchange, no join), and ``sz`` rides the exploded rows (8 bytes/row)
    # instead of being re-attached by an id join after the re-group.
    ex = base.select(
        "id", F.size("g").alias("sz"), F.explode_outer("g").alias("gram")
    ).withColumn("_df", F.count(F.lit(1)).over(Window.partitionBy("gram")))
    if max_gram_df is not None:
        ex = ex.filter(F.col("_df") <= max_gram_df)
    # per-doc grams in global (df, gram) ascending order; keep the ORIGINAL
    # gram-set size for the prefix/length math (cap-dropped grams shrink the
    # candidate surface, never the similarity arithmetic)
    ordered = (
        ex.groupBy("id", "sz")
        .agg(F.array_sort(F.collect_list(F.struct("_df", "gram"))).alias("_sg"))
        .withColumn(
            "_prefix",
            F.transform(
                F.slice(
                    "_sg", 1,
                    F.greatest(
                        F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1,
                        F.lit(1),
                    ),
                ),
                lambda s: s["gram"],
            ),
        )
    )
    pex = ordered.select("id", "sz", F.explode_outer("_prefix").alias("gram"))
    # r6 (guide §2.4): candidate generation via collect_list per gram +
    # in-array (i<j) pair expansion — one shuffle of the slim prefix rows
    # instead of agg + self-join; the AllPairs length filter applies to the
    # exploded pairs exactly as it did in the join condition.
    mem = (
        pex.groupBy("gram")
        .agg(F.array_sort(F.collect_list(F.struct("id", "sz"))).alias("_m"))
        .filter(F.size("_m") >= 2)
    )
    m = F.col("_m")
    pair_structs = F.flatten(
        F.transform(
            m,
            lambda x, i: F.transform(
                F.slice(m, i + F.lit(2), F.size(m)),
                lambda y: F.struct(
                    x["id"].alias("id_a"), y["id"].alias("id_b"),
                    x["sz"].alias("sz_a"), y["sz"].alias("sz_b"),
                ),
            ),
        )
    )
    cand = (
        mem.select(F.explode(pair_structs).alias("_p"))
        # length filter: Jaccard ≥ t needs t·max(|a|,|b|) ≤ min(|a|,|b|)
        .filter(
            F.lit(threshold) * F.greatest(F.col("_p.sz_a"), F.col("_p.sz_b"))
            <= F.least(F.col("_p.sz_a"), F.col("_p.sz_b"))
        )
        .select(F.col("_p.id_a").alias("id_a"), F.col("_p.id_b").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    ga = base.select(F.col("id").alias("id_a"), F.col("g").alias("g_a"))
    gb = base.select(F.col("id").alias("id_b"), F.col("g").alias("g_b"))
    joined = cand.join(ga, "id_a").join(gb, "id_b")
    inter = F.size(F.array_intersect("g_a", "g_b"))
    union = F.size(F.array_union("g_a", "g_b"))
    return (
        joined.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )


def benchmark_contamination(
    train_df: DataFrame,
    bench_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    n: int = 8,
    min_overlap: float = 0.5,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Training-set decontamination: per-doc fraction of word n-grams that
    appear ANYWHERE in a benchmark/eval corpus (the published n-gram-overlap
    method — e.g. GPT-3's 13-gram filtering, Brown et al. 2020 appendix C).

    Returns (id_col, n_grams, n_hit, overlap, contaminated) for every
    training doc; filter on ``contaminated`` to drop, or keep the overlap
    score for audit. Gram comparison uses the same 64-bit shingle hashes as
    the dedup family (no gram strings materialize).

    Scale shape: the benchmark gram set is DISTINCT hashes only (8 bytes per
    unique gram — a 100k-doc eval suite is a few MB) and broadcasts, so the
    100 TB training side does one narrow explode + broadcast-hash semi-join +
    per-doc count: no shuffle carries text, and the only wide exchange is
    the per-doc hit aggregation keyed by doc id. Set
    ``broadcast_bench=False`` to fall back to a shuffle join when the
    benchmark side is itself huge.
    """
    bench = bench_df.select(
        F.monotonically_increasing_id().alias("_bid"),
        F.col(bench_text_col or text_col).alias("_btext"),
    ).filter(F.col("_btext").isNotNull())
    bench_grams = (
        shingle_hash_frame(bench, "_btext", "_bid", n)
        # explode_outer: see ngram_jaccard_pairs — plain explode's inferred
        # size>0 filter inlines the shingle tree at the scan (10× cost)
        .select(F.explode_outer("hs").alias("gram"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    if broadcast_bench:
        bench_grams = F.broadcast(bench_grams)
    # ONE pass over the training shingles: explode the (distinct) gram set,
    # broadcast-LEFT-join the benchmark grams, and let a single groupBy(id)
    # produce BOTH counts — n_grams = count(*) because hs is distinct.
    # Deliberately NO F.size(hs) next to the explode: projection collapse
    # re-inlines the HOF shingle tree into the post-Generate projection, so
    # size() would re-evaluate the whole tree once per OUTPUT row (~90× the
    # shingle cost, measured 3.5 s → 31 s at sf0.1). The r3 two-branch shape
    # paid the same tax through its size()-only branch.
    train_g = shingle_hash_frame(
        train_df.filter(F.col(text_col).isNotNull()), text_col, id_col, n
    )
    per_doc = (
        train_g.select("id", F.explode_outer("hs").alias("gram"))
        .join(bench_grams, "gram", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_hit"),
        )
    )
    return (
        per_doc.withColumn(
            "overlap", F.col("n_hit") / F.greatest(F.col("n_grams"), F.lit(1))
        )
        .withColumn("contaminated", F.col("overlap") >= min_overlap)
        .withColumnRenamed("id", id_col)
    )


def line_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    max_line_df: int = 1,
    min_line_chars: int = 1,
) -> DataFrame:
    """Line/paragraph-level dedup (boilerplate removal): drop every line that
    occurs in MORE than ``max_line_df`` distinct documents, rebuild each doc
    from its surviving lines in original order.

    This is the sub-document pass of published web-corpus pipelines (C4 /
    RefinedWeb line-wise dedup): headers, cookie banners, and navigation
    chrome repeat across pages and survive document-level dedup. Lines
    shorter than ``min_line_chars`` are kept as-is (blank separators carry
    no signal and would all collide).

    Scale shape: explode to (id, pos, line-hash) — the document-frequency
    aggregation shuffles 8-byte hashes, not line text; the hot set comes
    back as a broadcast LEFT join carrying a flag, and docs rebuild with one
    groupBy over ALL their lines using conditional aggregation (collect_list
    skips the nulls the flag produces), so all-boilerplate and null-text
    docs come back with empty text without a separate re-attach join. One
    shuffle of the line rows total (r6 — the previous form anti-joined,
    re-grouped, then joined the ORIGINAL frame back on id: two more
    exchanges and a second scan of the corpus). Every shuffle key is slim;
    nothing quadratic.
    """
    import re as _re

    other_cols = [c for c in df.columns if c != text_col]
    # split() takes a Java regex but concat_ws rebuilds with the literal
    # separator — escape it so metachar separators (".", "|", "\r\n")
    # split literally and round-trip. posexplode_OUTER keeps null-text docs
    # as a (null, null) line so they survive into the rebuild group.
    lines = df.select(
        *other_cols,
        F.posexplode_outer(F.split(F.col(text_col), _re.escape(sep))).alias(
            "_pos", "_line"
        ),
    )
    lines = lines.withColumn("_lh", F.xxhash64("_line"))
    judged = F.length("_line") >= min_line_chars
    hot = (
        lines.filter(judged)
        .groupBy("_lh")
        .agg(F.count_distinct(F.col(id_col)).alias("_ldf"))
        .filter(F.col("_ldf") > max_line_df)
        .select("_lh", F.lit(True).alias("_hot"))
    )
    flagged = lines.join(hot, ["_lh"], "left")
    keep = F.col("_hot").isNull() & F.col("_line").isNotNull()
    rebuilt = flagged.groupBy(*other_cols).agg(
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(
                    F.collect_list(F.when(keep, F.struct("_pos", "_line")))
                ),
                lambda s: s["_line"],
            ),
        ).alias(text_col),
        F.sum(keep.cast("long")).alias("n_lines_kept"),
    )
    return rebuilt


def canonicalize_url(
    col: Column,
    strip_params: list[str] | None = None,
) -> Column:
    """URL canonicalization for dedup keys: lowercase scheme+host, drop
    default ports and fragments, strip tracking query params (utm_* family
    plus ``strip_params``), sort the surviving query pairs, trim trailing
    slash on non-root paths. Pure Column expressions — no UDF.

    The same page under ``HTTP://Example.com:80/a/?utm_source=x&b=1&a=2``
    and ``http://example.com/a?a=2&b=1`` keys identically, which is what a
    crawl-dedup pass needs before exact/URL-keyed grouping.
    """
    extra = [p.lower() for p in (strip_params or [])]
    scheme = F.lower(F.regexp_extract(col, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1))
    rest = F.regexp_replace(col, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    rest = F.regexp_replace(rest, r"#.*$", "")  # fragment never reaches servers
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?]+)", 1))
    # a default port is only redundant for ITS scheme: https://host:80 is a
    # different origin from https://host and must survive canonicalization
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, r":443$", ""))
        .otherwise(hostport)
    )
    path = F.regexp_extract(rest, r"^[^/?]+([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(
        F.regexp_replace(path, r"(.)/$", "$1")
    )
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    pairs = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~F.lower(F.regexp_extract(p, r"^([^=]*)", 1)).rlike(
            # NOTE: `ref` is deliberately NOT stripped by default — it is
            # frequently content-bearing (code-hosting refs); callers opt in
            # via strip_params
            "^(" + "|".join(["utm_[a-z]+", "fbclid", "gclid"] + [
                __import__("re").escape(e) for e in extra
            ]) + ")$"
        ),
    )
    qsorted = F.array_join(F.array_sort(pairs), "&")
    return F.concat(
        scheme, F.lit("://"), host, path,
        F.when(qsorted != "", F.concat(F.lit("?"), qsorted)).otherwise(F.lit("")),
    )
