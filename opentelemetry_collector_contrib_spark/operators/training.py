"""Training-batch preparation over the tokens table.

The engine's input hint is an Iceberg/parquet table of pre-tokenized
sequences ``(doc_id, tokens:array<int32>, n_tok, source)`` at 10¹² rows;
these operators turn curated documents into what a trainer actually reads:

- ``pack_sequences``: greedy fixed-length sequence packing (the standard
  LLM pretraining batch shape — documents concatenated with a separator,
  long documents chunked, tail padded).
- ``stratified_token_mix``: domain-weighted sampling to hit a token budget
  per source (training-mix construction à la The Pile / LLaMA recipes).

Scale notes are per function; neither shuffles document text/token arrays
except where the operation's semantics force it (packing is per-partition
narrow; mixing samples at the scan).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    eos_token: int | None = None,
    pad_token: int = 0,
) -> DataFrame:
    """Pack documents into fixed-length training sequences.

    Greedy per-partition packing: documents (sorted by id within the
    partition for determinism) are concatenated — ``eos_token`` appended
    after each doc when given — into ``seq_len``-token sequences; documents
    longer than ``seq_len`` are chunked; the final buffer of a partition is
    emitted padded with ``pad_token``.

    Output: (seq_id, tokens: array<int> EXACTLY seq_len, doc_ids:
    array<string>, n_real_tokens, n_pad). ``seq_id`` =
    "<partition>-<index>" — unique and reproducible given the same
    partitioning.

    Scale shape: mapInPandas with per-partition state only — NO shuffle;
    1000 executors pack 1000 partitions independently. Waste is bounded at
    one padded tail sequence per partition (amortized to nothing when a
    partition holds ≳thousands of docs). Arrow moves token arrays in
    columnar batches; the Python loop touches numpy slices, not per-token
    Python objects.
    """
    out_schema = T.StructType(
        [
            T.StructField("seq_id", T.StringType(), False),
            T.StructField("tokens", T.ArrayType(T.IntegerType()), False),
            T.StructField("doc_ids", T.ArrayType(T.StringType()), False),
            T.StructField("n_real_tokens", T.IntegerType(), False),
            T.StructField("n_pad", T.IntegerType(), False),
        ]
    )

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        buf: list[int] = []
        buf_docs: list[str] = []
        seq_idx = 0
        rows: list[tuple] = []

        def emit(pad: bool) -> None:
            nonlocal buf, buf_docs, seq_idx
            n_real = len(buf)
            toks = buf + [pad_token] * (seq_len - n_real) if pad else buf
            rows.append(
                (f"{pid}-{seq_idx}", list(toks), list(dict.fromkeys(buf_docs)),
                 n_real, seq_len - n_real if pad else 0)
            )
            seq_idx += 1
            buf, buf_docs = [], []

        for pdf in batches:
            for doc_id, toks in zip(pdf[id_col], pdf[tokens_col]):
                toks = list(toks)
                if eos_token is not None:
                    toks.append(eos_token)
                pos = 0
                while pos < len(toks):
                    take = min(seq_len - len(buf), len(toks) - pos)
                    buf.extend(toks[pos : pos + take])
                    buf_docs.append(str(doc_id))
                    pos += take
                    if len(buf) == seq_len:
                        emit(pad=False)
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=["seq_id", "tokens", "doc_ids", "n_real_tokens", "n_pad"],
                )
                rows = []
        if buf:
            emit(pad=True)
        if rows:
            yield pd.DataFrame(
                rows,
                columns=["seq_id", "tokens", "doc_ids", "n_real_tokens", "n_pad"],
            )

    return df.select(id_col, tokens_col).sortWithinPartitions(id_col).mapInPandas(
        pack, out_schema
    )


def stratified_token_mix(
    df: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    source_col: str = "source",
    n_tok_col: str = "n_tok",
    seed: int = 42,
    id_col: str | None = None,
) -> DataFrame:
    """Sample a domain-weighted training mix hitting ``token_budget`` tokens.

    For each source s: target_s = budget · weight_s / Σweights; sampling
    fraction = min(1, target_s / tokens_s) where tokens_s comes from one
    aggregate over the corpus (sources absent from ``weights`` are
    dropped). Selection then runs AT THE SCAN (a per-row filter; no
    shuffle, no collect beyond the #sources-row aggregate):

    * ``id_col=None`` — Bernoulli ``sampleBy(seed)``: deterministic for a
      given seed AND input partitioning (Spark's rand is seeded per
      partition).
    * ``id_col`` given — CONTENT-KEYED sampling: keep a row iff
      ``mix40(w40(id) ^ salt(seed)) < fraction·2^40`` over the engine-
      portable 40-bit hash (functions/portable_hash.py). Reproducible
      independent of partitioning, cluster size, or engine — the property a
      resumable 100 TB curation run actually needs (re-running a stage on a
      repartitioned input selects the SAME rows), and what lets the driver
      row carry a DuckDB oracle.

    Oversubscribed domains (weight asks for more tokens than exist) cap at
    fraction 1.0 — the standard up-weighting limit; epoch repetition is the
    caller's policy.
    """
    total_w = sum(weights.values())
    per_source = {
        r[0]: r[1]
        for r in df.filter(F.col(source_col).isin(*weights.keys()))
        .groupBy(source_col)
        .agg(F.sum(n_tok_col).alias("t"))
        .collect()
    }
    fractions = {}
    for s, w in weights.items():
        have = per_source.get(s, 0)
        if have <= 0:
            continue
        target = token_budget * (w / total_w)
        fractions[s] = min(1.0, target / have)
    kept = df.filter(F.col(source_col).isin(*fractions.keys()))
    if id_col is None:
        return kept.sampleBy(source_col, fractions, seed)
    import math

    from ..functions import portable_hash as ph

    salt = ph.salt40(f"mix:{seed}")
    key = ph.mix40_col(ph.w40_col(F.col(id_col).cast("string")).bitwiseXOR(F.lit(salt)))
    cond = F.lit(False)
    for s, f in fractions.items():
        thr = math.floor(f * float(1 << 40))
        cond = cond | ((F.col(source_col) == s) & (key < F.lit(thr)))
    return kept.filter(cond)
