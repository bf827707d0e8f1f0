"""Engine-portable 40-bit hashing — identical bits in Spark, DuckDB, Python.

The dedup/ANN family's production paths hash with ``xxhash64`` (JVM
intrinsic, fastest), but xxhash64 is not reproducible in plain DuckDB SQL,
which left the minhash-LSH and hyperplane-LSH catalog rows without a DuckDB
oracle. This module defines a hash family every engine can evaluate
bit-for-bit, so those operators gain a ``hash_fn="portable"`` mode whose
OUTPUT a DuckDB oracle reproduces exactly:

* ``w40``   — string -> 40-bit int: the first 10 hex chars of md5 (md5 is
  identical lowercase hex in Spark, DuckDB, and hashlib).
* ``mix40`` — 40-bit avalanche mixer: three multiply-mask / xor-shift
  rounds. Multipliers are < 2^23, values < 2^40, so every intermediate
  product is < 2^63 — safe under ANSI mode (Spark 4 default) and DuckDB's
  checked BIGINT arithmetic: no wraparound is ever exercised.
* ``polyfold40`` — order-sensitive fold of an int sequence (polynomial
  accumulate, multiplier < 2^20), used for shingle and band hashes.
* ``salt40`` / ``rademacher`` — deterministic md5-derived constants shared
  by both engines as plain literals.

Each primitive has three renderings: ``*_col`` (Spark Column), ``*_sql``
(DuckDB SQL text), ``*_py`` (plain Python, used by tests). 40 bits keeps
collision odds negligible for per-document shingle sets (birthday bound
~2^20 elements) while staying far from the signed-64 overflow line.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

MASK40 = (1 << 40) - 1
M1, M2, M3 = 8386423, 7654321, 5000011  # < 2^23: (2^40-1)*M < 2^63
MPOLY = 1048573  # < 2^20 polynomial-fold multiplier
SHIFTS = (21, 13, 17)


# ------------------------------------------------------------------ mix40

def mix40_py(x: int) -> int:
    h = x & MASK40
    for m, s in zip((M1, M2, M3), SHIFTS):
        h = (h * m) & MASK40
        h = h ^ (h >> s)
    return h


def mix40_col(c: Column) -> Column:
    h = c.bitwiseAND(F.lit(MASK40))
    for m, s in zip((M1, M2, M3), SHIFTS):
        h = (h * F.lit(m)).bitwiseAND(F.lit(MASK40))
        h = h.bitwiseXOR(F.shiftright(h, s))
    return h


def mix40_sql(expr: str) -> str:
    h = f"({expr} & {MASK40})"
    for m, s in zip((M1, M2, M3), SHIFTS):
        h = f"((({h}) * {m}) & {MASK40})"
        h = f"(xor({h}, ({h}) >> {s}))"
    return h


# ------------------------------------------------------------------ w40

def w40_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:10], 16)


def w40_col(c: Column) -> Column:
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 10), 16, 10).cast("long")


def w40_sql(expr: str) -> str:
    return f"CAST('0x' || substr(md5({expr}), 1, 10) AS BIGINT)"


# ------------------------------------------------------------------ folds

def polyfold40_col(arr: Column) -> Column:
    """Order-sensitive fold of array<long> -> long (NOT mixed; callers wrap
    in mix40 when avalanche matters)."""
    return F.aggregate(
        arr,
        F.lit(0).cast("long"),
        lambda a, b: ((a * F.lit(MPOLY)).bitwiseAND(F.lit(MASK40)) + b).bitwiseAND(
            F.lit(MASK40)
        ),
    )


def polyfold40_sql(list_expr: str) -> str:
    # DuckDB list_reduce has no init value: prepend the zero seed.
    return (
        f"list_reduce(list_concat([0::BIGINT], {list_expr}), "
        f"(a, b) -> (((a * {MPOLY}) & {MASK40}) + b) & {MASK40})"
    )


def polyfold40_py(vals) -> int:
    acc = 0
    for v in vals:
        acc = (((acc * MPOLY) & MASK40) + v) & MASK40
    return acc


# ------------------------------------------------------------------ constants

def salt40(tag: str) -> int:
    """Deterministic 40-bit salt for a string tag (shared literal)."""
    return int(hashlib.md5(tag.encode()).hexdigest()[:10], 16)


def rademacher(tag: str, n: int) -> list[int]:
    """Deterministic ±1 weights: sign of bit 0 of mix40(salt(tag) + i)."""
    base = salt40(tag)
    return [(mix40_py(base + i) & 1) * 2 - 1 for i in range(n)]
