"""pdata-level processors as stage functions.

attributes / filter / probabilistic sampler / unroll / redaction / groupbyattrs —
reference anchors inline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def attributes_actions(df: DataFrame, actions: list[dict]) -> DataFrame:
    """Attributes processor action list.

    Reference: ``internal/coreinternal/attraction/attraction.go:116-144`` —
    actions ∈ {insert, update, upsert, delete, hash, extract, convert}.
    Flat-column model: key = column name.
      insert: set only if currently null/absent
      update: set only if present (non-null)
      upsert: always set
      delete: drop
      hash:   SHA-256 of the value (attraction.go sha2)
      extract: regex named groups → new columns
      convert: cast
    """
    import re as _re

    for a in actions:
        act, key = a["action"], a["key"]
        if act == "insert":
            v = a["value"] if isinstance(a.get("value"), Column) else F.lit(a.get("value"))
            df = df.withColumn(key, F.coalesce(F.col(key), v) if key in df.columns else v)
        elif act == "update":
            if key in df.columns:
                v = a["value"] if isinstance(a.get("value"), Column) else F.lit(a.get("value"))
                df = df.withColumn(key, F.when(F.col(key).isNotNull(), v).otherwise(F.col(key)))
        elif act == "upsert":
            v = a["value"] if isinstance(a.get("value"), Column) else F.lit(a.get("value"))
            df = df.withColumn(key, v)
        elif act == "delete":
            df = df.drop(key)
        elif act == "hash":
            df = df.withColumn(key, F.sha2(F.col(key).cast("string"), 256))
        elif act == "extract":
            from .parsers import java_regex

            pat = a["pattern"]
            for i, g in enumerate(_re.compile(pat).groupindex.keys(), start=1):
                df = df.withColumn(g, F.regexp_extract(F.col(key), java_regex(pat), i))
        elif act == "convert":
            df = df.withColumn(key, F.col(key).try_cast(a["converted_type"]))
        else:
            raise ValueError(f"unknown action {act!r}")
    return df


def filter_processor(df: DataFrame, conditions: list[Column]) -> tuple[DataFrame, Column]:
    """Drop records where ANY condition matches (conditions are OR'd).

    Reference: ``processor/filterprocessor/logs.go:98-162`` — returns the
    kept frame plus the drop predicate so callers can account dropped rows
    into the _metrics table (the reference counts via telemetry).
    """
    pred = conditions[0]
    for c in conditions[1:]:
        pred = pred | c
    return df.filter(~(pred & pred.isNotNull())), pred


def probabilistic_sampler(
    df: DataFrame, percent: float, key: str = "doc_id", seed: int = 22
) -> DataFrame:
    """Hash-based consistent sampling — deterministic and re-runnable.

    Reference: ``processor/probabilisticsamplerprocessor/logsprocessor.go:39-117``
    (randomness = FNV hash of an attribute; hash_seed mode). xxhash64 of the
    key column modulo a 2^14 space vs threshold ⇒ same row always gets the
    same decision, independent of partitioning.
    """
    threshold = int(percent / 100.0 * 16384)
    return df.filter(F.pmod(F.xxhash64(F.col(key), F.lit(seed)), F.lit(16384)) < threshold)


def unroll(df: DataFrame, field: str) -> DataFrame:
    """Explode a slice body → one record per element.

    Reference: ``processor/unrollprocessor/processor.go:31-71``.
    """
    return df.withColumn(field, F.explode(F.col(field)))


def redaction(
    df: DataFrame,
    allowed_keys: list[str] | None = None,
    blocked_values: list[str] | None = None,
    attr_col: str = "attributes",
    mask: str = "****",
) -> DataFrame:
    """Redaction over a map<string,string> attributes column.

    Reference: ``processor/redactionprocessor/processor.go:189-233`` —
    non-allowed keys removed; values matching blocked regexes masked.
    """
    col = F.col(attr_col)
    if allowed_keys is not None:
        allow = F.array(*[F.lit(k) for k in allowed_keys])
        col = F.map_filter(col, lambda k, v: F.array_contains(allow, k))
    for pat in blocked_values or []:
        col = F.transform_values(
            col, lambda k, v: F.when(v.rlike(pat), F.lit(mask)).otherwise(v)
        )
    return df.withColumn(attr_col, col)


def group_by_attrs(df: DataFrame, keys: list[str]) -> DataFrame:
    """groupbyattrs — re-group/compact batches by attribute key.

    Reference: ``processor/groupbyattrsprocessor/processor.go:63-100``. In the
    flat model this is physical-layout-only: repartition by the keys so
    downstream per-resource writes are co-located.
    """
    return df.repartition(*[F.col(k) for k in keys])
