"""Enrichment stage — k8sattributes / resourcedetection / lookup analogs.

The reference's enrich is an in-memory cache lookup per record
(``processor/k8sattributesprocessor/processor.go:182-291``); at Spark scale
the same semantics are **broadcast hash joins** against small dimension
DataFrames — no shuffle of the fact side, plan shows BroadcastHashJoin.

Set-if-absent merge (``processor.go:287-291``): existing non-null attribute
wins over the looked-up value ⇒ ``coalesce(existing, lookup)``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def broadcast_lookup(
    df: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    set_if_absent: bool = True,
    prefix: str = "",
) -> DataFrame:
    """Left-outer broadcast join; dim's non-key columns become attributes.

    Reference: k8sattributes pod lookup ``processor.go:202-285`` and the
    generic lookup processor ``processor/lookupprocessor/config.go:36-76``.
    Rows with no dim match keep nulls (association-failure path) — callers
    can count them via ``F.col(attr).isNull()``.
    """
    keys = [on] if isinstance(on, str) else list(on)
    payload = [c for c in dim.columns if c not in keys]
    renamed = dim
    for c in payload:
        renamed = renamed.withColumnRenamed(c, f"_dim_{c}")
    out = df.join(F.broadcast(renamed), on=keys, how="left")
    for c in payload:
        tgt = f"{prefix}{c}"
        if set_if_absent and tgt in df.columns:
            out = out.withColumn(tgt, F.coalesce(F.col(tgt), F.col(f"_dim_{c}")))
        else:
            out = out.withColumn(tgt, F.col(f"_dim_{c}"))
        out = out.drop(f"_dim_{c}")
    return out


def chained_lookup(df: DataFrame, chain: list[tuple[DataFrame, str | list[str]]]) -> DataFrame:
    """Chained secondary lookups: pod → namespace → node → workload.

    Reference: ``k8sattributesprocessor/processor.go:182-285`` walks
    namespace/node/deployment/... after the pod hit; each is another
    broadcast join keyed on a column produced by the previous one.
    """
    for dim, on in chain:
        df = broadcast_lookup(df, dim, on)
    return df


def resource_detection(df: DataFrame, detected: dict[str, str], override: bool = False) -> DataFrame:
    """Merge an at-startup-detected resource into every row.

    Reference: ``resourcedetectionprocessor/resourcedetection_processor.go:20-84``
    — detection happens once on the driver; per-row it's literal columns
    (constant-folded by Catalyst, zero runtime cost).
    """
    for k, v in detected.items():
        if override or k not in df.columns:
            df = df.withColumn(k, F.lit(v))
        else:
            df = df.withColumn(k, F.coalesce(F.col(k), F.lit(v)))
    return df


def geoip_range_lookup(df: DataFrame, ip_col: str, ranges: DataFrame) -> DataFrame:
    """Geo/CIDR enrich: broadcast range join on integer IP intervals.

    Reference: ``processor/geoipprocessor`` (MMDB lookup). ``ranges`` has
    (ip_lo, ip_hi, payload...) as longs; the non-equi join stays broadcast
    so it never shuffles the fact side.
    """
    # split once into a real column — the four octet references would each
    # re-run the regex split when this projection falls out of codegen
    df = df.withColumn("_ip_parts", F.split(F.col(ip_col), r"\."))
    p = F.col("_ip_parts")
    ip_int = (
        p[0].cast("long") * 16777216
        + p[1].cast("long") * 65536
        + p[2].cast("long") * 256
        + p[3].cast("long")
    )
    df = df.withColumn("_ip_int", ip_int).drop("_ip_parts")
    cond = (F.col("_ip_int") >= ranges["ip_lo"]) & (F.col("_ip_int") <= ranges["ip_hi"])
    return df.join(F.broadcast(ranges), cond, "left").drop("_ip_int", "ip_lo", "ip_hi")
