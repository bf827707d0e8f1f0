"""Stanza row transformers as DataFrame stage functions.

Reference: ``pkg/stanza/operator/transformer/<name>/transformer.go`` (docs at
``pkg/stanza/docs/operators/*.md``). In the flat typed-column model most of
these collapse to trivial Column ops; map-valued attribute columns get the
map_* higher-order-function forms.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def add(df: DataFrame, field: str, value) -> DataFrame:
    """``add`` — set field to a static value or Column expr (add/transformer.go:32)."""
    col = value if isinstance(value, Column) else F.lit(value)
    return df.withColumn(field, col)


def move(df: DataFrame, src: str, dst: str) -> DataFrame:
    """``move`` — rename/relocate (move/transformer.go:26)."""
    return df.withColumnRenamed(src, dst)


def copy(df: DataFrame, src: str, dst: str) -> DataFrame:
    """``copy`` — duplicate field (copy/transformer.go:26)."""
    return df.withColumn(dst, F.col(src))


def remove(df: DataFrame, *fields: str) -> DataFrame:
    """``remove`` — delete fields (remove/transformer.go:25)."""
    return df.drop(*fields)


def retain(df: DataFrame, *fields: str) -> DataFrame:
    """``retain`` — keep only listed fields (retain/transformer.go:27)."""
    return df.select(*fields)


def flatten(df: DataFrame, struct_field: str) -> DataFrame:
    """``flatten`` — promote a struct's fields one level (flatten/transformer.go:30)."""
    others = [c for c in df.columns if c != struct_field]
    return df.select(*others, f"{struct_field}.*")


def assign_keys(df: DataFrame, src: str, keys: list[str], out: str) -> DataFrame:
    """``assign_keys`` — zip list value with key names → map (assignkeys/transformer.go:25)."""
    return df.withColumn(out, F.map_from_arrays(F.array(*[F.lit(k) for k in keys]), F.col(src)))


def regex_replace(df: DataFrame, field: str, pattern: str, replacement: str) -> DataFrame:
    """``regex_replace`` (regexreplace/transformer.go:27)."""
    return df.withColumn(field, F.regexp_replace(F.col(field), pattern, replacement))


def unquote(df: DataFrame, field: str) -> DataFrame:
    """``unquote`` — strip surrounding quotes (unquote/transformer.go:26)."""
    return df.withColumn(
        field, F.regexp_replace(F.col(field), r'^"(.*)"$|^\'(.*)\'$', r"$1$2")
    )


def filter_drop(df: DataFrame, cond: Column, drop_ratio: float = 1.0, seed: int = 7) -> DataFrame:
    """``filter`` — DROP rows matching cond; ``drop_ratio`` keeps a random share.

    Reference: ``filter/config.go:38-46``, ``transformer.go:26-66`` (expr
    matches ⇒ drop, with probabilistic keep). The random draw uses Spark's
    per-row rand(seed) — deterministic per (seed, partition, row) only, so
    production configs pin drop_ratio to 1.0 for exact replay; fractional
    ratios are best-effort sampling exactly as in the reference.
    """
    if drop_ratio >= 1.0:
        return df.filter(~cond)
    return df.filter(~(cond & (F.rand(seed) < drop_ratio)))


def router(
    df: DataFrame,
    routes: list[tuple[str, Column]],
    default: str | None = "default",
    out: str = "route_id",
) -> DataFrame:
    """``router`` — ordered routes, first match wins, non-matching rows DROPPED
    unless a default route exists (auto-appended expr:"true").

    Reference: ``router/transformer.go:38-120``, ``config.go:54-77``. A single
    when-chain reproduces first-match-wins in one codegen pass.
    """
    expr = None
    for name, cond in routes:
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = expr.otherwise(F.lit(default)) if default is not None else expr
    df = df.withColumn(out, expr)
    if default is None:
        df = df.filter(F.col(out).isNotNull())
    return df


def recombine(
    df: DataFrame,
    is_first_entry: Column | None = None,
    source_col: str = "source",
    order_col: str = "doc_id",
    combine_field: str = "body",
    combine_with: str = "\n",
    max_batch_size: int = 1000,
    agg_extra: dict[str, Column] | None = None,
    order_bucket_span: int | None = None,
    is_last_entry: Column | None = None,
) -> DataFrame:
    """``recombine`` — stateful multiline merge, batch form.

    Reference: ``transformer/recombine/config.go:40-62`` (is_first_entry OR
    is_last_entry / source_identifier / combine_with, caps). Batch
    sessionization: a running sum of the boundary flag over (source, order)
    numbers the sessions, then one groupBy concatenates. ``is_last_entry``
    (the container parser's ``logtag == 'F'`` mode) closes the session AT
    the flagged row: session = inclusive-prefix-sum(flag) − flag, so no
    cross-row lag is needed and the two-phase prefix sum still applies.

    Skew: a single ``Window.partitionBy(source)`` puts one hot source (60%
    of rows in the fixture) on ONE task. ``order_bucket_span`` enables the
    two-phase form — a distributed prefix sum: rows bucket by contiguous
    order ranges, the running count is computed per (source, bucket) in
    parallel, and a tiny per-bucket offset frame (one row per bucket) is
    broadcast back so ``session = local_count + bucket_offset`` — bit-for-bit
    the same session ids as the global window, including sessions that span
    bucket boundaries. Requires a numeric ``order_col``. The downstream
    groupBy keys on (source, session), whose cardinality is high, so the
    aggregation itself never concentrates on one task.

    The streaming form (force_flush_period) lives in streaming/stream.py.
    max_batch_size splits oversize sessions exactly like the reference's cap.
    """
    if (is_first_entry is None) == (is_last_entry is None):
        raise ValueError("recombine needs exactly one of is_first_entry / is_last_entry")
    flag = is_first_entry if is_first_entry is not None else is_last_entry
    df = df.withColumn("_first", flag.cast("int"))
    if order_bucket_span:
        df = df.withColumn("_bkt", (F.col(order_col) / order_bucket_span).cast("long"))
        w1 = Window.partitionBy(source_col, "_bkt").orderBy(order_col)
        df = df.withColumn("_local", F.sum("_first").over(w1))
        per_bucket = df.groupBy(source_col, "_bkt").agg(F.sum("_first").alias("_bf"))
        woff = (
            Window.partitionBy(source_col)
            .orderBy("_bkt")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        offsets = per_bucket.withColumn(
            "_off", F.coalesce(F.sum("_bf").over(woff), F.lit(0))
        ).drop("_bf")
        df = df.join(F.broadcast(offsets), [source_col, "_bkt"])
        df = (
            df.withColumn("_session", F.col("_local") + F.col("_off"))
            .drop("_bkt", "_local", "_off")
        )
    else:
        w = Window.partitionBy(source_col).orderBy(order_col)
        df = df.withColumn("_session", F.sum("_first").over(w))
    if is_last_entry is not None:
        # close the session AT the flagged row: shift the boundary by the
        # row's own flag so the 'F' line joins its preceding partials
        df = df.withColumn("_session", F.col("_session") - F.col("_first"))
    df = df.withColumn(
        "_chunk",
        ((F.row_number().over(Window.partitionBy(source_col, "_session").orderBy(order_col)) - 1)
         / max_batch_size).cast("int"),
    )
    # collect_list gives no cross-partition ordering guarantee — gather
    # (order, value) structs and sort inside the aggregate (array_sort on
    # structs orders by first field), exactly the arrival order the
    # reference preserves per source.
    aggs = [
        F.concat_ws(
            combine_with,
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col(order_col).alias("o"), F.col(combine_field).alias("v"))
                    )
                ),
                lambda s: s["v"],
            ),
        ).alias(combine_field),
        F.min(order_col).alias(order_col),
        F.count(F.lit(1)).alias("recombined_n"),
    ]
    for name, col in (agg_extra or {}).items():
        aggs.append(col.alias(name))
    return df.groupBy(source_col, "_session", "_chunk").agg(*aggs).drop("_session", "_chunk")


def noop(df: DataFrame) -> DataFrame:
    """``noop`` (noop/transformer.go:23)."""
    return df
