"""Metric-point algebra processors.

Reference: the metrics family in SURVEY §2.5 —
``processor/cumulativetodeltaprocessor/processor.go:93-116`` (per-series
value - previous value), ``processor/deltatocumulativeprocessor/
processor.go:74,188-200`` (running sum per series, MaxStale eviction),
``processor/deltatorateprocessor`` (delta / time delta), and
``processor/intervalprocessor/processor.go:47-121`` (periodic re-emit of
the last point per interval).

Batch form: ranking/analytic window functions per series key — the ONLY
order-sensitive operators in the engine besides recombine. The window
shuffle partitions by series key; at 10^12 scale series cardinality ≫
cores so the shuffle is well-spread (skew: one hot series is capped by
per-series data volume, not row count × key count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cumulative_to_delta(
    df: DataFrame, key_cols: list[str], ts_col: str = "ts", value_col: str = "value"
) -> DataFrame:
    """Per-series delta: value - lag(value); first point in a series is
    dropped (the reference can't produce a delta without a predecessor,
    processor.go:93-116)."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    return (
        df.withColumn("_prev", F.lag(value_col).over(w))
        .filter(F.col("_prev").isNotNull())
        .withColumn("delta", F.col(value_col) - F.col("_prev"))
        .drop("_prev")
    )


def delta_to_cumulative(
    df: DataFrame, key_cols: list[str], ts_col: str = "ts", value_col: str = "value"
) -> DataFrame:
    """Per-series running sum (processor.go:188-200)."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn("cumulative", F.sum(value_col).over(w))


def delta_to_rate(
    df: DataFrame, key_cols: list[str], ts_col: str = "ts", value_col: str = "value"
) -> DataFrame:
    """delta / seconds-since-previous-point (deltatorateprocessor)."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    dt = F.unix_micros(F.col(ts_col).cast("timestamp")) - F.unix_micros(
        F.lag(F.col(ts_col).cast("timestamp")).over(w)
    )
    return (
        df.withColumn("_dt_us", dt)
        .filter(F.col("_dt_us").isNotNull() & (F.col("_dt_us") > 0))
        .withColumn("rate_per_s", F.col(value_col) / (F.col("_dt_us") / 1_000_000.0))
        .drop("_dt_us")
    )


def interval_last(
    df: DataFrame, key_cols: list[str], ts_col: str = "ts", value_col: str = "value",
    interval: str = "60 seconds",
) -> DataFrame:
    """intervalprocessor: one point per (series, interval) — the LAST seen.

    processor.go:47-121 keeps the latest point per series and flushes on a
    ticker; batch form = max_by(value, ts) per tumbling window.
    """
    return (
        df.groupBy(F.window(F.col(ts_col).cast("timestamp"), interval).alias("w"), *key_cols)
        .agg(
            F.max_by(value_col, ts_col).alias("last_value"),
            F.max(ts_col).alias("last_ts"),
            F.count(F.lit(1)).alias("points_merged"),
        )
        .withColumn("window_start", F.col("w.start"))
        .drop("w")
    )


def interval_processor(
    df: DataFrame,
    series_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    type_col: str = "mtype",
    monotonic_col: str = "monotonic",
    temporality_col: str = "temporality",
    pass_through_gauge: bool = False,
    pass_through_summary: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """intervalprocessor's full consume-then-flush split (processor.go:
    104-170): returns ``(passthrough, flushed)``.

    Pass-through (forwarded immediately, never aggregated): summaries and
    gauges when their PassThrough config flag is set, non-monotonic sums,
    and any non-cumulative (delta) temporality. Everything else keeps only
    the LAST datapoint per series (latest ``ts`` wins — out-of-order points
    are dropped, processor.go:270-292 via the lookup tables) and emits it
    at the flush. ``temporality`` uses pdata numbering (2 = cumulative).
    """
    is_sum_like = F.col(type_col).isin("sum", "histogram", "exponential_histogram")
    pt = (
        (F.col(type_col) == "summary") & F.lit(pass_through_summary)
        | (F.col(type_col) == "gauge") & F.lit(pass_through_gauge)
        | ((F.col(type_col) == "sum") & ~F.col(monotonic_col))
        | (is_sum_like & (F.col(temporality_col) != 2))
    )
    passthrough = df.filter(pt)
    flushed = (
        df.filter(~pt)
        .groupBy(*series_cols)
        .agg(
            F.max_by(value_col, ts_col).alias(value_col),
            F.max(ts_col).alias(ts_col),
            F.any_value(monotonic_col).alias(monotonic_col),
            F.any_value(temporality_col).alias(temporality_col),
        )
    )
    return passthrough, flushed


def metric_start_time(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    strategy: str = "true_reset_point",
) -> DataFrame:
    """metricstarttimeprocessor: set each cumulative point's start timestamp.

    Reference: ``processor/metricstarttimeprocessor`` — strategies:
      true_reset_point:       start_time = the series' first observed point;
                              on a value RESET (point < previous) the start
                              re-anchors at the reset point
      subtract_initial_point: additionally subtracts the initial value from
                              every later point (start anchored the same way)
    Batch form: per-series window — a reset opens a new epoch (cumsum of
    reset flags), start = min(ts) per (series, epoch), initial = first value
    per epoch.
    """
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    reset = (F.col(value_col) < F.lag(value_col).over(w)).cast("int")
    df = df.withColumn("_epoch", F.coalesce(F.sum(reset).over(w), F.lit(0)))
    we = Window.partitionBy(*key_cols, "_epoch")
    df = df.withColumn("start_timestamp", F.min(ts_col).over(we))
    if strategy == "subtract_initial_point":
        first_val = F.first(value_col).over(
            Window.partitionBy(*key_cols, "_epoch").orderBy(ts_col)
        )
        df = df.withColumn(value_col, F.col(value_col) - first_val)
    elif strategy != "true_reset_point":
        raise ValueError(f"unknown strategy {strategy!r}")
    return df.drop("_epoch")


def metrics_transform(
    df: DataFrame,
    rename: dict[str, str] | None = None,
    scale: float | None = None,
    aggregate_across: list[str] | None = None,
    agg_type: str = "sum",
    metric_col: str = "metric_name",
    value_col: str = "value",
) -> DataFrame:
    """metricstransformprocessor: rename metrics, scale values, aggregate
    across label dimensions.

    Reference: ``processor/metricstransformprocessor`` (rename via
    ``new_name``, ``experimental_scale_value``, ``aggregate_labels`` with
    aggregation_type ∈ sum/mean/min/max/count). ``aggregate_across`` lists
    the label columns to KEEP — all other non-metric/value columns are
    dropped and points merged (the processor's aggregate-labels contract).
    One hash-agg; map-side partial combine keeps the shuffle at group-key
    cardinality.
    """
    if rename:
        expr = F.col(metric_col)
        for old, new in rename.items():
            expr = F.when(F.col(metric_col) == old, new).otherwise(expr)
        df = df.withColumn(metric_col, expr)
    if scale is not None:
        df = df.withColumn(value_col, F.col(value_col) * scale)
    if aggregate_across is not None:
        aggs = {
            "sum": F.sum(value_col),
            "mean": F.avg(value_col),
            "min": F.min(value_col),
            "max": F.max(value_col),
            "count": F.count(F.lit(1)),
        }
        df = df.groupBy(metric_col, *aggregate_across).agg(
            aggs[agg_type].alias(value_col), F.count(F.lit(1)).alias("points_merged")
        )
    return df


def metrics_generation(
    df: DataFrame,
    name: str,
    operand1: str,
    operand2: str,
    operation: str = "divide",
    value_col: str = "value",
) -> DataFrame:
    """metricsgenerationprocessor: derive a new metric from two existing ones
    (calculate mode: operand1 <op> operand2 per matching label set).

    Reference: ``processor/metricsgenerationprocessor`` (README: ``calculate``
    rule with metric_1, metric_2, operation ∈ add/subtract/multiply/divide/
    percent). Columnar form: both operands are columns per row.
    """
    a, b = F.col(operand1), F.col(operand2)
    ops = {
        "add": a + b,
        "subtract": a - b,
        "multiply": a * b,
        "divide": F.when(b != 0, a / b),
        "percent": F.when(b != 0, a / b * 100.0),
    }
    return df.withColumn(name, ops[operation])


OVERFLOW_SENTINEL = "otel.cardinality_overflow"


def cardinality_guardian(
    df: DataFrame,
    metric_col: str = "metric_name",
    attrs_col: str = "attributes",
    ts_col: str = "ts",
    value_col: str = "value",
    epoch_seconds: int = 300,
    max_delta: int = 500,
    never_drop: list[str] | None = None,
    metric_overrides: dict[str, int] | None = None,
    mode: str = "strip_and_reaggregate",
    metric_type: str = "delta_sum",
    exact: bool = False,
) -> DataFrame:
    """Strip/tag exploding metric labels before they reach the TSDB.

    Reference: ``processor/cardinalityguardianprocessor/processor.go:755-805``
    — per (metric, label-key) tracker holding dual-epoch HLL++ sketches; a
    label value is handled by the enforcement mode when the CURRENT epoch's
    estimate exceeds the PREVIOUS epoch's by more than
    ``max_cardinality_delta_per_epoch`` (delta-based: stable high-cardinality
    labels are never penalized, config.go:26-37). ``never_drop_labels`` are
    always protected; per-metric limits via ``metric_overrides``
    (processor.go:808-815). Modes (processor.go:411-478):

    * ``strip_and_reaggregate`` — remove the exploding key, then merge data
      points that collide on the now-smaller identity (reaggregation.go:
      delta sums add; gauges keep the latest-timestamp point).
    * ``tag_only`` — keep the data, add ``otel.metric.overflow = "true"``.
    * ``overflow_attribute`` — replace the exploding key's VALUE with the
      ``otel.cardinality_overflow`` sentinel so all overflow points share
      one bounded identity (processor.go:34-39).

    Batch mapping: epoch = floor(unix(ts)/epoch_seconds); per
    (metric, key, epoch) distinct-value counts come from ONE
    explode→hash-agg — ``approx_count_distinct`` IS the reference's HLL++
    (same sketch family, same ~2% error; ``exact=True`` swaps in exact
    countDistinct for oracle-checkable tests). The exploding-key set is a
    per-(metric, epoch) aggregate orders of magnitude smaller than the data
    and is broadcast back. Divergence from the streaming reference: the
    decision is per EPOCH, not per arrival (the whole epoch's cardinality is
    known at once) — a batch replay therefore treats every point of an
    exploding (metric, key, epoch) the same way, where the reference starts
    enforcing mid-epoch at the point where the sketch first crosses the
    limit.
    """
    never_drop = list(never_drop or [])
    overrides = metric_overrides or {}
    epoch = (F.unix_timestamp(F.col(ts_col).cast("timestamp")) / epoch_seconds).cast("long")
    df = df.withColumn("_epoch", epoch)

    kv = df.select(F.col(metric_col).alias("_m"), "_epoch", F.explode(attrs_col).alias("_k", "_v"))
    if never_drop:
        kv = kv.filter(~F.col("_k").isin(never_drop))
    card_fn = F.count_distinct if exact else F.approx_count_distinct
    per_epoch = kv.groupBy("_m", "_k", "_epoch").agg(card_fn(F.col("_v")).alias("_card"))
    prev = per_epoch.select(
        "_m", "_k", (F.col("_epoch") + 1).alias("_epoch"), F.col("_card").alias("_prev_card")
    )
    limit = F.lit(max_delta)
    for name, v in overrides.items():
        limit = F.when(F.col("_m") == name, F.lit(v)).otherwise(limit)
    exploding = (
        per_epoch.join(prev, ["_m", "_k", "_epoch"], "left")
        .withColumn("_delta", F.col("_card") - F.coalesce(F.col("_prev_card"), F.lit(0)))
        .filter(F.col("_delta") > limit)
        .groupBy("_m", "_epoch")
        .agg(F.collect_set("_k").alias("_bad"))
        .withColumnsRenamed({"_m": "_bm", "_epoch": "_bepoch"})
    )
    out = df.join(
        F.broadcast(exploding),
        (F.col(metric_col) == F.col("_bm")) & (F.col("_epoch") == F.col("_bepoch")),
        "left",
    ).drop("_bm", "_bepoch")
    bad = F.coalesce(F.col("_bad"), F.array().cast("array<string>"))
    hit = F.exists(F.map_keys(F.col(attrs_col)), lambda k: F.array_contains(bad, k))

    if mode == "tag_only":
        tagged = F.map_concat(
            F.col(attrs_col), F.create_map(F.lit("otel.metric.overflow"), F.lit("true"))
        )
        return out.withColumn(
            attrs_col, F.when(hit, tagged).otherwise(F.col(attrs_col))
        ).drop("_bad", "_epoch")
    if mode == "overflow_attribute":
        replaced = F.transform_values(
            F.col(attrs_col),
            lambda k, v: F.when(F.array_contains(bad, k), F.lit(OVERFLOW_SENTINEL)).otherwise(v),
        )
        return out.withColumn(attrs_col, replaced).drop("_bad", "_epoch")
    if mode != "strip_and_reaggregate":
        raise ValueError(f"unknown enforcement mode {mode!r}")

    stripped = out.withColumn(
        attrs_col, F.map_filter(F.col(attrs_col), lambda k, v: ~F.array_contains(bad, k))
    ).drop("_bad")
    # reaggregation.go: merge points whose identity collided after stripping.
    # Group key = (metric, epoch, attrs); maps aren't groupable, so group on
    # the sorted-entries JSON rendering and keep the map via first().
    ident = F.to_json(F.array_sort(F.map_entries(F.col(attrs_col))))
    stripped = stripped.withColumn("_ident", ident)
    others = [
        c for c in stripped.columns
        if c not in (metric_col, attrs_col, ts_col, value_col, "_ident", "_epoch")
    ]
    if metric_type == "gauge":
        agg = [
            F.max_by(F.struct(ts_col, value_col, attrs_col, *others), F.col(ts_col)).alias("_last"),
        ]
        merged = stripped.groupBy(metric_col, "_epoch", "_ident").agg(*agg)
        cols = [metric_col, F.col(f"_last.{ts_col}").alias(ts_col),
                F.col(f"_last.{value_col}").alias(value_col),
                F.col(f"_last.{attrs_col}").alias(attrs_col)]
        cols += [F.col(f"_last.{c}").alias(c) for c in others]
        return merged.select(*cols)
    # delta sums add; the merged point carries the MAX timestamp (latest)
    merged = stripped.groupBy(metric_col, "_epoch", "_ident").agg(
        F.sum(value_col).alias(value_col),
        F.max(ts_col).alias(ts_col),
        F.first(attrs_col).alias(attrs_col),
        *[F.first(c).alias(c) for c in others],
        F.count(F.lit(1)).alias("points_merged"),
    )
    return merged.drop("_ident", "_epoch")
