"""Span pruning — duplicate-leaf aggregation inside a trace.

Reference: ``processor/spanpruningprocessor`` — groups similar LEAF spans of
a trace (same name, kind, status, tracestate, configured attributes, and
parent span NAME — grouping.go:27-188), replaces each group of ≥
``min_spans_to_aggregate`` with ONE summary span cloned from the group's
longest-duration member (aggregation.go:142-196: new span id, template's
parent, earliest start / latest end, ``aggregation.is_summary`` +
span_count + duration min/max/total/avg attributes), then recursively
aggregates parents whose children were ALL aggregated, up to
``max_parent_depth`` levels (README; -1 = unlimited). Optional IQR/MAD
duration-outlier analysis annotates summaries with the median and
correlated attributes (outlier.go).

Spark mapping: leaf detection is one anti-join against the distinct parent
ids; each aggregation level is one hash-agg over the level's group key with
``max_by(duration)`` carrying the template row; summary span ids are
DETERMINISTIC (xxhash64 of the group key — the reference draws random ids,
aggregation.go:55; determinism is strictly better for a replayable batch);
parent levels run as a compile-time loop of the same step (bounded by
``max_parent_depth``; unlimited depth iterates until a level aggregates
nothing). Child summaries re-parent onto their parent's summary via a
broadcast map of removed-parent → summary id.

Subset (documented): outlier SUBTREE PRESERVATION and the attribute-loss /
bytes telemetry are not ported; outlier analysis annotates
``duration_median_ns`` and ``outlier_correlated_attributes`` only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _glob_to_like(g: str) -> str:
    return g.replace("%", r"\%").replace("_", r"\_").replace("*", "%")


def _matched_attrs(attrs: Column, globs: list[str]) -> Column:
    """Canonical string of the grouping attributes: sorted (k,v) entries of
    the attrs map whose key matches any glob (grouping.go:62-78 sorts keys
    for a stable key)."""
    if not globs:
        return F.lit("")

    def key_match(k: Column) -> Column:
        out = F.lit(False)
        for g in globs:
            out = out | k.like(_glob_to_like(g))
        return out

    filtered = F.map_filter(attrs, lambda k, v: key_match(k))
    return F.to_json(F.array_sort(F.map_entries(filtered)))


def span_pruning(
    spans: DataFrame,
    group_by_attributes: list[str] | None = None,
    conditions: list[str] | None = None,
    min_spans_to_aggregate: int = 5,
    max_parent_depth: int = 1,
    aggregation_attribute_prefix: str = "aggregation.",
    trace_col: str = "trace_id",
    span_id_col: str = "span_id",
    parent_col: str = "parent_span_id",
    name_col: str = "name",
    kind_col: str = "kind",
    status_col: str = "status_code",
    start_col: str = "start_ns",
    end_col: str = "end_ns",
    attrs_col: str = "attributes",
    tracestate_col: str | None = None,
    enable_outlier_analysis: bool = False,
    outlier_method: str = "iqr",
    iqr_multiplier: float = 1.5,
    mad_multiplier: float = 3.0,
    outlier_min_group_size: int = 7,
) -> DataFrame:
    """Prune duplicate leaf spans; returns the surviving + summary spans.

    Output schema = input + ``_summary`` struct column flattened into the
    ``aggregation.*`` attribute columns: ``is_summary`` (bool), and for
    summaries ``span_count``, ``duration_min_ns/max_ns/total_ns/avg_ns``
    (+ ``duration_median_ns`` / ``outlier_correlated_attributes`` when
    outlier analysis is on). Timestamps are integer nanoseconds.
    """
    globs = group_by_attributes or []
    prefix = aggregation_attribute_prefix
    has_attrs = attrs_col in spans.columns

    if conditions:
        # selective pruning (README): only traces where at least one span
        # matches any condition are pruned; the rest pass through untouched
        from ..functions.ottl import Compiler, PathResolver

        comp = Compiler(PathResolver(spans))
        pred = F.lit(False)
        for c in conditions:
            cc = comp.compile_condition(c)
            pred = pred | (cc & cc.isNotNull())
        matched = spans.filter(pred).select(trace_col).distinct()
        prune_side = spans.join(F.broadcast(matched), trace_col, "left_semi")
        passthrough = spans.join(F.broadcast(matched), trace_col, "left_anti")
        pruned = span_pruning(
            prune_side, group_by_attributes, None, min_spans_to_aggregate,
            max_parent_depth, aggregation_attribute_prefix, trace_col,
            span_id_col, parent_col, name_col, kind_col, status_col,
            start_col, end_col, attrs_col, tracestate_col,
            enable_outlier_analysis, outlier_method, iqr_multiplier,
            mad_multiplier, outlier_min_group_size,
        )
        return pruned.unionByName(
            passthrough.withColumn(f"{prefix}is_summary", F.lit(False)),
            allowMissingColumns=True,
        )
    extra = [c for c in spans.columns if c not in (
        trace_col, span_id_col, parent_col, name_col, kind_col, status_col,
        start_col, end_col,
    )]

    ts_key = (
        F.coalesce(F.col(tracestate_col), F.lit(""))
        if tracestate_col and tracestate_col in spans.columns
        else F.lit("")
    )
    attr_key = _matched_attrs(F.col(attrs_col), globs) if has_attrs else F.lit("")

    # parent NAME per span (leaf keys include it, grouping.go:161-188)
    pnames = spans.select(
        F.col(trace_col).alias("_pt"),
        F.col(span_id_col).alias("_pid"),
        F.col(name_col).alias("_pname"),
    )
    work = spans.join(
        pnames,
        (F.col(trace_col) == F.col("_pt")) & (F.col(parent_col) == F.col("_pid")),
        "left",
    ).drop("_pt", "_pid")
    work = work.withColumn(
        "_gkey",
        F.concat_ws(
            "\x1f",
            F.col(trace_col),
            F.coalesce(F.col("_pname"), F.lit("")),
            F.col(name_col),
            F.col(kind_col).cast("string"),
            F.col(status_col).cast("string"),
            ts_key,
            attr_key,
        ),
    ).withColumn("_dur", (F.col(end_col) - F.col(start_col)).cast("long"))

    parent_ids = spans.select(
        F.col(trace_col).alias("_ct"), F.col(parent_col).alias("_cid")
    ).filter(F.col("_cid").isNotNull() & (F.col("_cid") != "")).distinct()

    def is_leaf_join(df: DataFrame) -> DataFrame:
        return df.join(
            parent_ids,
            (df[trace_col] == F.col("_ct")) & (df[span_id_col] == F.col("_cid")),
            "left_anti",
        )

    def aggregate_level(cand: DataFrame, min_count: int) -> tuple[DataFrame, DataFrame]:
        """One level: group candidates by _gkey, emit (summaries, removed)."""
        template = F.max_by(F.struct(*cand.columns), F.col("_dur")).alias("_tpl")
        aggs = [
            template,
            F.count(F.lit(1)).alias("_n"),
            F.min("_dur").alias("_dmin"),
            F.max("_dur").alias("_dmax"),
            F.sum("_dur").alias("_dsum"),
            F.min(start_col).alias("_smin"),
            F.max(end_col).alias("_emax"),
            F.collect_list(span_id_col).alias("_members"),
        ]
        if enable_outlier_analysis:
            # quartiles in the agg; MAD and the outlier count come from the
            # collected duration array POST-agg (array HOFs on agg outputs —
            # nested aggregates are illegal, and group sizes are bounded by
            # spans-per-trace so the array is small)
            aggs += [
                F.expr("percentile(_dur, array(0.25, 0.5, 0.75))").alias("_q"),
                F.collect_list("_dur").alias("_durs"),
            ]
        grouped = cand.groupBy("_gkey").agg(*aggs).filter(F.col("_n") >= min_count)
        # deterministic summary span id from the group key
        sid = F.lower(F.lpad(F.conv(F.xxhash64("_gkey").cast("string"), 10, 16), 16, "0"))
        summary_cols = {
            span_id_col: sid,
            start_col: F.col("_smin"),
            end_col: F.col("_emax"),
            "_dur": (F.col("_emax") - F.col("_smin")).cast("long"),
            f"{prefix}is_summary": F.lit(True),
            f"{prefix}span_count": F.col("_n").cast("long"),
            f"{prefix}duration_min_ns": F.col("_dmin"),
            f"{prefix}duration_max_ns": F.col("_dmax"),
            f"{prefix}duration_total_ns": F.col("_dsum"),
            f"{prefix}duration_avg_ns": (F.col("_dsum") / F.col("_n")).cast("long"),
        }
        if enable_outlier_analysis:
            gate = F.col("_n") >= outlier_min_group_size
            median = F.element_at("_q", 2)
            if outlier_method == "mad":
                # lower-median of absolute deviations, scaled by the normal
                # consistency constant (outlier.go MAD path)
                devs = F.array_sort(F.transform("_durs", lambda d: F.abs(d - median)))
                mad = F.element_at(devs, ((F.size(devs) + 1) / 2).cast("int"))
                thr = median + F.lit(mad_multiplier) * mad * F.lit(1.4826)
            else:  # iqr
                iqr = F.element_at("_q", 3) - F.element_at("_q", 1)
                thr = F.element_at("_q", 3) + F.lit(iqr_multiplier) * iqr
            summary_cols[f"{prefix}duration_median_ns"] = F.when(gate, median.cast("long"))
            summary_cols[f"{prefix}outlier_count"] = F.when(
                gate, F.size(F.filter("_durs", lambda d: d.cast("double") > thr)).cast("long")
            )
        sel = [F.col(f"_tpl.{c}").alias(c) for c in cand.columns if c not in summary_cols]
        sel += [v.alias(k) for k, v in summary_cols.items()]
        summaries = grouped.select(*sel)
        removed_map = grouped.select(
            F.col(f"_tpl.{trace_col}").alias("_rt"),
            F.explode("_members").alias("_rid"),
            sid.alias("_rsum"),
        )
        return summaries, removed_map

    leaves = is_leaf_join(work)
    summaries, removed_map = aggregate_level(leaves, min_spans_to_aggregate)
    all_summaries = summaries
    all_removed = removed_map

    depth = 0
    survivors = work.join(
        all_removed.select(F.col("_rt").alias(trace_col), F.col("_rid").alias(span_id_col)),
        [trace_col, span_id_col],
        "left_anti",
    )
    max_depth = max_parent_depth if max_parent_depth >= 0 else 64
    while depth < max_depth:
        depth += 1
        # a parent is eligible when it HAS children and every child is removed
        kids = work.select(
            F.col(trace_col).alias("_kt"), F.col(parent_col).alias("_kp"),
            F.col(span_id_col).alias("_kid"),
        ).filter(F.col("_kp").isNotNull() & (F.col("_kp") != ""))
        kid_status = kids.join(
            all_removed.select(F.col("_rt").alias("_kt"), F.col("_rid").alias("_kid"),
                               F.lit(1).alias("_gone")),
            ["_kt", "_kid"], "left",
        ).groupBy("_kt", "_kp").agg(
            (F.count(F.lit(1)) == F.sum(F.coalesce(F.col("_gone"), F.lit(0)))).alias("_all_gone")
        ).filter("_all_gone")
        cand = survivors.join(
            kid_status.select(F.col("_kt").alias(trace_col), F.col("_kp").alias(span_id_col)),
            [trace_col, span_id_col],
        ).filter(F.coalesce(F.col(parent_col), F.lit("")) != "")  # never roots
        lvl_sum, lvl_removed = aggregate_level(cand, 2)
        if lvl_sum.isEmpty():
            break
        all_summaries = all_summaries.unionByName(lvl_sum)
        all_removed = all_removed.unionByName(lvl_removed)
        survivors = survivors.join(
            lvl_removed.select(F.col("_rt").alias(trace_col), F.col("_rid").alias(span_id_col)),
            [trace_col, span_id_col], "left_anti",
        )

    # re-parent: any surviving/summary span whose parent was removed points
    # at the parent's summary (executeAggregations' top-down parent wiring)
    parent_fix = all_removed.select(
        F.col("_rt").alias(trace_col), F.col("_rid").alias("_old_parent"),
        F.col("_rsum").alias("_new_parent"),
    )

    def reparent(df: DataFrame) -> DataFrame:
        out = df.join(
            F.broadcast(parent_fix),
            (df[trace_col] == parent_fix[trace_col]) & (df[parent_col] == F.col("_old_parent")),
            "left",
        ).drop(parent_fix[trace_col])
        return out.withColumn(
            parent_col, F.coalesce(F.col("_new_parent"), F.col(parent_col))
        ).drop("_old_parent", "_new_parent")

    survivors = survivors.withColumn(f"{prefix}is_summary", F.lit(False))
    out = survivors.unionByName(all_summaries, allowMissingColumns=True)
    out = reparent(out)
    return out.drop("_gkey", "_pname", "_dur")
