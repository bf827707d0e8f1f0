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
    df: DataFrame,
    percent: float,
    key: str = "doc_id",
    seed: int = 22,
    mode: str = "hash_seed",
    threshold_col: str | None = None,
    randomness_col: str | None = None,
) -> DataFrame:
    """Hash-based consistent sampling — deterministic and re-runnable.

    Reference: ``processor/probabilisticsamplerprocessor`` (logsprocessor.go
    + sampler_mode.go), on the W3C 56-bit threshold model: a record carries
    randomness R ∈ [0, 2^56) (explicit ``sampling.randomness`` or hashed
    from ``key``) and optionally an incoming threshold T_in
    (``sampling.threshold``); kept iff R >= T_out.

    Modes (sampler_mode.go:243-300):
      hash_seed:    T_out = (1 - p) * 2^56 — ignores incoming threshold
      equalizing:   T_out = max(T_in, T_mode) — raises to a fixed value
      proportional: p_out = p_in * p — scales the incoming probability

    Output keeps rows AND updates ``sampling_threshold`` so downstream
    samplers compose, exactly the carrier updateThreshold contract.
    """
    S = 1 << 56
    t_mode = int(round((1.0 - percent / 100.0) * S))
    if randomness_col:
        rnd = F.conv(F.col(randomness_col), 16, 10).cast("decimal(20,0)").cast("long")
    else:
        rnd = F.pmod(F.xxhash64(F.col(key), F.lit(seed)), F.lit(S))
    t_in = (
        F.coalesce(F.col(threshold_col), F.lit(0)).cast("long")
        if threshold_col and threshold_col in df.columns
        else F.lit(0).cast("long")
    )
    if mode == "hash_seed":
        t_out = F.lit(t_mode).cast("long")
    elif mode == "equalizing":
        t_out = F.greatest(t_in, F.lit(t_mode))
    elif mode == "proportional":
        # p_out = p_in * ratio ⇒ T_out = 2^56 - (2^56 - T_in) * ratio
        ratio = percent / 100.0
        t_out = (F.lit(S) - ((F.lit(S) - t_in) * F.lit(ratio))).cast("long")
    else:
        raise ValueError(f"unknown sampler mode {mode!r}")
    out = df.withColumn("_rnd", rnd).withColumn("sampling_threshold", t_out)
    return out.filter(F.col("_rnd") >= F.col("sampling_threshold")).drop("_rnd")


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
    ignored_keys: list[str] | None = None,
    allowed_values: list[str] | None = None,
    blocked_key_patterns: list[str] | None = None,
    summary: str | None = None,
) -> DataFrame:
    """Redaction over a map<string,string> attributes column.

    Reference: ``processor/redactionprocessor/processor.go:330-381`` decision
    sequence per attribute: ignored_keys are untouchable; keys outside
    allowed_keys are REDACTED (removed); surviving values matching
    allowed_values skip masking; keys matching blocked_key_patterns mask
    wholesale; values matching blocked_values mask the MATCHED substring.

    ``summary`` ∈ {None, "info", "debug"} adds the diagnostic attributes of
    addMetaAttrs (processor.go:416-437, names :584-589):
    info ⇒ redaction.{redacted,masked,allowed,ignored}.count; debug adds the
    sorted .keys lists (ignored has a count only). Counts are string-typed
    here (map<string,string> model). Everything is pure Column math.

    Single-pass plan: one ``map_entries → transform`` computes a per-entry
    (key, value, category) struct array — every ignored/allowed/blocked
    regex chain runs exactly once per entry. The output map and all four
    summary categories are derived from that array. The annotated array is
    materialized as its own projection column; HOF lambdas are interpreted
    without common-subexpression elimination, and CollapseProject won't
    inline a non-cheap expression referenced more than once, so the
    annotation is computed once per row no matter how many consumers read it.
    """
    col = F.col(attr_col)

    # entry categories, in the reference's decision order (processor.go:330-381)
    IGN, RED, ALLOW, KEYMASK, VALMASK, KEPT = 0, 1, 2, 3, 4, 5

    def _any_match(v, pats):
        cond = F.lit(False)
        for p in pats or []:
            cond = cond | v.rlike(p)
        return cond

    def category(k, v):
        if ignored_keys:
            ign = F.array_contains(F.array(*[F.lit(x) for x in ignored_keys]), k)
        else:
            ign = F.lit(False)
        if allowed_keys is None:
            red = F.lit(False)
        else:
            red = ~F.array_contains(F.array(*[F.lit(x) for x in allowed_keys]), k)
        return (
            F.when(ign, F.lit(IGN))
            .when(red, F.lit(RED))
            .when(_any_match(v, allowed_values), F.lit(ALLOW))
            .when(_any_match(k, blocked_key_patterns), F.lit(KEYMASK))
            .when(_any_match(v, blocked_values), F.lit(VALMASK))
            .otherwise(F.lit(KEPT))
        )

    ann_col = f"_redann_{attr_col}"
    ann_expr = F.transform(
        F.map_entries(col),
        lambda e: F.struct(
            e["key"].alias("k"), e["value"].alias("v"),
            category(e["key"], e["value"]).alias("c"),
        ),
    )
    df = df.withColumn(ann_col, ann_expr)
    ann = F.col(ann_col)

    def masked_value(s):
        rep = s["v"]
        for p in blocked_values or []:
            rep = F.regexp_replace(rep, p, mask)
        return (
            F.when(s["c"] == KEYMASK, F.lit(mask))
            .when(s["c"] == VALMASK, rep)
            .otherwise(s["v"])
        )

    out_map = F.map_from_entries(
        F.transform(
            F.filter(ann, lambda s: s["c"] != RED),
            lambda s: F.struct(s["k"].alias("key"), masked_value(s).alias("value")),
        )
    )

    drop_cols = [ann_col]
    if summary in ("info", "debug"):
        cats = [
            ("redaction.redacted", lambda s: s["c"] == RED, True),
            ("redaction.masked", lambda s: (s["c"] == KEYMASK) | (s["c"] == VALMASK), True),
            ("redaction.allowed", lambda s: s["c"] == ALLOW, True),
            ("redaction.ignored", lambda s: s["c"] == IGN, False),  # count only
        ]
        add_entries = []
        for i, (name, pred, with_keys) in enumerate(cats):
            # each category's sorted key array is referenced 2-3× (count
            # guard, joined list, count) — materialize it once per row
            # (the r5 inline form ran 14 filter+transform+array_sort
            # chains per row; now 4)
            kc = f"_redkeys{i}_{attr_col}"
            df = df.withColumn(
                kc, F.array_sort(F.transform(F.filter(ann, pred), lambda s: s["k"]))
            )
            drop_cols.append(kc)
            keys = F.col(kc)
            cnt = F.size(keys)
            if summary == "debug" and with_keys:
                add_entries.append((F.lit(f"{name}.keys"), F.when(cnt > 0, F.array_join(keys, ","))))
            add_entries.append((F.lit(f"{name}.count"), F.when(cnt > 0, cnt.cast("string"))))
        addition = F.map_filter(
            F.map_from_arrays(
                F.array(*[k for k, _ in add_entries]),
                F.array(*[v for _, v in add_entries]),
            ),
            lambda k, v: v.isNotNull(),
        )
        out_map = F.map_concat(out_map, addition)
    return df.withColumn(attr_col, out_map).drop(*drop_cols)


def group_by_attrs(df: DataFrame, keys: list[str]) -> DataFrame:
    """groupbyattrs — re-group/compact batches by attribute key.

    Reference: ``processor/groupbyattrsprocessor/processor.go:63-100``. In the
    flat model this is physical-layout-only: repartition by the keys so
    downstream per-resource writes are co-located.
    """
    return df.repartition(*[F.col(k) for k in keys])
