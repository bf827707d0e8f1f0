"""Inline unsupervised anomaly detection — isolation forest.

Reference: ``processor/isolationforestprocessor`` — embeds an isolation
forest that learns normal behaviour from a sliding window of recent
telemetry and tags/scores/drops anomalies in flight (README; scoring
``isolation_forest.go:242-270``: score = 2^(−avg_path/c(n)); outputs
``processor.go:439-445``: ``anomaly.isolation_score`` double +
``anomaly.is_anomaly`` bool, modes enrich/filter/both; per-entity models
keyed by resource/attribute ``features``; dynamic threshold = the
(1 − contamination_rate) quantile of recent scores, config.go:80-104).

Spark-first mapping (NOT the reference's per-point online mutation): the
algorithm is the public iForest construction (Liu, Ting, Zhou — ICDM 2008).

* **global model** — the same bounded-driver-fit + broadcast recipe as our
  IVF coarse quantizer (``similarity.train_ivf_centroids``): fit
  ``forest_size`` trees on a ≤``window_size``-row sample driver-side (pure
  numpy, seeded), broadcast the flattened node arrays inside a pandas UDF,
  score every row vectorized (≤ ceil(log2(subsample))+1 routing steps per
  tree per Arrow batch). Scales: driver state is bounded, scoring is
  embarrassingly parallel, no shuffle.
* **per-entity models** (``group_keys``) — one ``applyInPandas`` per
  entity group: each group fits on ≤``window_size`` of ITS rows and scores
  itself, mirroring the reference's per-feature-group forests. Shuffles
  once on the entity key; a group's cost is bounded by that entity's
  volume (documented skew caveat — entity keys are operator-chosen
  low-cardinality dimensions like service.name).
* threshold — explicit ``anomaly_threshold``, or the
  (1 − contamination_rate) quantile of this batch's scores
  (``percentile_approx`` globally / exact numpy quantile per group).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SCORE_COL = "anomaly.isolation_score"
FLAG_COL = "anomaly.is_anomaly"

_EULER = 0.5772156649015329


def _c(n: int) -> float:
    """Average path length of an unsuccessful BST search over n points —
    the iForest normalizer c(n) (Liu et al. 2008, eq. 1)."""
    if n <= 1:
        return 0.0
    if n == 2:
        return 1.0
    h = math.log(n - 1) + _EULER
    return 2.0 * h - 2.0 * (n - 1) / n


def fit_isolation_forest(
    X: np.ndarray, forest_size: int = 100, subsample_size: int = 256, seed: int = 7
):
    """Fit an isolation forest on a bounded sample; returns flattened trees.

    Each tree: grown on a ``subsample_size`` random subsample; at each node
    a uniform-random feature and a uniform-random split between that node's
    min and max; recursion stops at isolation, constant values, or depth
    ceil(log2(subsample)). Nodes are stored as parallel int/float arrays
    (feature, threshold, left-child, right-child, leaf-size) so scoring is
    array indexing, not object traversal.
    """
    X = np.asarray(X, dtype=np.float64)
    n, d = X.shape
    sub = min(subsample_size, n)
    max_depth = max(1, math.ceil(math.log2(max(sub, 2))))
    rng = np.random.default_rng(seed)
    trees = []
    for _ in range(forest_size):
        idx = rng.choice(n, size=sub, replace=False)
        feat, thr, left, right, size = [], [], [], [], []

        def build(rows: np.ndarray, depth: int) -> int:
            node = len(feat)
            feat.append(-1)
            thr.append(0.0)
            left.append(-1)
            right.append(-1)
            size.append(len(rows))
            if len(rows) <= 1 or depth >= max_depth:
                return node
            lo = X[rows].min(axis=0)
            hi = X[rows].max(axis=0)
            splittable = np.nonzero(hi > lo)[0]
            if len(splittable) == 0:
                return node
            f = int(rng.choice(splittable))
            t = float(rng.uniform(lo[f], hi[f]))
            mask = X[rows, f] < t
            feat[node] = f
            thr[node] = t
            left[node] = build(rows[mask], depth + 1)
            right[node] = build(rows[~mask], depth + 1)
            return node

        build(idx, 0)
        trees.append(
            (
                np.array(feat, dtype=np.int32),
                np.array(thr, dtype=np.float64),
                np.array(left, dtype=np.int32),
                np.array(right, dtype=np.int32),
                np.array(size, dtype=np.int32),
            )
        )
    return trees, sub


def score_isolation_forest(X: np.ndarray, trees, subsample: int) -> np.ndarray:
    """Vectorized scores in [0, 1]: 2^(−E[h(x)]/c(subsample)).

    Per tree, every row is routed simultaneously: one (rows,) node-index
    vector updated max_depth times via fancy indexing — no per-row Python.
    Leaf contribution = depth + c(leaf_size) (the standard unexplored-
    subtree credit).
    """
    X = np.asarray(X, dtype=np.float64)
    m = len(X)
    total = np.zeros(m)
    cs = {}

    def c_cached(n_arr: np.ndarray) -> np.ndarray:
        out = np.empty(len(n_arr))
        for i, v in enumerate(n_arr):
            if v not in cs:
                cs[v] = _c(int(v))
            out[i] = cs[v]
        return out

    for feat, thr, left, right, size in trees:
        node = np.zeros(m, dtype=np.int32)
        depth = np.zeros(m)
        active = feat[node] >= 0
        while active.any():
            rows = np.nonzero(active)[0]
            f = feat[node[rows]]
            t = thr[node[rows]]
            go_left = X[rows, f] < t
            nxt = np.where(go_left, left[node[rows]], right[node[rows]])
            node[rows] = nxt
            depth[rows] += 1
            active = feat[node] >= 0
        total += depth + c_cached(size[node])
    avg = total / len(trees)
    denom = _c(subsample) or 1.0
    return np.power(2.0, -avg / denom)


def _score_udf(trees, subsample: int, feature_cols: list[str]):
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def score(*cols):
        X = np.column_stack([c.to_numpy(dtype=np.float64) for c in cols])
        X = np.nan_to_num(X, nan=0.0, posinf=0.0, neginf=0.0)
        return pd.Series(score_isolation_forest(X, trees, subsample))

    return score


def log_anomaly_features(
    df: DataFrame,
    body_col: str = "body",
    ts_col: str = "observed_timestamp",
    severity_col: str = "severity_number",
    source_col: str | None = None,
) -> DataFrame:
    """The reference's log feature set as Columns (processor.go:662-698):
    ``severity_number`` (as-is), ``message_length`` = len(body),
    ``timestamp_gap`` = seconds since the previous record of the same
    source — the reference's per-source last-timestamp map is a lag window
    here (first record per source gets 0, where the reference omits the
    feature)."""
    out = df.withColumn("message_length", F.length(body_col).cast("double")).withColumn(
        "severity_f", F.col(severity_col).cast("double")
    )
    w = Window.partitionBy(source_col if source_col else F.lit(1)).orderBy(ts_col)
    gap = (
        F.unix_micros(F.col(ts_col).cast("timestamp"))
        - F.unix_micros(F.lag(F.col(ts_col).cast("timestamp")).over(w))
    ) / 1_000_000.0
    return out.withColumn("timestamp_gap", F.coalesce(gap, F.lit(0.0)))


def categorical_encode(col) -> "F.Column":
    """Deterministic categorical → [0, 1) encoding (processor.go:734-741
    hashes with FNV-64a / maxuint; same semantics, engine hash family)."""
    return (F.xxhash64(col).cast("double") / F.lit(float(2**64))) + F.lit(0.5)


def isolation_forest(
    df: DataFrame,
    feature_cols: list[str],
    mode: str = "enrich",
    forest_size: int = 100,
    subsample_size: int = 256,
    window_size: int = 1000,
    anomaly_threshold: float | None = None,
    contamination_rate: float = 0.10,
    group_keys: list[str] | None = None,
    seed: int = 7,
    score_col: str = SCORE_COL,
    flag_col: str = FLAG_COL,
) -> DataFrame:
    """Score (and optionally drop) anomalies with an isolation forest.

    ``mode``: ``enrich`` adds ``score_col`` + ``flag_col``; ``filter``
    drops flagged rows (and the helper columns); ``both`` adds the columns
    AND drops flagged rows (config.go:135).
    """
    if mode not in ("enrich", "filter", "both"):
        raise ValueError(f"unknown mode {mode!r}")
    # the reference attribute names carry dots — quote every parsed access
    q_score, q_flag = f"`{score_col}`", f"`{flag_col}`"

    if group_keys:
        import pandas as pd

        schema_df = df.withColumn(score_col, F.lit(0.0)).withColumn(flag_col, F.lit(True))
        thr, contam = anomaly_threshold, contamination_rate
        fs, ss, ws, sd = forest_size, subsample_size, window_size, seed
        fcols = list(feature_cols)

        def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
            import zlib

            # deterministic per-entity seed: same group → same model
            # (zlib.crc32, NOT hash() — Python string hashing is salted
            # per process and would give every worker a different model)
            gkey = "\x00".join(str(pdf[k].iloc[0]) for k in group_keys)
            gseed = (sd + zlib.crc32(gkey.encode())) % (2**32)
            X = pdf[fcols].to_numpy(dtype=np.float64)
            X = np.nan_to_num(X, nan=0.0, posinf=0.0, neginf=0.0)
            fit_rows = X[:ws]
            trees, sub = fit_isolation_forest(fit_rows, fs, ss, gseed)
            scores = score_isolation_forest(X, trees, sub)
            t = thr if thr is not None else float(np.quantile(scores, 1.0 - contam))
            pdf[score_col] = scores
            pdf[flag_col] = scores >= t
            return pdf

        out = df.groupBy(*group_keys).applyInPandas(per_group, schema_df.schema)
    else:
        sample = np.array(
            df.select(*feature_cols).limit(window_size).collect(), dtype=np.float64
        )
        sample = np.nan_to_num(sample, nan=0.0, posinf=0.0, neginf=0.0)
        trees, sub = fit_isolation_forest(sample, forest_size, subsample_size, seed)
        udf = _score_udf(trees, sub, feature_cols)
        out = df.withColumn(score_col, udf(*[F.col(c) for c in feature_cols]))
        if anomaly_threshold is None:
            # dynamic threshold = (1 − contamination) quantile of this
            # batch's scores (config.go contamination_rate): one tiny agg,
            # broadcast back as a literal
            t = out.agg(
                F.percentile_approx(F.col(q_score), 1.0 - contamination_rate).alias("t")
            ).collect()[0]["t"]
        else:
            t = anomaly_threshold
        out = out.withColumn(flag_col, F.col(q_score) >= F.lit(float(t)))

    if mode == "filter":
        return out.filter(~F.col(q_flag)).drop(score_col, flag_col)
    if mode == "both":
        return out.filter(~F.col(q_flag))
    return out
