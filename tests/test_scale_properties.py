"""Scale-property tests: salting preserves counts, plans stay broadcast/pushed,
lineage resume is idempotent at stage granularity."""

import re

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.plans.pipeline import salted_repartition
from opentelemetry_collector_contrib_spark.sources import tokens as tok


def test_salted_repartition_preserves_counts(spark, tokens_path):
    df = tok.read_tokens(spark, tokens_path)
    before = {r.source: r["count"] for r in df.groupBy("source").count().collect()}
    salted = salted_repartition(df, "source", 8, salt_buckets=4)
    after = {r.source: r["count"] for r in salted.groupBy("source").count().collect()}
    assert before == after
    # the hot key is actually spread over >1 partition
    spread = (
        salted.withColumn("p", F.spark_partition_id())
        .filter(F.col("source") == "noisy-svc")
        .select("p")
        .distinct()
        .count()
    )
    assert spread > 1


def test_scan_pushdown_and_pruning(spark, tokens_path):
    df = tok.read_tokens(spark, tokens_path).filter(F.col("source") == "app-a").select("doc_id")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EqualTo(source,app-a)" in plan
    rs = re.search(r"ReadSchema: (\S+)", plan).group(1)
    assert "tokens" not in rs  # column pruning reaches the scan


def test_enrich_is_narrow_no_shuffle(spark, tokens_path):
    """The flagship enrich must never shuffle the fact table. r6: the static
    dims are folded to constant literal maps (GetMapValue), so the stage is
    now fully narrow — zero joins of any kind and zero exchanges."""
    from opentelemetry_collector_contrib_spark.plans import pipeline as pl

    raw = tok.read_tokens(spark, tokens_path)
    routed = pl.LogPipeline(spark).route(pl.enrich_stage(spark, pl.parse_stage(raw)))
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "Join" not in plan and "Exchange" not in plan


def test_counts_aggregate_is_partial_then_final(spark, tokens_path):
    df = tok.read_tokens(spark, tokens_path).groupBy("source").count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 2  # map-side combine present


def test_lineage_stage_granularity(tmp_path):
    from opentelemetry_collector_contrib_spark.plans.lineage import LineageLog

    lg = LineageLog(str(tmp_path))
    assert not lg.completed("parse", "snap-1")
    lg.commit("parse", "snap-1", 100, 95)
    assert lg.completed("parse", "snap-1")
    assert not lg.completed("parse", "snap-2")
    assert not lg.completed("enrich", "snap-1")
    lg.commit("parse", "snap-2", 50, 50)
    # records accumulate, are re-loadable
    import json, os

    d = os.path.join(str(tmp_path), "_lineage")
    recs = [json.load(open(os.path.join(d, f))) for f in os.listdir(d)]
    assert {(r["stage"], r["fingerprint"]) for r in recs} == {("parse", "snap-1"), ("parse", "snap-2")}


def test_ngram_hot_gram_cap_stays_subquadratic(spark):
    """A universal trigram must not generate B²/2 candidate pairs: with
    max_gram_df the hot gram is dropped from candidate generation while
    genuinely-similar pairs (sharing rare grams) survive with EXACT jaccard
    (the verify step uses all grams, only generation is capped)."""
    from opentelemetry_collector_contrib_spark.operators import dedup

    B = 200
    # every doc shares the universal prefix; docs 2k/2k+1 are near-identical
    rows = []
    for i in range(B):
        tail = f"unique tail {i // 2} alpha beta gamma delta epsilon zeta"
        suffix = "" if i % 2 == 0 else " extra"
        rows.append((i, f"the end of {tail}{suffix}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    pairs_df = dedup.ngram_jaccard_pairs(
        docs, "text", "doc_id", n=3, threshold=0.5, max_gram_df=20
    )
    # physical guard: count candidate rows BEFORE the jaccard filter by
    # checking the pair frame row count — with the cap it is O(B), without
    # it the universal gram alone contributes B*(B-1)/2 = 19900 candidates
    pairs = pairs_df.collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    assert {(2 * k, 2 * k + 1) for k in range(B // 2)} <= found
    assert len(pairs) < B * 4  # sub-quadratic: no cross-product blowup
    # exactness: jaccard of a planted pair computed over ALL grams
    sample = next(r for r in pairs if (r.id_a, r.id_b) == (0, 1))
    assert sample.jaccard >= 0.5


def test_recombine_two_phase_matches_global_window(spark):
    """De-skewed (bucketed prefix-sum) sessionization must produce exactly
    the same sessions as the single global window, including sessions that
    SPAN bucket boundaries, on a 60%-skewed source distribution."""
    from pyspark.sql import functions as F

    from opentelemetry_collector_contrib_spark.operators.transformers import recombine

    rows = []
    for i in range(3000):
        src = "noisy-svc" if i % 10 < 6 else f"svc-{i % 10}"
        body = ("START line" if i % 7 == 0 else "cont line") + f" {i}"
        rows.append((src, i, body))
    df = spark.createDataFrame(rows, "source string, doc_id long, body string")
    kw = dict(
        is_first_entry=F.col("body").startswith("START"),
        source_col="source", order_col="doc_id", combine_field="body",
    )
    # span=100 forces many bucket-boundary sessions (markers every 7 ids)
    fast = recombine(df, order_bucket_span=100, **kw)
    slow = recombine(df, **kw)
    key = lambda r: (r["source"], r["doc_id"])
    a = sorted([r.asDict() for r in fast.collect()], key=key)
    b = sorted([r.asDict() for r in slow.collect()], key=key)
    assert a == b
    # skew evidence: the two-phase plan's first window partitions on
    # (source, _bkt) — the hot source is spread across buckets
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "_bkt" in plan


def test_contamination_plan_broadcasts_bench_grams(spark):
    """benchmark_contamination's gram join must be a BroadcastHashJoin (the
    benchmark side reduces to distinct 8-byte hashes) — a sort-merge join
    here would shuffle the exploded training grams at 100 TB."""
    from opentelemetry_collector_contrib_spark.operators import dedup

    train = spark.range(200).selectExpr(
        "id AS doc_id", "concat('alpha beta gamma doc ', id, ' tail words here now') AS text"
    )
    bench = spark.createDataFrame(
        [(1, "alpha beta gamma doc 7 tail words here now")], "bid long, text string"
    )
    out = dedup.benchmark_contamination(train, bench, n=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the gram-membership join itself is broadcast; only per-doc joins may
    # merge — no sort-merge on the exploded gram stream
    gram_section = plan.split("xxhash64")[0]
    assert out.count() == 200  # every training doc scored


def test_line_dedup_shuffles_hashes_not_text(spark):
    """line_dedup's document-frequency aggregate groups on the 8-byte line
    hash; the optimized plan must aggregate on _lh, never on the line text."""
    from opentelemetry_collector_contrib_spark.operators import dedup

    docs = spark.range(50).selectExpr(
        "id AS doc_id", "concat('shared header', '\n', 'unique line ', id) AS text"
    )
    out = dedup.line_dedup(docs, max_line_df=3)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # the DF aggregate's grouping key is the hash column
    assert "_lh" in plan
    got = {r.doc_id: r.text for r in out.collect()}
    assert all("shared header" not in t for t in got.values())


def test_scan_splits_probe(spark, tmp_path):
    """_t_par's split probe: pure file-size arithmetic on local paths, same
    decisions as the old df.rdd.getNumPartitions() probe (single small file
    -> 1 split -> repartition fires; files >> maxPartitionBytes -> enough
    splits -> no exchange added)."""
    from opentelemetry_collector_contrib_spark.plans import catalog

    df = spark.range(10).toDF("x")
    p = str(tmp_path / "t.parquet")
    df.write.parquet(p)
    n = catalog._scan_splits(spark, str(tmp_path), "t", spark.read.parquet(p))
    assert n == len([f for f in (tmp_path / "t.parquet").iterdir()
                     if f.name.endswith(".parquet")])
    # missing path falls back to the rdd probe without raising
    n2 = catalog._scan_splits(spark, str(tmp_path), "nope", spark.read.parquet(p))
    assert n2 >= 1
