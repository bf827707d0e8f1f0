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


def test_enrich_is_broadcast_not_shuffle(spark, tokens_path):
    from opentelemetry_collector_contrib_spark.plans import pipeline as pl

    raw = tok.read_tokens(spark, tokens_path)
    routed = pl.LogPipeline(spark).route(pl.enrich_stage(spark, pl.parse_stage(raw)))
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


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
