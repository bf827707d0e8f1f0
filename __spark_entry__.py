"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship parse→severity→route→count query on
sf0.001; ``queries()``/``oracle_sql()`` expose the operator catalog from
``opentelemetry_collector_contrib_spark.plans.catalog`` (one entry per
implemented operator from SURVEY.md §2, each with a DuckDB oracle where
SQL-expressible).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from opentelemetry_collector_contrib_spark.plans import catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: JSON parse → severity map → first-match route → per-sink
    counts over events (the collector's logs path in miniature)."""
    from pyspark.sql import functions as F

    from opentelemetry_collector_contrib_spark.operators import connectors, parsers

    sf_dir = "/root/testdata/sf0.001"
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    df = parsers.json_parser(df, "k int", parse_from="props", parse_to="j")
    df = parsers.severity_parser(df, parse_from="event_type")
    routed = connectors.routed_frame(
        df,
        [
            connectors.Route("sink_errors", F.col("severity_number") >= 17),
            connectors.Route("sink_big", F.col("value") > 150),
        ],
    )
    return routed.groupBy("route_id", "severity_text").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(F.col("value").cast("decimal(18,2)")) * 100)
        .cast("bigint")
        .alias("total_value_cents"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(catalog.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(catalog.ORACLES)
