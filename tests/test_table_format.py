"""Table-format switch (sources/table_format.py): parquet default in this
sandbox, Iceberg branch exercised when the runtime jar is present."""

import pytest

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.sources.table_format import (
    default_format,
    iceberg_available,
    read_dataset,
    write_dataset,
)


def test_parquet_roundtrip_default(spark, tmp_path):
    assert default_format() == "parquet"
    df = spark.range(100).withColumn("part", (F.col("id") % 4).cast("int"))
    p = str(tmp_path / "tbl")
    write_dataset(df, p, partition_by=["part"])
    back = read_dataset(spark, p)
    assert back.count() == 100
    # hive partition layout → partition pruning on read
    assert back.filter("part = 2").count() == 25


def test_invalid_format_rejected(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_TABLE_FORMAT", "delta")
    with pytest.raises(ValueError, match="SPARK_GRAFT_TABLE_FORMAT"):
        default_format()


def test_iceberg_roundtrip_when_available(spark, tmp_path):
    """The `fmt=iceberg` branch against a path-based Iceberg table. Skips in
    environments without iceberg-spark-runtime on the classpath (this
    sandbox); on a real cluster the same pipeline writers run unchanged with
    SPARK_GRAFT_TABLE_FORMAT=iceberg."""
    if not iceberg_available(spark):
        pytest.skip("iceberg-spark-runtime not on the classpath")
    df = spark.range(50).withColumn("part", (F.col("id") % 2).cast("int"))
    p = str(tmp_path / "ice_tbl")
    write_dataset(df, p, fmt="iceberg", partition_by=["part"])
    back = read_dataset(spark, p, fmt="iceberg")
    assert back.count() == 50
