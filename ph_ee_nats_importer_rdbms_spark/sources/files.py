"""Batch file sources for the driver-generated parquet tables (TESTDATA.md)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # Normalize events.ts across driver testdata vintages to TIMESTAMP_LTZ:
    # - TIMESTAMP(NANOS) parquet arrives as long nanos under
    #   spark.sql.legacy.parquet.nanosAsLong -> integer-divide to micros
    # - timestamp[us] without timezone arrives as TIMESTAMP_NTZ -> cast;
    #   session TZ is UTC so the wall clock is preserved, matching how
    #   DuckDB's epoch_ms() treats the same naive value
    for field in df.schema.fields:
        if field.name != "ts":
            continue
        kind = field.dataType.simpleString()
        if kind == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts DIV 1000").cast("long"))
            )
        elif kind == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition up to the session's default parallelism.

    The bench-SF tables are single parquet files, so their scans come back
    as ONE partition — and every narrow chain downstream (explode + hash,
    per-gram substring, vector arithmetic) inherits that and runs on one
    core until the first shuffle. Callers with such a chain spread the
    scan first; a no-op (plan-wise cheap) when the scan already has enough
    splits, so on a real multi-file cluster layout this never *reduces*
    parallelism."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= par:
        return df
    return df.repartition(par)


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> None:
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
