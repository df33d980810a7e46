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


def compact_for_write(df: DataFrame, *cols: str) -> DataFrame:
    """Size output files with AQE before a parquet write (guide §6
    "small files hurt twice"): a map-only artifact write otherwise emits
    one file per input partition (observed: 32 ≈8 KB files per staged
    store artifact, ~1,200 files for an 11 MB store tree), and every
    downstream scan pays per-file opens + driver listing. The REBALANCE
    hint inserts an exchange whose output partitioning AQE derives from
    the data's actual size (``advisoryPartitionSizeInBytes``) — tiny
    relations coalesce to one file, 100 TB relations keep hundreds of
    advisory-sized files. Scale-adaptive by construction: nothing here
    is tuned to local[32].

    With ``cols``, rebalancing is keyed (REBALANCE(c1, ...)) so rows
    cluster by the columns a hive-``partitionBy`` write splits on — one
    writer task then holds whole partition-directories and each
    directory gets ~one advisory-sized file instead of one per task."""
    return df.hint("rebalance", *[F.col(c) for c in cols])


def local_rel(spark: SparkSession, rows: list, schema) -> DataFrame:
    """A config-sized relation as a driver-local ``LocalTableScan``
    (guide §4.1): plain ``createDataFrame(list)`` builds a
    python-RDD-backed plan whose ``Scan ExistingRDD`` re-runs a Python
    worker round trip on EVERY execution (~0.3 s measured for a 10-row
    relation); the Arrow path embeds the rows in the plan, so repeated
    executions (the serving shape — those plans are memoized) read them
    driver-local with zero tasks. Values are bit-identical: Python
    floats ARE IEEE doubles and Arrow transports them unchanged. Falls
    back to the plain path if Arrow rejects the schema or rows."""
    import pandas as pd

    try:
        cols = [f.name for f in schema.fields] if hasattr(schema, "fields") else None
        if cols is None:
            raise ValueError("string schemas take the plain path")
        pdf = pd.DataFrame(
            {c: [r[i] for r in rows] for i, c in enumerate(cols)}
        )
        out = spark.createDataFrame(pdf, schema)
        # defensive: only serve the Arrow shape if it really became a
        # local relation (a silent fallback keeps the python-RDD plan)
        if "LocalTableScan" in out._jdf.queryExecution().executedPlan().toString():  # noqa: SLF001
            return out
    except Exception:  # noqa: BLE001 — fall back to the plain path
        pass
    return spark.createDataFrame(rows, schema)


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> None:
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
