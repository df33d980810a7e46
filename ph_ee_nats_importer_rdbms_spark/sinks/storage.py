"""Analytical table store: bucketed parquet tables for shuffle-free reads
(the Delta/warehouse mirror of the JDBC sink, SURVEY §7 step 5).

The read path's hottest join is TransferDetail
(entity/transfer/TransferDetail.java:9-12): transfers ⋈ tasks ⋈ variables
on ``workflow_instance_key``. At 100 TB the three tables are all large, so
broadcasting is out and a plain join shuffles all of them on every query.
Writing them **bucketed by the join key** (``bucketBy(N,
"workflow_instance_key")`` + ``sortBy``) pays that shuffle once at write
time; every later key-join and per-instance aggregation over the stored
tables is exchange-free (Catalyst sees the bucketing and drops the
Exchange; with sorted buckets SortMergeJoin also skips the sort).

Bucket count guidance: ``total_table_bytes / 128MB`` rounded to a power of
two, identical across the co-bucketed tables — equal counts are required
for the exchange-free join.
"""

from __future__ import annotations

import os
import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession

JOIN_KEY = "workflow_instance_key"

# tables co-bucketed on the instance key; tenant config stays unbucketed
BUCKETED = ("transfers", "transaction_requests", "batches", "tasks", "variables")


def save_bucketed_tables(
    tables: dict[str, DataFrame],
    num_buckets: int = 8,
    prefix: str = "ph_",
    path_root: str | None = None,
) -> list[str]:
    """Persist pipeline output tables to the session catalog, bucketed and
    sorted by ``workflow_instance_key``. Returns the created table names.

    Equivalent DDL: ``CREATE TABLE ph_transfers ... USING parquet
    CLUSTERED BY (workflow_instance_key) SORTED BY (workflow_instance_key)
    INTO <n> BUCKETS``.

    ``path_root``: write each table as an EXTERNAL table at
    ``<path_root>/<name>`` instead of a managed warehouse table — the
    files outlive the session and :func:`register_bucketed_tables` can
    re-attach them in a fresh session without rewriting a row (the
    warehouse pattern: bucketed data is durable, catalogs are cheap).
    """
    created = []
    for name, df in tables.items():
        table = f"{prefix}{name}"
        # a fresh session's in-memory catalog does not know about a previous
        # run's managed-table directory, so DROP alone cannot clear it and
        # CREATE fails with LOCATION_ALREADY_EXISTS; with a persistent
        # metastore the DROP is sufficient and the rmtree never fires
        spark = df.sparkSession
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        if path_root is None:
            wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
            stale = os.path.join(wh, table.lower())
            if wh and os.path.isdir(stale):
                shutil.rmtree(stale)
        bucketed = name in BUCKETED and JOIN_KEY in df.columns
        if bucketed:
            # pre-shuffle by the bucket key into num_buckets partitions
            # (r13, guide §6): bucketBy splits each WRITER TASK's rows by
            # bucket id, so an unaligned input writes (input partitions ×
            # buckets) files — observed 80-128 ≈6 KB files per table;
            # hash-repartitioned input gives each task whole buckets and
            # the layout collapses to num_buckets files per table. The
            # shuffle is paid once at save time, bucket assignment and
            # row content are unchanged.
            df = df.repartition(num_buckets, df[JOIN_KEY])
        writer = df.write.mode("overwrite").format("parquet")
        if path_root is not None:
            writer = writer.option("path", os.path.join(path_root, name))
        if bucketed:
            writer = writer.bucketBy(num_buckets, JOIN_KEY).sortBy(JOIN_KEY)
        writer.saveAsTable(table)
        created.append(table)
    return created


def register_bucketed_tables(
    spark: SparkSession,
    names: tuple[str, ...],
    path_root: str,
    num_buckets: int = 8,
    prefix: str = "ph_",
) -> bool:
    """Re-attach existing bucketed parquet directories (written by
    :func:`save_bucketed_tables` with ``path_root``) as external bucketed
    tables in THIS session's catalog — pure DDL, no data rewrite. The
    bucket spec in the DDL must match the writer's (bucket ids live in the
    file names); ``num_buckets``/``prefix`` therefore mirror the save call.
    Returns False (registering nothing) unless every directory has its
    ``_SUCCESS`` marker."""
    paths = {n: os.path.join(path_root, n) for n in names}
    if not all(
        os.path.exists(os.path.join(p, "_SUCCESS")) for p in paths.values()
    ):
        return False
    for name, p in paths.items():
        table = f"{prefix}{name}"
        schema = spark.read.parquet(p).schema
        cols = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
        )
        bucket_clause = (
            f"CLUSTERED BY ({JOIN_KEY}) SORTED BY ({JOIN_KEY}) "
            f"INTO {num_buckets} BUCKETS"
            if name in BUCKETED and any(f.name == JOIN_KEY for f in schema.fields)
            else ""
        )
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        spark.sql(
            f"CREATE TABLE {table} ({cols}) USING parquet {bucket_clause} "
            f"LOCATION '{p}'"
        )
    return True


def transfer_detail(spark: SparkSession, prefix: str = "ph_") -> DataFrame:
    """TransferDetail over the stored tables: transfer + its tasks + its
    variables (SURVEY §2.6 Q7). On bucketed tables this plans with zero
    Exchange operators — verify with ``detail.explain()``."""
    t = spark.table(f"{prefix}transfers")
    k = spark.table(f"{prefix}tasks").withColumnRenamed("type", "task_type")
    v = spark.table(f"{prefix}variables")
    return (
        t.join(k.select(JOIN_KEY, "element_id", "intent", "task_type"), JOIN_KEY, "left")
        .join(v.select(JOIN_KEY, "name", "value"), JOIN_KEY, "left")
    )


def save_time_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str = "timestamp",
    mode: str = "overwrite",
) -> None:
    """Write an event-log table (variables/tasks) partitioned by event day.

    The append-only logs are naturally time-ordered; partitioning the lake
    mirror by ``event_day`` makes every time-ranged read partition-pruned —
    at 100 TB a dashboard's "last 24h" query opens 1/Nth of the files, and
    the pruning shows up as PartitionFilters in the scan (asserted by
    tests/test_sinks_sources.py). ``ts_col`` is epoch millis (the
    reference's raw Zeebe timestamp).

    ``mode``: ``overwrite`` replaces the WHOLE path (full re-mirror);
    incremental mirrors pass ``overwrite_dynamic`` (replace only the
    event_day partitions present in ``df``, leaving earlier days intact) or
    ``append``."""
    from pyspark.sql import functions as F

    out = df.withColumn(
        "event_day",
        F.date_format(F.timestamp_millis(F.col(ts_col)), "yyyy-MM-dd"),
    )
    writer = out.write
    if mode == "overwrite_dynamic":
        writer = writer.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        )
    else:
        writer = writer.mode(mode)
    writer.partitionBy("event_day").parquet(path)
