"""SparkSession factory.

The reference forces GMT process-wide (DatabaseImporterApplication.java:14-17);
we mirror that with ``spark.sql.session.timeZone=UTC``. Everything else is
scale hygiene: AQE for runtime re-planning (skew joins, partition coalescing),
Arrow for the few Pandas-UDF paths, shuffle partitions sized to the test
harness but overridable for a real cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


#: Runtime-settable SQL confs every entry point needs regardless of who
#: built the SparkSession (the driver harness builds its own).
RUNTIME_CONF = {
    "spark.sql.session.timeZone": "UTC",
    # driver testdata stores TIMESTAMP(NANOS) parquet, which Spark does not
    # read natively; surface as long + convert in sources.files
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply RUNTIME_CONF to an externally-built session (idempotent)."""
    for k, v in RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # noqa: BLE001 — static conf on some builds; keep going
            pass
    return spark


def build_session(
    app_name: str = "ph-ee-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    # Shuffle width defaults to the thread count (right for the bench
    # SFs), but MUST grow with the corpus: per-task aggregate state is
    # ~data/partitions, and a 1000x corpus over 32 partitions is a
    # multi-GB-per-task OOM (observed at sf100 in dup_ngram_frac's
    # (doc, gram) collapse). SPARK_GRAFT_SHUFFLE_PARTITIONS is the
    # single-box analog of sizing spark.sql.shuffle.partitions for the
    # cluster; AQE coalesces the excess on small stages either way.
    shuffle = str(
        shuffle_partitions
        or int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
    )
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # driver testdata stores TIMESTAMP(NANOS) parquet, which Spark does
        # not read natively; surface as long + convert in sources.files
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        # single-JVM local mode shares one heap between "driver" and all
        # 32 executor threads; at the 100x bench corpora a full staging
        # session (zeebe re-import + the incremental-store builds) OOMs
        # a 16g heap while the box carries 128 GiB — 48g leaves ample OS
        # page-cache headroom. On a real cluster this maps to executor
        # memory, not driver memory.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
