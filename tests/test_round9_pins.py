"""Round-9 pins (VERDICT r8 task #4): delivery-time sizing on the
footer/manifest discipline.

Store appends used to launch a count() job per reported number. Sizing
now folds from the written artifacts' parquet footers (zero Spark jobs);
the only count() jobs a delivery may run are the ones whose numbers NO
footer carries — the CC size-router (one, on the staged edge list), the
measured-recall statistics (two: they ARE the measurement), and the
training store's distinct-sequence count (one). These tests pin the
budget per store by instrumenting DataFrame.count, so a re-introduced
sizing count busts the budget instead of regressing silently.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ph_ee_nats_importer_rdbms_spark.sources.files import load_table, spread


@pytest.fixture()
def count_recorder(monkeypatch):
    """Instrument DataFrame.count: every call still runs, but is
    recorded. Returns the call list (len == number of count jobs)."""
    calls: list[str] = []
    import pyspark.sql.classic.dataframe as cdf

    orig = cdf.DataFrame.count

    def recording(self, *a, **k):
        calls.append("count")
        return orig(self, *a, **k)

    monkeypatch.setattr(cdf.DataFrame, "count", recording, raising=True)
    return calls


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select("doc_id", "text")


def test_docs_store_delivery_counting_budget(
    spark, sf_dir, tmp_path, count_recorder
):
    """A doc-store append runs at most ONE count job (the CC size-router
    on the staged pair edges); the delivery stats come from footers."""
    from ph_ee_nats_importer_rdbms_spark.analytics import incremental_docs as idc

    d = _docs(spark, sf_dir)
    root = str(tmp_path / "docs")
    idc.build_index(spark, d.filter(F.col("doc_id") % 2 == 0), root)

    count_recorder.clear()
    second = d.filter(F.col("doc_id") % 2 == 1)
    stats = idc.append_batch(spark, second, root)
    assert len(count_recorder) <= 1, (
        f"{len(count_recorder)} count jobs in a doc-store delivery "
        "(budget: 1 — the CC size-router)"
    )
    # footer-derived stats are the true cardinalities
    assert stats["new_docs"] == second.count()


def test_training_store_delivery_counting_budget(
    spark, sf_dir, tmp_path, count_recorder
):
    """A pack-store append runs at most ONE count job — the distinct
    (shard, seq) count, the one number no footer carries."""
    from ph_ee_nats_importer_rdbms_spark.analytics import (
        incremental_training as it,
    )

    d = _docs(spark, sf_dir)
    root = str(tmp_path / "pack")
    it.build_pack_store(spark, d.filter(F.col("doc_id") % 2 == 0), root)

    count_recorder.clear()
    second = d.filter(F.col("doc_id") % 2 == 1)
    stats = it.append_pack_batch(spark, second, root)
    assert len(count_recorder) <= 1, (
        f"{len(count_recorder)} count jobs in a pack-store delivery "
        "(budget: 1 — the distinct-sequence count)"
    )
    assert stats["new_docs"] == second.count()


def test_embedding_store_delivery_counting_budget(
    spark, sf_dir, tmp_path, count_recorder
):
    """An embedding-store append runs at most THREE count jobs: the CC
    size-router plus the two measured-recall statistics (true pairs /
    caught pairs — the measurement itself). Sizing (n, n_prior,
    new_pairs) folds from footers."""
    from ph_ee_nats_importer_rdbms_spark.analytics import (
        incremental_embeddings as ie,
    )

    v = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "embedding"
    )
    root = str(tmp_path / "emb")
    ie.build_embedding_store(spark, v.filter(F.col("vec_id") % 2 == 0), root)

    count_recorder.clear()
    second = v.filter(F.col("vec_id") % 2 == 1)
    stats = ie.append_embedding_batch(spark, second, root)
    assert len(count_recorder) <= 3, (
        f"{len(count_recorder)} count jobs in an embedding-store delivery "
        "(budget: 3 — CC router + 2 recall measurements)"
    )
    assert stats["new_vectors"] == second.count()


def _changes_df(spark, rows):
    from ph_ee_nats_importer_rdbms_spark.streaming.pipeline import CHANGES_SCHEMA

    return spark.createDataFrame(rows, CHANGES_SCHEMA)


def test_driver_collect_writer_rejects_oversized_batches(spark, monkeypatch):
    """The NON-default driver-collect JDBC writer must refuse a
    micro-batch over its documented cap with a pointer to
    distributed=True — and the guard itself must stay bounded (it
    collects via limit(cap+1), never the whole batch)."""
    from ph_ee_nats_importer_rdbms_spark.sinks import jdbc

    monkeypatch.setattr(jdbc, "DRIVER_COLLECT_MAX_ROWS", 50)
    ran = []

    def executor(url, stmts):
        ran.append((url, len(stmts)))

    write = jdbc.changes_foreach_batch(
        lambda tenant: "db://x", executor, distributed=False
    )
    over = _changes_df(
        spark,
        [("variable", i, "tn01", '{"workflow_instance_key": %d}' % i) for i in range(51)],
    )
    with pytest.raises(ValueError, match="distributed=True"):
        write(over, 0)
    assert not ran, "guard must fire before any statement executes"

    under = _changes_df(
        spark,
        [("variable", i, "tn01", '{"workflow_instance_key": %d}' % i) for i in range(50)],
    )
    write(under, 1)
    assert ran, "under-cap batches still write"


def test_salted_writer_bounds_per_task_share_under_tenant_skew(spark):
    """90/10 tenant skew: plain repartition('tenant') would put 9000 rows
    in ONE task; the salted partitioning bounds the dominant tenant's
    largest task at ~1/WRITER_SALT of its rows, while keeping every
    (tenant, instance key) in exactly one task — the property that makes
    concurrent same-tenant writers touch disjoint upsert keys."""
    from pyspark.sql import functions as SF

    from ph_ee_nats_importer_rdbms_spark.sinks.jdbc import (
        WRITER_SALT,
        salted_by_tenant,
    )

    rows = [("transfer", i, "big", "{}") for i in range(9000)]
    rows += [
        ("transfer", 100_000 + i, f"tn{i % 9}", "{}") for i in range(1000)
    ]
    df = _changes_df(spark, rows).repartition(16)  # incoming layout: arbitrary
    # AQE would coalesce these KB-sized test partitions into one (below
    # the 64MB advisory size); at real micro-batch sizes the salted
    # partitions are advisory-sized and stay separate. Pin it off to
    # observe the partitioning itself.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        placed = salted_by_tenant(df, num_partitions=64).withColumn(
            "pid", SF.spark_partition_id()
        ).localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")

    per_task = {
        r["pid"]: r["n"]
        for r in placed.groupBy("pid").agg(SF.count(SF.lit(1)).alias("n")).collect()
    }
    # dominant tenant alone is 9000 rows; bounded share means no task
    # holds more than ~2x its fair split (hash unevenness allowance)
    assert max(per_task.values()) <= 2 * 9000 // WRITER_SALT, per_task

    # one task per (tenant, key): no key's rows straddle tasks
    straddlers = (
        placed.groupBy("tenant", "workflow_instance_key")
        .agg(SF.countDistinct("pid").alias("np"))
        .filter(SF.col("np") > 1)
        .count()
    )
    assert straddlers == 0


def test_salted_writer_delivers_every_row_exactly_once(spark, tmp_path):
    """E2E through the DISTRIBUTED writer under skew: every change row
    reaches its tenant's database exactly once despite the within-tenant
    split (concurrent tasks write disjoint keys)."""
    import sqlite3

    from ph_ee_nats_importer_rdbms_spark.sinks import jdbc
    from ph_ee_nats_importer_rdbms_spark.sinks.dbapi import SqliteExecutor

    dbs = {t: str(tmp_path / f"{t}.db") for t in ("big", "tn0", "tn1")}
    for path in dbs.values():
        jdbc.bootstrap_ddl(path, SqliteExecutor(), dialect="sqlite")
    resolver = lambda tenant: dbs.get(tenant or "")  # noqa: E731
    resolver.connections = dict(dbs)

    rows = [
        (
            "variable",
            i,
            "big" if i % 10 else f"tn{i % 2}",
            '{"workflow_key": 1, "workflow_instance_key": %d, '
            '"timestamp": %d, "name": "n%d", "value": "v"}' % (i, i, i),
        )
        for i in range(500)
    ]
    write = jdbc.changes_foreach_batch(
        resolver, SqliteExecutor(), distributed=True, dialect="sqlite"
    )
    write(_changes_df(spark, rows), 0)

    got = 0
    for path in dbs.values():
        with sqlite3.connect(path) as con:
            got += con.execute(
                "SELECT count(*) FROM ph_variables"
            ).fetchone()[0]
    assert got == 500


def test_artifact_count_raises_on_missing_artifact(tmp_path):
    """A sizing read against a never-written artifact is a bug, not an
    empty store — artifact_count must raise, never return 0."""
    from ph_ee_nats_importer_rdbms_spark.analytics import batch_store as bs

    with pytest.raises(FileNotFoundError):
        bs.artifact_count(str(tmp_path), "delivered", "nope")
