"""Per-dataset parquet stage (plans/staging.py): build-once semantics,
data-change invalidation, and stale-fingerprint pruning — the guarantees
that make cross-session reuse of the import materialization safe."""

from __future__ import annotations

import os
import shutil

from ph_ee_nats_importer_rdbms_spark.plans import staging


def _sf_copy(tmp_path):
    sfdir = tmp_path / "sfX"
    sfdir.mkdir()
    shutil.copy(
        "/root/testdata/sf0.001/orders.parquet", sfdir / "orders.parquet"
    )
    return str(sfdir)


def test_stage_builds_once_then_serves_reads(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_STAGE_CACHE_DIR", str(tmp_path / "cache"))
    sfdir = _sf_copy(tmp_path)
    calls = []

    def build():
        calls.append(1)
        return spark.range(5).withColumnRenamed("id", "v")

    df1 = staging.load_or_build(spark, sfdir, "rel", build)
    assert df1.count() == 5 and len(calls) == 1
    assert staging.is_staged(sfdir, "rel")

    # second touch (fresh-session analogue): parquet read, no rebuild
    df2 = staging.load_or_build(spark, sfdir, "rel", build)
    assert df2.count() == 5 and len(calls) == 1
    assert staging.read_staged(spark, sfdir, "rel").count() == 5


def test_stage_invalidates_on_data_change_and_prunes_stale(
    spark, tmp_path, monkeypatch
):
    monkeypatch.setenv("SPARK_GRAFT_STAGE_CACHE_DIR", str(tmp_path / "cache"))
    sfdir = _sf_copy(tmp_path)
    calls = []

    def build():
        calls.append(1)
        return spark.range(3).withColumnRenamed("id", "v")

    staging.load_or_build(spark, sfdir, "rel", build)
    assert len(calls) == 1

    # the driver regenerates testdata in place -> mtime changes -> the old
    # stage must NOT satisfy reads for the new data
    src = os.path.join(sfdir, "orders.parquet")
    st = os.stat(src)
    os.utime(src, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000_000))
    assert not staging.is_staged(sfdir, "rel")
    staging.load_or_build(spark, sfdir, "rel", build)
    assert len(calls) == 2

    # the stale fingerprint dir for the same dataset basename was pruned
    entries = [
        d for d in os.listdir(tmp_path / "cache") if d.startswith("sfX-")
    ]
    assert len(entries) == 1


def test_prune_keeps_extended_basename_sibling(spark, tmp_path, monkeypatch):
    """'sfX' rebuilding must not delete 'sfX-alt's stage — the stale match
    is exact-basename, not prefix (a prefix match would treat the sibling's
    '<base>-alt-<fp>' dir as a stale 'sfX' fingerprint)."""
    monkeypatch.setenv("SPARK_GRAFT_STAGE_CACHE_DIR", str(tmp_path / "cache"))
    sfdir = _sf_copy(tmp_path)
    alt = tmp_path / "sfX-alt"
    alt.mkdir()
    shutil.copy(os.path.join(sfdir, "orders.parquet"), alt / "orders.parquet")

    build = lambda: spark.range(2).withColumnRenamed("id", "v")  # noqa: E731
    staging.load_or_build(spark, str(alt), "rel", build)
    assert staging.is_staged(str(alt), "rel")

    # rebuild the shorter-named dataset twice (second with new fingerprint,
    # triggering the prune path); the sibling's stage must survive
    staging.load_or_build(spark, sfdir, "rel", build)
    src = os.path.join(sfdir, "orders.parquet")
    st = os.stat(src)
    os.utime(src, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000_000))
    staging.load_or_build(spark, sfdir, "rel", build)
    assert staging.is_staged(str(alt), "rel")


def test_q7_catalog_is_dataset_scoped(spark, tmp_path, monkeypatch):
    """Querying dataset A, then dataset B, then A again must serve A's rows
    (the q7_* catalog prefix carries the dataset fingerprint, so B cannot
    overwrite A's registered tables)."""
    from ph_ee_nats_importer_rdbms_spark.plans import queries

    a, b = "/root/testdata/sf0.001", "/root/testdata/sf0.01"
    first = queries._q_transfer_detail_rows(spark, a).count()
    other = queries._q_transfer_detail_rows(spark, b).count()
    again = queries._q_transfer_detail_rows(spark, a).count()
    assert first == again
    assert other != first  # distinct datasets genuinely differ


def test_stage_disabled_falls_back_to_in_session(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_STAGE_CACHE", "0")
    sfdir = _sf_copy(tmp_path)
    calls = []

    def build():
        calls.append(1)
        return spark.range(2).withColumnRenamed("id", "v")

    df = staging.load_or_build(spark, sfdir, "rel", build)
    assert df.count() == 2 and len(calls) == 1
    assert staging.cache_root() is None
    assert not staging.is_staged(sfdir, "rel")
