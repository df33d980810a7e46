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


def test_artifact_tree_contract(spark, sf_dir, tmp_path, monkeypatch):
    """The shared tree-staging scaffold (round 8): builds once per
    fingerprint via tmp-sibling + rename, sweeps stale tmp dirs from
    crashed builders of any pid, treats a lost rename race as benign
    (final path exists) but re-raises real rename failures, and with
    caching disabled builds into a session temp dir memoized on data
    identity."""
    import os

    from ph_ee_nats_importer_rdbms_spark.plans import staging

    monkeypatch.setenv("SPARK_GRAFT_STAGE_CACHE_DIR", str(tmp_path / "cache"))

    calls = []

    def build(root):
        calls.append(root)
        os.makedirs(root, exist_ok=True)
        with open(os.path.join(root, "marker"), "w") as f:
            f.write("ok")

    # stale tmp from a CRASHED builder (dead pid) is swept; a LIVE
    # concurrent builder's tmp is left alone (deleting it under the
    # builder would let its rename commit a half-written tree)
    import subprocess

    ds = staging.artifact_dir(sf_dir, "vstore")
    dead = subprocess.Popen(["true"])
    dead.wait()
    stale = os.path.join(ds, f"tree.tmp-{dead.pid}")
    live = os.path.join(ds, f"tree.tmp-{os.getppid()}")
    os.makedirs(stale)
    os.makedirs(live)
    p1 = staging.artifact_tree(spark, sf_dir, "vstore", "tree", build, "embeddings.parquet")
    assert os.path.exists(os.path.join(p1, "marker"))
    assert not os.path.exists(stale)
    assert os.path.exists(live)  # live builder's tmp survives the sweep
    assert len(calls) == 1

    # second call: already staged, no rebuild
    p2 = staging.artifact_tree(spark, sf_dir, "vstore", "tree", build, "embeddings.parquet")
    assert p2 == p1 and len(calls) == 1

    # lost race: our rename fails because a concurrent winner landed the
    # final path — benign, the winner's tree is served
    real_rename = os.rename

    def losing_rename(src, dst):
        os.makedirs(dst)
        with open(os.path.join(dst, "marker"), "w") as f:
            f.write("winner")
        raise OSError("simulated race loss")

    monkeypatch.setattr(os, "rename", losing_rename)
    p3 = staging.artifact_tree(spark, sf_dir, "vstore", "tree3", build, "embeddings.parquet")
    with open(os.path.join(p3, "marker")) as f:
        assert f.read() == "winner"
    monkeypatch.setattr(os, "rename", real_rename)

    # real rename failure with NO winner -> propagates
    import pytest as _pytest

    def failing_rename(src, dst):
        raise OSError("simulated rename failure")

    monkeypatch.setattr(os, "rename", failing_rename)
    with _pytest.raises(OSError, match="simulated"):
        staging.artifact_tree(spark, sf_dir, "vstore", "tree2", build, "embeddings.parquet")
    monkeypatch.setattr(os, "rename", real_rename)

    # cache disabled: session temp dir, memoized per data identity
    monkeypatch.setenv("SPARK_GRAFT_STAGE_CACHE", "0")
    calls.clear()
    t1 = staging.artifact_tree(spark, sf_dir, "vstore", "tree", build, "embeddings.parquet")
    t2 = staging.artifact_tree(spark, sf_dir, "vstore", "tree", build, "embeddings.parquet")
    assert t1 == t2 and len(calls) == 1
    assert os.path.exists(os.path.join(t1, "marker"))
