"""Append-only packed-sequence store (analytics/incremental_training.py).

The contract is NOT rebuild parity (write-once shards forbid repacking
history); it is: every delivered doc packed exactly once, no sequence
over capacity, committed rows bit-immutable under append, per-shard
packing semantics preserved within each delivery, and the fill cost of
immutability visible in the report.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ph_ee_nats_importer_rdbms_spark.analytics import incremental_training as it
from ph_ee_nats_importer_rdbms_spark.analytics.training import (
    PACK_CAPACITY,
    pack_of,
)
from ph_ee_nats_importer_rdbms_spark.sources.files import load_table


import pytest

pytestmark = pytest.mark.slow  # heavy Spark gate; default selection skips (pytest.ini), round-close runs all


def _rows(df) -> set:
    return {tuple(r) for r in df.collect()}


def _check_invariants(spark, root, all_docs):
    packed = it.read_packed(spark, root)
    # every doc exactly once
    assert packed.groupBy("doc_id").count().filter("count > 1").count() == 0
    assert packed.count() == all_docs.count()
    # no sequence over capacity — EXCEPT single-doc sequences of oversized
    # docs (a doc longer than capacity gets its own sequence, by design)
    over = (
        packed.groupBy("shard_id", "seq_id")
        .agg(F.sum("n_tokens").alias("t"), F.count(F.lit(1)).alias("n"))
        .filter((F.col("t") > PACK_CAPACITY) & (F.col("n") > 1))
    )
    assert over.count() == 0


def test_append_preserves_committed_rows_and_invariants(
    spark, sf_dir, tmp_path
):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    first = docs.filter(docs.doc_id < 300)
    second = docs.filter(docs.doc_id >= 300)

    root = str(tmp_path / "pack")
    it.build_pack_store(spark, first, root)
    before = _rows(it.read_packed(spark, root))

    stats = it.append_pack_batch(spark, second, root)
    assert stats["new_docs"] == second.count()
    after = _rows(it.read_packed(spark, root))

    # committed rows are bit-immutable; append strictly adds
    assert before <= after
    assert len(after) == len(before) + second.count()
    _check_invariants(spark, root, docs)

    # the delivery's own packing follows the same per-shard fold
    batch_pack = {
        (r[0], r[1], r[2])
        for r in pack_of(second).select(
            "shard_id", "doc_id", "n_tokens"
        ).collect()
    }
    appended = {
        (r[0], r[1], r[2])
        for r in it.read_packed(spark, root)
        .join(second.select("doc_id"), "doc_id", "leftsemi")
        .select("shard_id", "doc_id", "n_tokens")
        .collect()
    }
    assert batch_pack == appended

    # new sequences start above the old high-water mark per shard
    old_max = {
        r["shard_id"]: r["m"]
        for r in spark.createDataFrame(
            [(s, d, n, q) for s, d, n, q in before],
            it.PACK_SCHEMA,
        )
        .groupBy("shard_id")
        .agg(F.max("seq_id").alias("m"))
        .collect()
    }
    new_min = (
        it.read_packed(spark, root)
        .join(second.select("doc_id"), "doc_id", "leftsemi")
        .groupBy("shard_id")
        .agg(F.min("seq_id").alias("m"))
        .collect()
    )
    for r in new_min:
        if r["shard_id"] in old_max:
            assert r["m"] > old_max[r["shard_id"]]


def test_redelivery_guard_and_replay_skip(spark, sf_dir, tmp_path):
    import pytest as _pytest

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    first = docs.filter(docs.doc_id < 300)
    second = docs.filter(docs.doc_id >= 300)
    root = str(tmp_path / "pack")
    it.build_pack_store(spark, first, root)
    it.append_pack_batch(spark, second, root)

    with _pytest.raises(ValueError, match="already committed"):
        it.append_pack_batch(spark, second, root)
    assert it.append_pack_batch(spark, second, root, skip_committed=True) == {
        "new_docs": 0,
        "skipped": True,
    }
    overlapping = docs.filter((docs.doc_id >= 250) & (docs.doc_id < 350))
    with _pytest.raises(ValueError, match="already packed"):
        it.append_pack_batch(spark, overlapping, root)


def test_fill_report_accounts_for_immutability(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    root = str(tmp_path / "pack")
    it.build_pack_store(spark, docs.filter(docs.doc_id < 300), root)
    it.append_pack_batch(spark, docs.filter(docs.doc_id >= 300), root)
    rep = it.fill_report(spark, root).collect()
    assert rep, "report must cover the shards"
    total_tokens = sum(r["tokens"] for r in rep)
    assert total_tokens == (
        it.read_packed(spark, root).agg(F.sum("n_tokens")).collect()[0][0]
    )
    for r in rep:
        assert 0 < r["fill_ratio"] <= 1.0


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    sizes=st.lists(st.integers(1, 60), min_size=4, max_size=20),
    split=st.integers(1, 3),
)
def test_fuzz_deliveries_keep_invariants(sizes, split, spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("incpack")
    root = str(base / "pack")
    docs = [
        (i, " ".join(f"w{i}x{j}" for j in range(n)))
        for i, n in enumerate(sizes)
    ]
    schema = "doc_id long, text string"
    batches = [docs[i::split] for i in range(split)]
    batches = [b for b in batches if b]
    it.build_pack_store(spark, spark.createDataFrame(batches[0], schema), root)
    for b in batches[1:]:
        it.append_pack_batch(spark, spark.createDataFrame(b, schema), root)
    all_docs = spark.createDataFrame(docs, schema)
    _check_invariants(spark, root, all_docs)
