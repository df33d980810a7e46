"""Incremental ANN index maintenance (analytics/incremental_vectors.py).

Parity contract: after any sequence of vector deliveries, the stored PQ
codes and IVF assignments equal a from-scratch encode of the union corpus
against the SAME frozen codebooks, each delivery's batch dirs hold only
that delivery's vec_ids (only new vectors encode), and re-deliveries are
rejected.
"""

from __future__ import annotations

import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ph_ee_nats_importer_rdbms_spark.analytics import incremental_vectors as iv
from ph_ee_nats_importer_rdbms_spark.analytics.similarity import (
    ivf_assign_of,
    pq_encode_of,
)
from ph_ee_nats_importer_rdbms_spark.sources.files import load_table, spread


pytestmark = pytest.mark.slow  # heavy Spark gate; default selection skips (pytest.ini), round-close runs all


def _books(sf_dir):
    """The corpus's shipped codebooks — frozen into the store at build."""
    from ph_ee_nats_importer_rdbms_spark.analytics.similarity import (
        _codebook,
        _pq_books,
    )

    return _codebook(sf_dir), _pq_books(sf_dir)


def _codes(spark, root):
    return {
        (r["vec_id"], tuple(r["codes"]), r["approx_norm2"])
        for r in iv.read_codes(spark, root).collect()
    }


def _assigns(spark, root):
    return {
        (r["vec_id"], r["cluster_id"])
        for r in iv.read_assignments(spark, root).collect()
    }


def test_append_matches_full_build_and_encodes_only_new(spark, sf_dir, tmp_path):
    e = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "embedding"
    )
    first = e.filter(F.col("vec_id") % 3 != 0)
    second = e.filter(F.col("vec_id") % 3 == 0)
    ivf_cb, pq_cb = _books(sf_dir)

    root = str(tmp_path / "vx")
    iv.build_vector_index(spark, first, root, ivf_cb, pq_cb)
    stats = iv.append_vectors(spark, second, root)
    assert stats["new_vectors"] == second.count()

    # full-build parity with the same frozen books
    full = str(tmp_path / "full")
    iv.build_vector_index(spark, e, full, ivf_cb, pq_cb)
    assert _codes(spark, root) == _codes(spark, full)
    assert _assigns(spark, root) == _assigns(spark, full)

    # ...and equals the direct encode kernels over the union corpus
    want_codes = {
        (r["vec_id"], tuple(r["codes"]), r["approx_norm2"])
        for r in pq_encode_of(e, pq_cb).collect()
    }
    assert _codes(spark, root) == want_codes

    # only the delivery's vec_ids live in its batch dirs (structural)
    batches = iv.committed_batches(root)
    assert len(batches) == 2
    second_ids = {r["vec_id"] for r in second.select("vec_id").collect()}
    batch_dir = os.path.join(root, "pq_codes", batches[1]["batch"])
    batch_ids = {
        r["vec_id"] for r in spark.read.parquet(batch_dir).collect()
    }
    assert batch_ids == second_ids


def test_append_rejects_redelivery_and_duplicate_batch(spark, sf_dir, tmp_path):
    e = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "embedding"
    )
    ivf_cb, pq_cb = _books(sf_dir)
    root = str(tmp_path / "vx")
    first = e.filter(F.col("vec_id") < 100)
    iv.build_vector_index(spark, first, root, ivf_cb, pq_cb)
    with pytest.raises(ValueError, match="already in the index"):
        iv.append_vectors(spark, e.filter(F.col("vec_id") < 10), root)
    batch2 = e.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 150))
    iv.append_vectors(spark, batch2, root)
    with pytest.raises(ValueError, match="already committed"):
        iv.append_vectors(spark, batch2, root)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(split=st.lists(st.integers(0, 2), min_size=30, max_size=30))
def test_fuzz_delivery_sequences_match_full_build(
    split, spark, sf_dir, tmp_path_factory
):
    """Random 1-3-batch partitions of a 30-vector slice: any delivery
    order must reproduce the from-scratch encode bit-for-bit."""
    e = (
        spread(load_table(spark, sf_dir, "embeddings"))
        .select("vec_id", "embedding")
        .filter(F.col("vec_id") < 30)
    )
    ivf_cb, pq_cb = _books(sf_dir)
    base = tmp_path_factory.mktemp("vx")
    root, full = str(base / "inc"), str(base / "full")

    ids_by_batch: dict[int, list[int]] = {}
    for vec_id, b in enumerate(split):
        ids_by_batch.setdefault(b, []).append(vec_id)
    batches = [v for _, v in sorted(ids_by_batch.items()) if v]

    iv.build_vector_index(
        spark, e.filter(F.col("vec_id").isin(batches[0])), root, ivf_cb, pq_cb
    )
    for ids in batches[1:]:
        iv.append_vectors(spark, e.filter(F.col("vec_id").isin(ids)), root)

    iv.build_vector_index(spark, e, full, ivf_cb, pq_cb)
    assert _codes(spark, root) == _codes(spark, full)
    assert _assigns(spark, root) == _assigns(spark, full)


def test_drift_detection_trips_on_distribution_shift(spark, sf_dir, tmp_path):
    """VERDICT r4/r5 carried task: the frozen-codebook store must DETECT
    distribution shift instead of silently serving a stale index. An
    in-distribution delivery stays under both thresholds; a delivery
    pushed to a far region of the space (bad quantization against the
    frozen books, occupancy collapsed onto few inverted lists) trips
    needs_retrain."""
    e = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "embedding"
    )
    ivf_cb, pq_cb = _books(sf_dir)
    root = str(tmp_path / "vx")
    iv.build_vector_index(
        spark, e.filter(F.col("vec_id") % 2 == 0), root, ivf_cb, pq_cb
    )
    in_dist = iv.append_vectors(
        spark, e.filter(F.col("vec_id") % 2 == 1), root
    )
    assert in_dist["drift"]["mean_qerr"] is not None
    report = {r["seq"]: r for r in iv.drift_report(spark, root).collect()}
    assert report[0]["needs_retrain"] is False  # base vs itself
    assert report[1]["needs_retrain"] is False  # same distribution
    assert not iv.needs_retrain(spark, root)

    # distribution-shifted delivery: same vectors scaled + offset into a
    # region no trained centroid covers
    shifted = e.filter(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.expr(
            "transform(embedding, x -> cast(x * 7.0 + 3.0 as float))"
        ).alias("embedding"),
    )
    out = iv.append_vectors(spark, shifted, root)
    assert out["drift"]["n"] == 50
    rows = iv.drift_report(spark, root).orderBy("seq").collect()
    assert rows[-1]["needs_retrain"] is True
    assert rows[-1]["qerr_ratio"] > 1.5 or rows[-1]["occupancy_tvd"] > 0.25
    assert iv.needs_retrain(spark, root)
    # the signal rides the commit manifest — no corpus rescan involved
    assert all("drift" in m for m in iv.committed_batches(root))


def test_drift_report_surfaces_pre_upgrade_batches_as_unknown(
    spark, sf_dir, tmp_path
):
    """Batches committed by pre-drift code (no 'drift' in the manifest)
    must surface as NULL-metric rows — unknown, not healthy and not
    tripped — and must not poison the store-level needs_retrain answer."""
    import json as _json
    import os as _os

    e = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "embedding"
    )
    ivf_cb, pq_cb = _books(sf_dir)
    root = str(tmp_path / "vx")
    iv.build_vector_index(
        spark, e.filter(F.col("vec_id") % 2 == 0), root, ivf_cb, pq_cb
    )
    iv.append_vectors(spark, e.filter(F.col("vec_id") % 2 == 1), root)
    # strip the append's drift stats, simulating a pre-upgrade commit
    mdir = _os.path.join(root, "_batches")
    name = sorted(_os.listdir(mdir))[-1]
    with open(_os.path.join(mdir, name)) as f:
        m = _json.load(f)
    m.pop("drift")
    with open(_os.path.join(mdir, name), "w") as f:
        _json.dump(m, f)

    rows = {r["seq"]: r for r in iv.drift_report(spark, root).collect()}
    assert rows[0]["needs_retrain"] is False
    assert rows[1]["mean_qerr"] is None
    assert rows[1]["needs_retrain"] is None
    assert not iv.needs_retrain(spark, root)


def test_streaming_deliveries_fold_into_index(spark, sf_dir, tmp_path):
    """Vector deliveries via Structured Streaming: files landing in a
    directory stream through the foreachBatch sink; the final index equals
    a from-scratch build, and replaying a committed batch is a no-op
    (exactly-once under checkpoint replay)."""
    e = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "embedding"
    )
    ivf_cb, pq_cb = _books(sf_dir)
    root = str(tmp_path / "vx")
    first = e.filter(F.col("vec_id") < 250)
    rest = e.filter(F.col("vec_id") >= 250)
    iv.build_vector_index(spark, first, root, ivf_cb, pq_cb)

    landing = str(tmp_path / "landing")
    rest.write.parquet(landing)
    stream = (
        spark.readStream.schema(rest.schema)
        .parquet(landing)
        .writeStream.foreachBatch(iv.streaming_append_sink(root))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    stream.awaitTermination(120)

    full = str(tmp_path / "full")
    iv.build_vector_index(spark, e, full, ivf_cb, pq_cb)
    assert _codes(spark, root) == _codes(spark, full)
    assert _assigns(spark, root) == _assigns(spark, full)

    # committed-batch replay (what a checkpoint replay delivers) is a no-op
    replay = next(
        b for b in iv.committed_batches(root) if b["batch"] != "base"
    )
    replay_df = spark.read.parquet(
        os.path.join(root, "delivered", replay["batch"])
    ).join(e, "vec_id")
    out = iv.append_vectors(spark, replay_df, root, skip_committed=True)
    assert out == {"new_vectors": 0, "skipped": True}
    assert _codes(spark, root) == _codes(spark, full)


def test_streaming_retrain_drill_swaps_reader_and_keeps_serving(
    spark, sf_dir, tmp_path
):
    """The FULL streaming lifecycle in one drill (VERDICT r7 task #5):
    deliveries stream in via the foreachBatch sink; a shifted delivery
    trips needs_retrain mid-stream; retrain_store regenerates into a new
    root while the old root stays intact; the reader swap is a pointer
    update; post-swap deliveries stream into the NEW root; and serving
    from the new store equals a from-scratch build of the union corpus
    with the retrained books (parity), including the just-streamed
    vectors (continuity)."""
    e = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "embedding"
    )
    ivf_cb, pq_cb = _books(sf_dir)
    base = e.filter(F.col("vec_id") < 200)
    mid = e.filter((F.col("vec_id") >= 200) & (F.col("vec_id") < 300))
    shifted = e.filter(F.col("vec_id") < 100).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.expr(
            "transform(embedding, x -> cast(x * 7.0 + 3.0 as float))"
        ).alias("embedding"),
    )
    late = e.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 400))

    root = str(tmp_path / "old")
    iv.build_vector_index(spark, base, root, ivf_cb, pq_cb)

    def run_stream(landing: str, ckpt: str, sink_root: str) -> None:
        stream = (
            spark.readStream.schema(base.schema)
            .parquet(landing)
            .writeStream.foreachBatch(iv.streaming_append_sink(sink_root))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        stream.awaitTermination(120)

    # phase 1: an in-distribution delivery streams in — healthy store
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    mid.write.parquet(landing)
    run_stream(landing, ckpt, root)
    assert not iv.needs_retrain(spark, root)

    # phase 2: a shifted delivery lands mid-stream and trips the flag
    shifted.write.mode("append").parquet(landing)
    run_stream(landing, ckpt, root)
    assert iv.needs_retrain(spark, root)

    # phase 3: retrain into a NEW root; the old root keeps serving until
    # the swap (never mutated), the new one starts healthy
    new = str(tmp_path / "new")
    iv.retrain_store(spark, root, new, seeds=(7,))
    assert iv.needs_retrain(spark, root)  # old store unchanged
    assert not iv.needs_retrain(spark, new)

    # phase 4: swap the reader — post-swap deliveries stream into the new
    # root through the same sink machinery (fresh landing + checkpoint)
    landing2 = str(tmp_path / "landing2")
    ckpt2 = str(tmp_path / "ckpt2")
    late.write.parquet(landing2)
    run_stream(landing2, ckpt2, new)

    # parity: the swapped-to store serves EXACTLY like a from-scratch
    # build of the union corpus with the retrained books
    books = iv.frozen_codebooks(new)
    union = base.unionByName(mid).unionByName(shifted).unionByName(late)
    want_root = str(tmp_path / "want")
    iv.build_vector_index(spark, union, want_root, books["ivf"], books["pq"])
    queries = e.filter(F.col("vec_id") < 4).select(
        (F.col("vec_id") + 800_000).alias("query_id"),
        F.col("embedding").alias("q_emb"),
    )
    got = sorted(
        tuple(r)
        for r in iv.search_store(
            spark, new, queries, variant="ivf_pq"
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in iv.search_store(
            spark, want_root, queries, variant="ivf_pq"
        ).collect()
    )
    assert got == want and got

    # continuity: a query AT a just-streamed late vector finds it at
    # rank 1 with cosine 1.0 — the post-swap deliveries are served
    late_row = late.filter(F.col("vec_id") == 321).collect()[0]
    late_id = late_row["vec_id"]
    late_q = spark.createDataFrame(
        [(900_000, late_row["embedding"])],
        "query_id LONG, q_emb ARRAY<FLOAT>",
    )
    top = (
        iv.search_store(spark, new, late_q, variant="ivf_pq")
        .filter(F.col("rank") == 1)
        .collect()[0]
    )
    assert top["vec_id"] == late_id and top["cosine"] == 1.0


def test_drift_report_zero_qerr_reference_is_not_missing(
    spark, sf_dir, tmp_path
):
    """ADVICE r6: a base build whose mean_qerr is exactly 0.0 (tiny
    corpora where codes reconstruct exactly) is a LEGITIMATE reference,
    not a missing one — rows must not all null out, the occupancy-TVD
    signal must survive, and a nonzero delivery against a zero reference
    is infinite drift (trips), not undefined."""
    import json as _json
    import math as _math
    import os as _os

    e = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "embedding"
    )
    ivf_cb, pq_cb = _books(sf_dir)
    root = str(tmp_path / "vx")
    iv.build_vector_index(
        spark, e.filter(F.col("vec_id") % 2 == 0), root, ivf_cb, pq_cb
    )
    iv.append_vectors(spark, e.filter(F.col("vec_id") % 2 == 1), root)

    # rewrite the BASE manifest's qerr to exactly 0.0 — the reconstructed-
    # exactly case — leaving its occupancy histogram intact
    mdir = _os.path.join(root, "_batches")
    base_name = sorted(_os.listdir(mdir))[0]
    with open(_os.path.join(mdir, base_name)) as f:
        m = _json.load(f)
    assert m["seq"] == 0
    m["drift"]["mean_qerr"] = 0.0
    with open(_os.path.join(mdir, base_name), "w") as f:
        _json.dump(m, f)

    rows = {r["seq"]: r for r in iv.drift_report(spark, root).collect()}
    # base vs itself: 0/0 ratio reports 1.0, no trip
    assert rows[0]["qerr_ratio"] == 1.0
    assert rows[0]["needs_retrain"] is False
    # nonzero delivery vs zero reference: infinite ratio, trips
    assert _math.isinf(rows[1]["qerr_ratio"])
    assert rows[1]["needs_retrain"] is True
    # the TVD signal is computed regardless of the qerr pathologies
    assert rows[1]["occupancy_tvd"] is not None


def test_retrain_resolves_codebook_drift(spark, sf_dir, tmp_path):
    """retrain_store is the action needs_retrain calls for (the remedy
    twin of incremental_embeddings.rebuild_store): retraining over the
    store's own carried corpus produces a new store whose books fit the
    corpus as it now is — the flag clears, the corpus carries over
    intact, and the new codes equal a fresh encode against the new
    books."""
    import shutil

    e = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "embedding"
    )
    ivf_cb, pq_cb = _books(sf_dir)
    root = str(tmp_path / "old")
    iv.build_vector_index(
        spark, e.filter(F.col("vec_id") < 200), root, ivf_cb, pq_cb
    )
    shifted = e.filter(F.col("vec_id") < 100).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.expr(
            "transform(embedding, x -> cast(x * 7.0 + 3.0 as float))"
        ).alias("embedding"),
    )
    iv.append_vectors(spark, shifted, root)
    assert iv.needs_retrain(spark, root)

    new = str(tmp_path / "new")
    iv.retrain_store(spark, root, new, seeds=(7,))
    assert not iv.needs_retrain(spark, new)

    old_ids = {r["vec_id"] for r in iv.store_vectors(spark, root).collect()}
    new_ids = {r["vec_id"] for r in iv.store_vectors(spark, new).collect()}
    assert new_ids == old_ids and len(new_ids) == 300

    # new codes = fresh encode of the carried corpus with the NEW books
    books = iv.frozen_codebooks(new)
    assert books["ivf"] != ivf_cb  # actually retrained, not recopied
    want = {
        (r["vec_id"], tuple(r["codes"]))
        for r in pq_encode_of(
            iv.store_vectors(spark, new), books["pq"]
        ).collect()
    }
    got = {
        (r["vec_id"], tuple(r["codes"]))
        for r in iv.read_codes(spark, new).collect()
    }
    assert got == want

    # pre-upgrade stores (no carried vectors) fail loud and retrain via
    # an explicit corpus relation instead
    shutil.rmtree(os.path.join(root, "vectors"))
    with pytest.raises(ValueError, match="carries no vectors"):
        iv.store_vectors(spark, root)
    legacy_corpus = e.filter(F.col("vec_id") < 200).unionByName(shifted)
    new2 = str(tmp_path / "new2")
    iv.retrain_store(spark, root, new2, corpus=legacy_corpus, seeds=(7,))
    assert not iv.needs_retrain(spark, new2)
    assert {
        r["vec_id"] for r in iv.store_vectors(spark, new2).collect()
    } == old_ids


def test_small_in_distribution_delivery_does_not_false_trip(
    spark, sf_dir, tmp_path
):
    """A 30-vector in-distribution delivery over 16 lists measures ~0.29
    occupancy TVD by sampling noise alone — the trip rule must charge the
    threshold plus the noise floor, not false-flag every small healthy
    delivery (found by driving the retrain lifecycle end-to-end)."""
    e = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "embedding"
    )
    ivf_cb, pq_cb = _books(sf_dir)
    root = str(tmp_path / "vx")
    iv.build_vector_index(
        spark, e.filter(F.col("vec_id") >= 30), root, ivf_cb, pq_cb
    )
    iv.append_vectors(spark, e.filter(F.col("vec_id") < 30), root)
    rows = iv.drift_report(spark, root).orderBy("seq").collect()
    assert rows[-1]["n"] == 30
    assert rows[-1]["tvd_noise_floor"] > 0.2
    assert rows[-1]["needs_retrain"] is False
    assert not iv.needs_retrain(spark, root)


def test_search_store_matches_dataset_backed_ann_search(
    spark, sf_dir, tmp_path
):
    """The store's serving API: search_store over a store built from the
    corpus (in two deliveries, with the corpus's shipped books) must
    return EXACTLY what the staged-dataset ann_search returns for the
    same queries — on the full-ADC route and the IVF-pruned route, on
    both LUT sites. Completes the lifecycle: build -> append -> serve."""
    from ph_ee_nats_importer_rdbms_spark.analytics import similarity as sim

    e = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "embedding"
    )
    ivf_cb, pq_cb = _books(sf_dir)
    root = str(tmp_path / "vx")
    iv.build_vector_index(
        spark, e.filter(F.col("vec_id") % 2 == 0), root, ivf_cb, pq_cb
    )
    iv.append_vectors(spark, e.filter(F.col("vec_id") % 2 == 1), root)

    queries = e.filter(F.col("vec_id") < 6).select(
        (F.col("vec_id") + 800_000).alias("query_id"),
        F.col("embedding").alias("q_emb"),
    )
    for variant in ("pq", "ivf_pq"):
        for lut in ("driver", "engine"):
            got = sorted(
                tuple(r)
                for r in iv.search_store(
                    spark, root, queries, variant=variant, lut=lut
                ).collect()
            )
            want = sorted(
                tuple(r)
                for r in sim.ann_search(
                    spark,
                    sf_dir,
                    queries,
                    variant=variant,
                    lut=lut,
                    exclude_self=False,
                ).collect()
            )
            assert got == want and got, (variant, lut)
    # the serving path sizes its refine pool from manifests, zero jobs
    assert iv.index_size(root) == e.count()


def test_search_store_prunes_inverted_list_partitions(
    spark, sf_dir, tmp_path
):
    """The store's serving layout: each delivery's codes live INSIDE
    their inverted lists (lists/<batch>/cluster_id=N/), so the ivf_pq
    serving route reads ONLY the probed partitions — PartitionFilters on
    cluster_id in the scan — with results identical to the
    assignment-join fallback a pre-upgrade store (no lists/) uses."""
    import shutil

    e = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "embedding"
    )
    ivf_cb, pq_cb = _books(sf_dir)
    root = str(tmp_path / "vx")
    iv.build_vector_index(
        spark, e.filter(F.col("vec_id") % 2 == 0), root, ivf_cb, pq_cb
    )
    iv.append_vectors(spark, e.filter(F.col("vec_id") % 2 == 1), root)
    assert iv.has_lists(root)

    queries = e.filter(F.col("vec_id") < 4).select(
        (F.col("vec_id") + 800_000).alias("query_id"),
        F.col("embedding").alias("q_emb"),
    )
    df = iv.search_store(spark, root, queries, variant="ivf_pq")
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("cluster_id" in ln for ln in pf), plan
    got = sorted(tuple(r) for r in df.collect())

    # pre-upgrade layout (no lists/): assignment-join fallback, same rows
    shutil.rmtree(os.path.join(root, "lists"))
    assert not iv.has_lists(root)
    fallback = sorted(
        tuple(r)
        for r in iv.search_store(
            spark, root, queries, variant="ivf_pq"
        ).collect()
    )
    assert got == fallback and got


def test_probe_coverage_recall_recorded_and_healthy(spark, sf_dir, tmp_path):
    """Round 8: every commit manifest measures SERVING recall — the
    fraction of sampled queries' exact top-k neighbors that land inside
    their IVF_PQ_NPROBE probed lists. An in-distribution delivery stays
    near the base build's coverage and must not trip."""
    e = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "embedding"
    )
    ivf_cb, pq_cb = _books(sf_dir)
    root = str(tmp_path / "vx")
    iv.build_vector_index(
        spark, e.filter(F.col("vec_id") % 2 == 0), root, ivf_cb, pq_cb
    )
    iv.append_vectors(spark, e.filter(F.col("vec_id") % 2 == 1), root)

    for m in iv.committed_batches(root):
        pr = m["drift"]["probe_recall"]
        assert pr["queries"] == iv.PROBE_RECALL_QUERY_SAMPLE
        assert pr["k"] == iv.PROBE_RECALL_K
        assert 0 < pr["covered"] <= pr["possible"]

    rows = iv.drift_report(spark, root).orderBy("seq").collect()
    assert all(r["probe_recall"] is not None for r in rows)
    assert rows[0]["probe_recall_ref"] == rows[0]["probe_recall"]
    assert all(r["probe_recall_low"] is False for r in rows)
    assert not iv.needs_retrain(spark, root)


def test_probe_coverage_drop_trips_needs_retrain(spark, sf_dir, tmp_path):
    """A delivery whose measured probe coverage falls below the
    ratio-threshold of the base build's — beyond the binomial noise
    margin — trips needs_retrain even with healthy qerr/occupancy; a
    small-sample dip inside the margin does not; pre-upgrade stats
    surface as unknown and never trip."""
    import json as _json
    import os as _os

    e = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "embedding"
    )
    ivf_cb, pq_cb = _books(sf_dir)
    root = str(tmp_path / "vx")
    iv.build_vector_index(
        spark, e.filter(F.col("vec_id") < 300), root, ivf_cb, pq_cb
    )
    iv.append_vectors(spark, e.filter(F.col("vec_id") >= 300), root)
    assert not iv.needs_retrain(spark, root)

    mdir = _os.path.join(root, "_batches")
    last = sorted(_os.listdir(mdir))[-1]
    path = _os.path.join(mdir, last)
    with open(path) as f:
        m = _json.load(f)

    # genuine serving degradation: 10/160 covered vs a healthy base
    m["drift"]["probe_recall"] = {
        "queries": 16, "k": 10, "possible": 160, "covered": 10,
    }
    with open(path, "w") as f:
        _json.dump(m, f)
    rows = {r["seq"]: r for r in iv.drift_report(spark, root).collect()}
    last_row = rows[max(rows)]
    assert last_row["probe_recall_low"] is True
    assert last_row["needs_retrain"] is True
    assert iv.needs_retrain(spark, root)

    # small-sample dip inside the 2-SE noise margin: no trip
    m["drift"]["probe_recall"] = {
        "queries": 1, "k": 10, "possible": 5, "covered": 2,
    }
    with open(path, "w") as f:
        _json.dump(m, f)
    rows = {r["seq"]: r for r in iv.drift_report(spark, root).collect()}
    assert rows[max(rows)]["probe_recall_low"] is False
    assert not iv.needs_retrain(spark, root)

    # pre-upgrade delivery (no probe stats): unknown, never a trip
    m["drift"]["probe_recall"] = None
    with open(path, "w") as f:
        _json.dump(m, f)
    rows = {r["seq"]: r for r in iv.drift_report(spark, root).collect()}
    assert rows[max(rows)]["probe_recall"] is None
    assert rows[max(rows)]["probe_recall_low"] is None
    assert not iv.needs_retrain(spark, root)
