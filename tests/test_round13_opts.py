"""Round-13 pins: cross-session memo eviction (VERDICT r12 defect #1)
and optimization-round invariants."""

from __future__ import annotations

import pytest

from ph_ee_nats_importer_rdbms_spark.analytics import search as srch
from ph_ee_nats_importer_rdbms_spark.analytics import similarity as sim


def test_plan_memo_purges_dead_session_entries(spark, sf_dir) -> None:
    """An entry keyed by a stopped session's applicationId can never be
    served again (the DataFrame is bound to its dead session) — any
    insert must purge it, or a session-restarting process (pytest,
    notebooks) grows the dict without bound."""
    app = spark.sparkContext.applicationId
    dead = ("app-DEAD-0000", "q_ann_bruteforce", "/nowhere", None, ("fp",))
    sim._PLAN_MEMO[dead] = "sentinel"
    # drop any same-session cached entry first: the sweep runs on
    # INSERT, so the call below must be a memo MISS regardless of which
    # tests (and plans) ran earlier in this session
    for k in [k for k in sim._PLAN_MEMO if k[0] == app]:
        del sim._PLAN_MEMO[k]
    sim.q_ann_lsh(spark, sf_dir)
    assert dead not in sim._PLAN_MEMO
    assert all(k[0] == app for k in sim._PLAN_MEMO)


def test_bm25_read_cache_purges_dead_session_entries(spark, sf_dir) -> None:
    from ph_ee_nats_importer_rdbms_spark.analytics.incremental_curation import (
        staged_curation_store_root,
    )

    app = spark.sparkContext.applicationId
    dead = ("app-DEAD-0000", "/nowhere", (("000001_base.json", 1, 1),))
    srch._BM25_READ_CACHE[dead] = ((), 0, 0.0, "sentinel")
    root = staged_curation_store_root(spark, sf_dir)
    # drop any same-session cached entry so the read is a cache MISS
    for k in [k for k in srch._BM25_READ_CACHE if k[0] == app]:
        del srch._BM25_READ_CACHE[k]
    srch.read_bm25_search(spark, root)
    assert dead not in srch._BM25_READ_CACHE
    assert all(k[0] == app for k in srch._BM25_READ_CACHE)


# ---------------------------------------------------------------------------
# r13 replay-wrapper parity: the vectorized resolve batch core and the
# rekey fast path must replay sm.resolve_step / sm.rekey_step exactly —
# same emitted rows (order included), same carried state — across
# randomized multi-batch event sequences.
# ---------------------------------------------------------------------------


def _random_flat_events(rng, n, with_parents: bool):
    """n flat-schema events for ONE key group, shuffled timestamps,
    mixed null/empty/real bpmn and (optionally) call-activity links."""
    from ph_ee_nats_importer_rdbms_spark.streaming.pipeline import (
        FLAT_SCHEMA,
        ROUTED_SCHEMA,
    )

    schema = ROUTED_SCHEMA if with_parents else FLAT_SCHEMA
    cols = [f.name for f in schema.fields]
    rows = []
    for i in range(n):
        bpmn = rng.choice([None, "", "proc-a", "proc-b"])
        vt = rng.choice(["PROCESS_INSTANCE", "VARIABLE", "JOB"])
        rows.append(
            {
                **{c: None for c in cols},
                "partition_id": 1,
                "position": i,
                "key": 100 + i,
                "timestamp": int(rng.choice(range(1000, 1020))),
                "record_type": "EVENT",
                "value_type": vt,
                "intent": rng.choice(
                    ["ELEMENT_ACTIVATING", "ELEMENT_COMPLETED", "CREATED"]
                ),
                "bpmn_process_id": bpmn,
                "process_instance_key": 7,
                "process_definition_key": 42,
                "parent_process_instance_key": (
                    int(rng.choice([0, 3, 9])) if with_parents and rng.random() < 0.4 else None
                ),
                "bpmn_element_type": rng.choice(["PROCESS", "SERVICE_TASK"]),
                "element_id": f"el{i % 3}",
                "name": f"v{i % 4}",
                "value": '"x"',
                "job_type": "jt",
            }
        )
    return cols, rows


def _batches(rng, rows, k):
    """Split rows into k contiguous batches."""
    cuts = sorted(rng.sample(range(1, len(rows)), k - 1))
    return [rows[a:b] for a, b in zip([0] + cuts, cuts + [len(rows)])]


def test_resolve_batch_matches_resolve_step() -> None:
    import random

    import pandas as pd

    from ph_ee_nats_importer_rdbms_spark.streaming import pipeline as sp
    from ph_ee_nats_importer_rdbms_spark.streaming import state as sm

    rng = random.Random(1307)
    for trial in range(40):
        cols, rows = _random_flat_events(rng, rng.randint(1, 30), False)
        nb = rng.randint(1, 4)
        batches = (
            [rows]
            if nb == 1 or len(rows) < 2
            else _batches(rng, rows, min(nb, len(rows)))
        )
        ref_state = sm.ResolveState()
        vec_resolved, vec_buffered = None, []
        for batch in batches:
            pdf = pd.DataFrame(batch, columns=cols)
            srt = sorted(batch, key=lambda e: (e["timestamp"], e["position"]))
            ref_state, ref_out = sm.resolve_step(
                ref_state, [dict(e) for e in srt]
            )
            vec_resolved, vec_buffered, vec_pdf = sp._resolve_batch(
                vec_resolved, vec_buffered, pdf
            )
            got = sp._records(vec_pdf)
            assert got == ref_out, f"trial {trial}: emitted rows diverge"
        assert vec_resolved == ref_state.resolved_bpmn
        assert vec_buffered == ref_state.buffered


def test_rekey_batch_matches_rekey_step() -> None:
    import random

    import pandas as pd

    from ph_ee_nats_importer_rdbms_spark.streaming import pipeline as sp
    from ph_ee_nats_importer_rdbms_spark.streaming import state as sm

    rng = random.Random(4113)
    fast_hits = 0
    for trial in range(40):
        cols, rows = _random_flat_events(rng, rng.randint(1, 30), True)
        nb = rng.randint(1, 4)
        batches = (
            [rows]
            if nb == 1 or len(rows) < 2
            else _batches(rng, rows, min(nb, len(rows)))
        )
        ref_state = sm.RekeyState()
        vec_parent = None
        for batch in batches:
            pdf = pd.DataFrame(batch, columns=cols)
            srt = sorted(batch, key=lambda e: (e["timestamp"], e["position"]))
            ref_state, ref_out = sm.rekey_step(
                ref_state, [dict(e) for e in srt]
            )
            if vec_parent is None:
                fast_hits += 1  # counts candidates; the path itself decides
            vec_parent, vec_pdf = sp._rekey_batch(vec_parent, pdf)
            got = sp._records(vec_pdf)
            key = lambda e: (e["timestamp"], e["position"])  # noqa: E731
            assert sorted(got, key=key) == sorted(ref_out, key=key), (
                f"trial {trial}: emitted rows diverge"
            )
        assert vec_parent == ref_state.parent_key
    assert fast_hits > 0
