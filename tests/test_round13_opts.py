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
