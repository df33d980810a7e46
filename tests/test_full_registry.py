"""Full-registry oracle gate (VERDICT r3 ask #1).

The per-round correctness driver snapshots the registry with a cap
(round 3: first 50 of 61 entries), so an entry past the cap could
regress without a driver signal. This gate closes that hole: EVERY
``plans/queries.py`` registry entry runs against its DuckDB oracle on
every pytest run, parametrized so a single entry's failure is
individually visible. Entries with no oracle (by design — e.g. the
Greenwald-Khanna sketch percentiles) are still executed for
schema/row-production sanity; their value gates live in dedicated tests.

The gate runs at sf0.01 — the DRIVER'S contract scale: the ANN oracles
embed the sf0.01 codebook literals (``similarity.ORACLE_SF_BASE``), so
they are value-exact only against the sf0.01 corpus by design.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from ph_ee_nats_importer_rdbms_spark.plans.queries import QUERIES  # noqa: E402
from check_oracles import compare_query, open_oracle_connection  # noqa: E402


pytestmark = pytest.mark.slow  # heavy Spark gate; default selection skips (pytest.ini), round-close runs all


@pytest.fixture(scope="module")
def oracle_sf_dir():
    """The driver's oracle-gate scale (NOT conftest's sf0.001): the ANN
    oracle SQL embeds per-corpus codebook literals trained on sf0.01."""
    from ph_ee_nats_importer_rdbms_spark.analytics.similarity import (
        ORACLE_SF_BASE,
    )

    return os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", f"/root/testdata/{ORACLE_SF_BASE}"
    )


@pytest.fixture(scope="module")
def oracle_con(oracle_sf_dir):
    con = open_oracle_connection(oracle_sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", list(QUERIES))
def test_registry_entry_matches_oracle(spark, oracle_sf_dir, oracle_con, name):
    ok, msg = compare_query(spark, oracle_con, name, oracle_sf_dir)
    assert ok, f"{name}: {msg}"


def test_driver_row_rotation_policy():
    """The STANDING rotation policy (VERDICT r6 task #2, r7 task #1): the
    registry orders itself by driver-row staleness — never-rowed entries
    first, then ascending last-driver-round — DERIVED at import time from
    the repo's CORRECTNESS_r*.json artifacts, so a fresh driver drop can
    never make the suite red. Gates:
    (b) the registry iteration order is monotone in staleness,
    (c) every entry at least 1 round stale sits inside the cap — so
        after the NEXT driver snapshot, no gap exceeds 2 rounds."""
    from ph_ee_nats_importer_rdbms_spark.plans.queries import (
        DRIVER_ROW_CAP,
        _DRIVER_ROW_LAST_ROUND,
    )

    # sanity: derivation found the repo's artifacts (rounds 1+ exist)
    assert _DRIVER_ROW_LAST_ROUND, "no CORRECTNESS_r*.json artifacts found"
    max_round = max(_DRIVER_ROW_LAST_ROUND.values())

    # (b) monotone staleness order
    rounds = [_DRIVER_ROW_LAST_ROUND.get(n, -1) for n in QUERIES]
    assert rounds == sorted(rounds)

    # (c) everything stale is inside the cap (cap covers > half the
    # registry, so rotation bounds any entry's gap at 2 rounds)
    head = set(list(QUERIES)[:DRIVER_ROW_CAP])
    assert DRIVER_ROW_CAP * 2 >= len(QUERIES), (
        "registry outgrew 2*cap: rotation can no longer bound the gap at "
        "2 rounds — split the registry or raise the cap"
    )
    stale = [
        n
        for n in QUERIES
        if _DRIVER_ROW_LAST_ROUND.get(n, -1) < max_round
    ]
    missing = [n for n in stale if n not in head]
    assert not missing, (
        f"stale entries outside the {DRIVER_ROW_CAP}-row cap: {missing}"
    )


def test_driver_snapshot_head_is_exactly_the_owed_set():
    """Registry-order CONTRACT (VERDICT r7 task #7): the first
    DRIVER_ROW_CAP entries of QUERIES must contain every entry the
    rotation owes a row next round — the never-rowed plus everything
    stale vs the latest artifact — and the owed set must lead the
    iteration order (head[:len(owed)] == owed), so a future registry
    addition can't silently push an owed entry past the cap."""
    from ph_ee_nats_importer_rdbms_spark.plans.queries import (
        DRIVER_ROW_CAP,
        _DRIVER_ROW_LAST_ROUND,
    )

    max_round = max(_DRIVER_ROW_LAST_ROUND.values())
    owed = {
        n for n in QUERIES if _DRIVER_ROW_LAST_ROUND.get(n, -1) < max_round
    }
    assert len(owed) <= DRIVER_ROW_CAP, (
        f"{len(owed)} owed entries exceed the {DRIVER_ROW_CAP}-row cap"
    )
    names = list(QUERIES)
    assert set(names[: len(owed)]) == owed, (
        "owed entries do not lead the registry order: "
        f"{owed - set(names[: len(owed)])}"
    )


def test_rotation_survives_future_driver_artifact(tmp_path):
    """Simulate the exact event that made round 7's suite red: the driver
    drops a fresh CORRECTNESS_r{N+1}.json AFTER the builder's last commit.
    Copy the real artifacts into a temp dir, synthesize the next round's
    snapshot as the current head-50, re-derive, and assert the invariants
    still hold — with the previously-freshest (now stalest) entries
    leading the new order."""
    import glob
    import json
    import shutil

    from ph_ee_nats_importer_rdbms_spark.plans.queries import (
        DRIVER_ROW_CAP,
        derive_driver_row_last_round,
        order_registry,
    )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for p in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        shutil.copy(p, tmp_path / os.path.basename(p))

    current = derive_driver_row_last_round(str(tmp_path))
    cur_max = max(current.values())
    head_now = list(order_registry(current))[:DRIVER_ROW_CAP]

    fake = {
        n: {"rows_match": True, "schema_match": True, "hash_match": True}
        for n in head_now
    }
    with open(tmp_path / f"CORRECTNESS_r{cur_max + 1:02d}.json", "w") as f:
        json.dump(fake, f)

    future = derive_driver_row_last_round(str(tmp_path))
    future_q = order_registry(future)

    # the next round's snapshot rows all advanced to cur_max + 1
    assert all(future[n] == cur_max + 1 for n in head_now)

    # invariants (b) and (c) hold against the future artifacts with NO
    # code change — the red-at-round-boundary failure mode is gone
    rounds = [future.get(n, -1) for n in future_q]
    assert rounds == sorted(rounds)
    owed = {n for n in future_q if future.get(n, -1) < cur_max + 1}
    head_next = list(future_q)[:DRIVER_ROW_CAP]
    assert owed <= set(head_next)
    # the entries the r{N+1} snapshot missed are exactly the ones that
    # lead the r{N+2} order
    assert set(head_next[: len(owed)]) == owed
