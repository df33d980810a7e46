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


def test_driver_first_entries_lead_the_registry():
    """The driver checks the registry in insertion order up to a cap
    (50 rows); the entries with the stalest driver signal must come
    first. Round 6 rotation: the 19 entries whose last driver row was
    r03 lead; everything this pushes past the cap has >=2 cumulative
    green driver rows across r01-r05."""
    from ph_ee_nats_importer_rdbms_spark.plans.queries import _DRIVER_FIRST

    head = list(QUERIES)[: len(_DRIVER_FIRST)]
    assert head == list(_DRIVER_FIRST)
    # The rotation's whole point: the r03-stale 19 are inside the cap.
    stale_r03 = {
        "doc_fingerprints", "doc_repetition", "dup_ngram_frac",
        "minhash_signatures", "minhash_dups", "dup_clusters",
        "simhash", "simhash_dups", "ngram_jaccard",
        "embedding_dups", "embedding_dup_clusters",
        "ann_bruteforce", "ann_lsh", "ann_lsh_multi", "ann_ivf",
        "semantic_sample", "train_test_split", "decontamination",
        "length_percentiles",
    }
    assert stale_r03 <= set(list(QUERIES)[:50])
