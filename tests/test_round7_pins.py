"""Round-7 pins: the serving-path job discipline and rotation policy.

Pins the VERDICT r6 task contracts:
- ann_search with an unknown-size query relation must route WITHOUT a
  COUNT job over the relation (a bounded peek is the ceiling), on both
  the small/driver-LUT and large/engine-LUT routes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.usefixtures("spark")


def _foreign_queries(spark, sf_dir, n, offset=700_000):
    from ph_ee_nats_importer_rdbms_spark.sources.files import load_table, spread

    e = spread(load_table(spark, sf_dir, "embeddings"))
    return e.filter(F.col("vec_id") < n).select(
        (F.col("vec_id") + offset).alias("query_id"),
        F.col("embedding").alias("q_emb"),
    )


def test_ann_search_unknown_size_routing_never_counts(
    spark, sf_dir, monkeypatch
):
    """VERDICT r6 #4: no COUNT job in the serving path. With n_queries
    unknown, the router peeks at most PQ_LUT_DRIVER_MAX+1 rows; .count()
    on ANY DataFrame during plan construction or execution is a bug."""
    from ph_ee_nats_importer_rdbms_spark.analytics import similarity as sim

    # warm the staged artifacts outside the patch window (staging builds
    # are ingest-time cost, not serving-path cost)
    sim.q_ann_pq(spark, sf_dir).collect()

    def no_count(self, *a, **k):  # pragma: no cover - must not run
        raise AssertionError("COUNT job in the ann_search serving path")

    monkeypatch.setattr(
        "pyspark.sql.classic.dataframe.DataFrame.count", no_count,
        raising=True,
    )

    # small unknown-size set: the peek IS the driver-LUT collect
    out = sim.ann_search(
        spark, sf_dir, _foreign_queries(spark, sf_dir, 2),
        k=3, exclude_self=False,
    ).collect()
    tops = {
        r["query_id"]: r["vec_id"] for r in out if r["rank"] == 1
    }
    assert tops == {700_000: 0, 700_001: 1}

    # large unknown-size set (router cap lowered): bounded peek, engine
    # LUT, still no count
    monkeypatch.setattr(sim, "PQ_LUT_DRIVER_MAX", 4)
    called = {}
    orig = sim._pq_query_lut_distributed

    def recording(*a, **k):
        called["engine"] = True
        return orig(*a, **k)

    monkeypatch.setattr(sim, "_pq_query_lut_distributed", recording)
    out2 = sim.ann_search(
        spark, sf_dir, _foreign_queries(spark, sf_dir, 8),
        k=3, exclude_self=False,
    ).collect()
    assert called.get("engine"), "large route must use the engine-side LUT"
    tops2 = {r["query_id"]: r["vec_id"] for r in out2 if r["rank"] == 1}
    assert tops2[700_000] == 0 and len(tops2) == 8
