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


def test_embed_lsh_measured_recall_meets_the_stated_floor(spark, tmp_path):
    """Empirical twin of the analytic band-sizing pin (ADVICE r6): on a
    corpus large enough for a MULTI-band structure, measured near-dup
    recall at the stated floor cosine (EMBED_RECALL_FLOOR_COS = 0.8) must
    meet the single-4-plane table's analytic recall (~0.40) — the
    guarantee embed_bands_for sizes bands for. Deterministic: fixed
    seed, fixed plane draw."""
    import numpy as np
    import pandas as pd

    from ph_ee_nats_importer_rdbms_spark.analytics import dedup

    rng = np.random.default_rng(407)
    n_base, n_twins, dim = 3296, 400, dedup.EMBED_DIM
    base = rng.standard_normal((n_base, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    # twins at cosine ~0.82-0.93: v' = normalize(v + eps*g)
    eps = rng.uniform(0.4, 0.7, size=n_twins)
    g = rng.standard_normal((n_twins, dim))
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    twins = base[:n_twins] + eps[:, None] * g
    twins /= np.linalg.norm(twins, axis=1, keepdims=True)
    corpus = np.vstack([base, twins]).astype(np.float32)
    n = len(corpus)

    bands, r = dedup.embed_bands_for(n)
    assert bands > 1, "corpus must exercise the multi-band structure"

    pd.DataFrame(
        {"vec_id": np.arange(n, dtype=np.int64), "embedding": list(corpus)}
    ).to_parquet(str(tmp_path / "embeddings.parquet"))

    found = {
        (r_["vec_a"], r_["vec_b"])
        for r_ in dedup.q_embedding_dups(spark, str(tmp_path)).collect()
        if r_["cosine"] >= dedup.EMBED_RECALL_FLOOR_COS
    }
    # ground truth by brute force (numpy, 13.7M pairs)
    sims = corpus.astype(np.float64) @ corpus.astype(np.float64).T
    ia, ib = np.triu_indices(n, k=1)
    mask = np.round(sims[ia, ib], 4) >= dedup.EMBED_RECALL_FLOOR_COS
    truth = set(zip(ia[mask].tolist(), ib[mask].tolist()))
    assert len(truth) >= 300  # the constructed twins dominate

    recall = len(found & truth) / len(truth)
    floor = dedup._EMBED_DESIGN_P ** 4  # the 4-plane table at the floor
    assert recall >= floor - 0.02, (recall, floor, bands, r)


def test_token_ids_oov_maps_to_unk_zero(spark, tmp_path):
    """token_ids on a corpus whose distinct-token count exceeds
    VOCAB_TOP_K: tokens outside the top-K map to id 0 (<unk>) and are
    counted per doc — the bench corpora never exercise OOV (vocab fits
    the table), so this pins the path on a synthetic corpus."""
    import pandas as pd

    from ph_ee_nats_importer_rdbms_spark.analytics import text as tx

    # 120 distinct rare tokens (1 occurrence each) + 3 hot tokens — the
    # hot ones dominate the top-100 table, 20+ rare ones fall out
    docs = []
    for i in range(120):
        docs.append(
            {
                "doc_id": i,
                "text": f"alpha beta gamma rare{i:03d}",
                "lang": "en",
                "source": "synt",
                "n_chars": 30,
            }
        )
    pd.DataFrame(docs).to_parquet(str(tmp_path / "documents.parquet"))

    out = {
        r["doc_id"]: r
        for r in tx.token_ids_of(spark, str(tmp_path)).collect()
    }
    assert len(out) == 120
    vocab = {
        r["token"]: r["rank"]
        for r in tx.q_vocabulary(spark, str(tmp_path)).collect()
    }
    assert len(vocab) == tx.VOCAB_TOP_K  # table is full -> OOV exists
    n_oov_docs = 0
    for i, r in out.items():
        ids = r["token_ids"]
        assert len(ids) == 4
        # the three hot tokens always rank 1..3 (count 120 each)
        assert set(ids[:3]) == {vocab["alpha"], vocab["beta"], vocab["gamma"]}
        tok = f"rare{i:03d}"
        want = vocab.get(tok, 0)
        assert ids[3] == want
        assert r["n_unk"] == (1 if want == 0 else 0)
        n_oov_docs += 1 if want == 0 else 0
    assert n_oov_docs == 120 - (tx.VOCAB_TOP_K - 3)


def test_bench_materialize_forces_every_column(spark):
    """bench.materialize must evaluate EVERY output column: count() lets
    Catalyst prune map-only projections (a per-doc scorer would 'run' in
    0.1s at any scale without computing its score). A column whose
    evaluation raises proves the point: count() succeeds, materialize
    must fail."""
    import sys

    import pytest as _pytest
    from pyspark.sql import functions as F
    from pyspark.sql.types import IntegerType

    sys.path.insert(0, "/root/repo")
    from bench import materialize

    @F.udf(IntegerType())
    def boom(x):
        raise RuntimeError("column was evaluated")

    df = spark.range(8).select("id", boom("id").alias("scored"))
    assert df.count() == 8  # count() never evaluates 'scored'
    with _pytest.raises(Exception, match="column was evaluated"):
        materialize(df)
    # and on an honest frame it returns the row count
    assert materialize(spark.range(8).selectExpr("id", "id * 2 AS y")) == 8
