"""Round-10 pins (VERDICT r9 task #3): SemDeDup's within-cluster pair
join is occupancy-bounded.

The within-cluster self-join used to shuffle on cluster_id alone — one
HOT cluster (a drifted corpus against a frozen codebook) put the whole
|C|² pair generation into a single task, the quadratic the rest of the
codebase routes around (DECON_MAX_DF, DUP_NGRAM_HOT_DF). The join now
hash-splits clusters above SEMDEDUP_OCC_CAP into sub-buckets and salts
BOTH sides over them, so per-task work is ~cap² while every ordered
pair is still generated exactly once (exact semantics, any occupancy).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ph_ee_nats_importer_rdbms_spark.analytics import similarity as sim


def _synthetic_hot_cluster(spark, n_hot: int, n_cold: int):
    """A ``v``-shaped relation (vec_id, cluster_id, embedding, ccos, nrm)
    with ONE hot cluster of ``n_hot`` members plus a small second
    cluster — deterministic, no RNG (index-derived embeddings)."""
    rows = []
    for i in range(n_hot + n_cold):
        cluster = 0 if i < n_hot else 1
        emb = [float(1 + (i % 7)), float((i * 3) % 5), float(i % 2)]
        nrm = math.sqrt(sum(x * x for x in emb))
        rows.append((i, cluster, emb, round(1.0 / (1 + i), 6), nrm))
    return spark.createDataFrame(
        rows,
        "vec_id LONG, cluster_id INT, embedding ARRAY<DOUBLE>,"
        " ccos DOUBLE, nrm DOUBLE",
    )


def test_semdedup_hot_cluster_pairs_exact_and_bounded(spark):
    """At 30× the design occupancy (240 members, cap 8) the sub-bucketed
    join generates EXACTLY the naive join's ordered pair set, and no
    join task's candidate block exceeds ~cap² (hash-balance slack 3×
    per side)."""
    cap = 8
    v = _synthetic_hot_cluster(spark, n_hot=240, n_cold=10)

    naive = sim._semdedup_cluster_pairs(v, occ_cap=10**9)
    bounded = sim._semdedup_cluster_pairs(v, occ_cap=cap)

    key = ["vec_a", "vec_b"]
    naive_pairs = {tuple(r) for r in naive.select(*key).collect()}
    bounded_pairs = {tuple(r) for r in bounded.select(*key).collect()}
    assert bounded_pairs == naive_pairs
    # sanity on the naive set itself: all ordered within-cluster pairs
    assert len(naive_pairs) == 240 * 239 + 10 * 9

    # every pair generated exactly once (no duplicate rows from salting)
    assert bounded.select(*key).count() == len(bounded_pairs)

    # the split actually engaged: nsub = ceil(240/8) = 30 sub-buckets
    nsub = math.ceil(240 / cap)
    sb = v.filter(F.col("cluster_id") == 0).select(
        F.pmod(F.xxhash64("vec_id"), F.lit(nsub)).cast("int").alias("sb")
    )
    sizes = [
        r["n"]
        for r in sb.groupBy("sb").agg(F.count(F.lit(1)).alias("n")).collect()
    ]
    assert len(sizes) > 1, "sub-bucketing did not engage on the hot cluster"
    # per-task pair block = |sb_a| x |sb_b| <= (3*cap)^2 under hash skew
    assert max(sizes) <= 3 * cap, f"sub-bucket occupancy {max(sizes)} > 3x cap"


def test_semdedup_build_invariant_under_occupancy_cap(spark, sf_dir, monkeypatch):
    """The full operator's OUTPUT is cap-invariant on real data: forcing
    maximal splitting (cap=1 — every member its own sub-bucket) produces
    the identical labeled relation as the unbounded join, so the staged
    entry's oracle equality is untouched by the bounding."""
    unbounded = sim._semdedup_build(spark, sf_dir)
    monkeypatch.setattr(sim, "SEMDEDUP_OCC_CAP", 1)
    forced = sim._semdedup_build(spark, sf_dir)
    cols = ["vec_id", "cluster_id", "centroid_cos", "dropped", "dup_of"]
    assert sorted(map(tuple, unbounded.select(*cols).collect())) == sorted(
        map(tuple, forced.select(*cols).collect())
    )


def test_semdedup_codebook_scales_with_corpus_but_copies_oracle_books():
    """SemDeDup's dedicated clustering artifact (the decade-run fix —
    frozen nlist=16 measured quadratic at sf10): at the oracle scales
    the books are VERBATIM copies of the ANN books, so results and the
    driver gate are unchanged; the big-corpus books are occupancy-
    targeted (k within 2x of N/target), which is what keeps the
    within-cluster pair join linear-per-vector."""
    import json
    import os

    from ph_ee_nats_importer_rdbms_spark.analytics import similarity as sim

    art = json.load(open(sim._SEMDEDUP_ARTIFACT))
    books = art["codebooks"]
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        assert books[sf] == sim.IVF_CODEBOOKS[sf], f"{sf} book diverged"
    # the serving lookup resolves copies + falls back to the ANN book
    assert sim._semdedup_codebook("/x/sf0.01") == sim.IVF_CODEBOOKS["sf0.01"]
    assert sim._semdedup_codebook("/x/unknown") == sim.IVF_CODEBOOKS["default"]
    target = int(art["target_occupancy"])
    scaled = {
        sf: b
        for sf, b in books.items()
        if sf not in ("sf0.001", "sf0.01", "sf0.1", "sf1", "default")
    }
    assert scaled, "no occupancy-targeted big-corpus book in the artifact"
    expected_n = {"sf10": 200_000, "sf100": 2_000_000}
    for sf, book in scaled.items():
        n = expected_n.get(sf)
        if n is None:
            continue
        k = len(book)
        assert n / (2 * target) <= k <= max(16, 2 * n / target), (
            f"{sf}: k={k} is not occupancy-targeted for n={n}"
        )
