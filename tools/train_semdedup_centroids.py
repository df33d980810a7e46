"""Offline training of SemDeDup's clustering codebooks.

SemDeDup (analytics/similarity.q_semdedup) compares pairs only WITHIN a
cluster, so its cost per vector is ~occupancy/2 — bounded only if the
cluster count grows with the corpus (Abbas et al. run 50k clusters on
LAION). The ANN serving books (ivf_centroids.json) are sized for the
nprobe/nlist serving trade-off instead and froze at nlist=16; reusing
them made SemDeDup quadratic in the corpus, measured directly by the
sf0.1→sf10 decade run (3.0s → 1067s cold, ~356x for 100x data). This
tool writes SemDeDup's OWN artifact (``semdedup_centroids.json``):

- the oracle scales (sf0.001/sf0.01/sf0.1, sf1, default) COPY the ANN
  books verbatim — same clusters, same results, the driver's DuckDB
  gate is unchanged;
- large corpora get occupancy-targeted books: k = max(16, ceil(N /
  SEMDEDUP_TARGET_OCC)), trained by cosine k-means on a deterministic
  hash-sample (the FAISS train()-on-a-sample contract; the full-corpus
  collect was exactly the r9 PQ-trainer bug class, so the cap is
  load-bearing).

Values round-trip through float32 so oracle SQL literals parse to the
exact doubles Spark computes with (same contract as the ANN books).

Usage: python tools/train_semdedup_centroids.py
       [--sf-dirs DIR ...] [--target-occ 512] [--max-iter 20]
       [--sample-cap 200000]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

ARTIFACT = os.path.join(
    _REPO,
    "ph_ee_nats_importer_rdbms_spark",
    "analytics",
    "semdedup_centroids.json",
)
IVF_ARTIFACT = os.path.join(
    _REPO, "ph_ee_nats_importer_rdbms_spark", "analytics", "ivf_centroids.json"
)

#: scales whose books are verbatim ANN-book copies (oracle parity)
COPY_SCALES = ("sf0.001", "sf0.01", "sf0.1", "sf1", "default")


def _f32(vec) -> list[float]:
    return [float(np.float32(v)) for v in vec]


def train_book(spark, sf_dir: str, target_occ: int, max_iter: int, cap: int):
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import functions as F

    from ph_ee_nats_importer_rdbms_spark.analytics import batch_store as bs
    from ph_ee_nats_importer_rdbms_spark.sources.files import load_table

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n = e.count()
    k = max(16, math.ceil(n / target_occ))
    sample = bs.hash_subsample(e, n, cap, key="vec_id", salt="semdedup")
    feats = sample.select(
        array_to_vector(F.col("embedding").cast("array<double>")).alias(
            "features"
        )
    )
    km = KMeans(
        k=k,
        maxIter=max_iter,
        distanceMeasure="cosine",
        seed=7,
        initMode="k-means||",
    )
    model = km.fit(feats)
    print(f"{os.path.basename(sf_dir)}: n={n} k={k} "
          f"cost={model.summary.trainingCost:.1f}")
    return [_f32(c) for c in model.clusterCenters()]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dirs", nargs="+", default=[])
    ap.add_argument("--target-occ", type=int, default=512)
    ap.add_argument("--max-iter", type=int, default=20)
    ap.add_argument("--sample-cap", type=int, default=200_000)
    args = ap.parse_args()

    ivf = json.load(open(IVF_ARTIFACT))
    books = {
        sf: ivf["codebooks"][sf]
        for sf in COPY_SCALES
        if sf in ivf["codebooks"]
    }
    if os.path.exists(ARTIFACT):  # keep previously trained big-corpus books
        books.update(
            {
                sf: b
                for sf, b in json.load(open(ARTIFACT))["codebooks"].items()
                if sf not in COPY_SCALES
            }
        )

    if args.sf_dirs:
        from ph_ee_nats_importer_rdbms_spark.session import build_session

        spark = build_session(app_name="train-semdedup-centroids")
        for sf_dir in args.sf_dirs:
            base = os.path.basename(os.path.normpath(sf_dir))
            books[base] = train_book(
                spark, sf_dir, args.target_occ, args.max_iter, args.sample_cap
            )

    with open(ARTIFACT, "w") as f:
        json.dump(
            {
                "target_occupancy": args.target_occ,
                "distance": "cosine",
                "codebooks": books,
            },
            f,
        )
    print(f"wrote {ARTIFACT}: " + ", ".join(
        f"{sf}(k={len(b)})" for sf, b in sorted(books.items())
    ))


if __name__ == "__main__":
    main()
