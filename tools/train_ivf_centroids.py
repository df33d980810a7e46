"""Offline IVF centroid training (k-means) for the ANN serving path.

The deployment story for IVF (analytics/similarity.py) is: train k-means
ONCE offline on a corpus sample, ship the centroids as config, assign the
full corpus to inverted lists with a broadcast argmax. This tool is that
offline step — ``pyspark.ml.clustering.KMeans`` with cosine distance over
the embeddings table — and it checks the learned centroids into the repo
as a JSON artifact (``analytics/ivf_centroids.json``) that BOTH the Spark
query and the DuckDB oracle read, so the two engines replay identical
centroid literals. (Training on sf0.1 and assigning any corpus is the
standard sampled-training IVF pattern, e.g. FAISS `train()` on a subset.)

Values are round-tripped through float32 so the decimal literals in the
oracle SQL parse to the exact doubles Spark computes with.

Usage: python tools/train_ivf_centroids.py [--sf-dir /root/testdata/sf0.1]
       [--k 16] [--seed 7]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

ARTIFACT = os.path.join(
    _REPO, "ph_ee_nats_importer_rdbms_spark", "analytics", "ivf_centroids.json"
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--max-iter", type=int, default=40)
    args = ap.parse_args()

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from ph_ee_nats_importer_rdbms_spark.session import build_session
    from ph_ee_nats_importer_rdbms_spark.sources.files import load_table

    spark = build_session(app_name="ivf-centroid-training")
    emb = load_table(spark, args.sf_dir, "embeddings").select(
        array_to_vector("embedding").alias("features")
    )
    model = KMeans(
        k=args.k,
        seed=args.seed,
        maxIter=args.max_iter,
        distanceMeasure="cosine",
    ).fit(emb)
    # float32 round-trip: shortest-repr decimals that parse back to the
    # same doubles in Spark and DuckDB
    cents = [
        [float(v) for v in np.asarray(c, dtype=np.float32)]
        for c in model.clusterCenters()
    ]
    payload = {
        "k": args.k,
        "dim": len(cents[0]),
        "seed": args.seed,
        "distance": "cosine",
        "trained_on": os.path.basename(os.path.normpath(args.sf_dir)),
        "centroids": cents,
    }
    with open(ARTIFACT, "w") as f:
        json.dump(payload, f)
        f.write("\n")
    print(f"wrote {args.k}x{payload['dim']} centroids -> {ARTIFACT}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
