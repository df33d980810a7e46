"""Offline IVF codebook training (k-means) for the ANN serving path.

The deployment story for IVF (analytics/similarity.py) is: train k-means
offline ON THE CORPUS BEING INDEXED (or a sample of it — FAISS's
``train()`` pattern), ship the centroids as config, assign the corpus to
inverted lists with a broadcast argmax. This tool is that offline step —
``pyspark.ml.clustering.KMeans`` with cosine distance, best objective of
several seeds — run once per known dataset, writing ONE artifact
(``analytics/ivf_centroids.json``) holding a codebook per dataset
basename plus a ``default`` for unknown corpora. Per-corpus codebooks
matter here because the driver's sf0.01/sf0.1 testdata are independently
generated corpora, not subsets: a codebook fits the corpus it was
trained on (measured recall@10 ≈ 0.58 on-corpus vs ≈ 0.43 cross-corpus
vs 0.41 for round-2's fixed vector subset).

Values are round-tripped through float32 so the decimal literals in the
oracle SQL parse to the exact doubles Spark computes with. The DuckDB
oracle embeds the ``sf0.01`` codebook — the driver's oracle gate runs at
sf0.01 by contract.

Usage: python tools/train_ivf_centroids.py [--k 16] [--max-iter 60]
       [--sf-dirs /root/testdata/sf0.001 /root/testdata/sf0.01 /root/testdata/sf0.1]
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

_DEFAULT_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


def _train(spark, sf_dir: str, k: int, max_iter: int, seeds) -> list[list[float]]:
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from ph_ee_nats_importer_rdbms_spark.sources.files import load_table

    emb = load_table(spark, sf_dir, "embeddings").select(
        array_to_vector("embedding").alias("features")
    )
    emb = emb.localCheckpoint(eager=True)  # train several seeds off one scan
    best_cost, best = float("inf"), None
    for seed in seeds:
        model = KMeans(
            k=k, seed=seed, maxIter=max_iter, distanceMeasure="cosine"
        ).fit(emb)
        cost = model.summary.trainingCost
        if cost < best_cost:
            best_cost, best = cost, model
    return [
        [float(v) for v in np.asarray(c, dtype=np.float32)]
        for c in best.clusterCenters()
    ]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dirs", nargs="*", default=_DEFAULT_DIRS)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--max-iter", type=int, default=60)
    ap.add_argument("--seeds", type=int, nargs="*", default=[7, 11, 13, 17])
    ap.add_argument(
        "--default-from",
        default="sf0.1",
        help="dataset basename whose codebook serves unknown corpora",
    )
    args = ap.parse_args()

    from ph_ee_nats_importer_rdbms_spark.session import build_session

    spark = build_session(app_name="ivf-codebook-training")
    # MERGE into the existing artifact: training one new corpus (e.g. a
    # scaled bench dir) must not clobber the shipped per-corpus books —
    # the oracle SQL embeds sf0.01's literals and every staged dataset
    # fingerprints this file.
    codebooks: dict[str, list[list[float]]] = {}
    if os.path.exists(ARTIFACT):
        with open(ARTIFACT) as f:
            existing = json.load(f)
        if existing.get("k") == args.k:
            codebooks.update(existing["codebooks"])
        else:
            print(
                f"WARNING: existing artifact has k={existing.get('k')}, "
                f"requested k={args.k}: shipped per-corpus books will be "
                "dropped (full clobber)",
                file=sys.stderr,
            )
    dim = None
    for sf_dir in args.sf_dirs:
        base = os.path.basename(os.path.normpath(sf_dir))
        cents = _train(spark, sf_dir, args.k, args.max_iter, args.seeds)
        codebooks[base] = cents
        dim = len(cents[0])
        print(f"trained {base}: {args.k}x{dim}")
    if args.default_from in codebooks:
        codebooks["default"] = codebooks[args.default_from]
    if dim is None:
        if "default" not in codebooks:
            raise SystemExit(
                "no corpus trained (empty --sf-dirs) and the existing "
                "artifact carries no 'default' codebook — nothing to write"
            )
        dim = len(codebooks["default"][0])
    payload = {
        "k": args.k,
        "dim": dim,
        "seeds": args.seeds,
        "distance": "cosine",
        "codebooks": codebooks,
    }
    with open(ARTIFACT, "w") as f:
        json.dump(payload, f)
        f.write("\n")
    print(f"wrote {len(codebooks)} codebooks -> {ARTIFACT}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
