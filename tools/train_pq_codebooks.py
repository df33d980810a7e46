"""Offline product-quantization codebook training for the ANN serving path.

PQ is the memory side of the 100 TB ANN story (Jégou et al., "Product
Quantization for Nearest Neighbor Search", TPAMI 2011): split each
64-dim embedding into M=8 contiguous 8-dim subvectors, k-means each
subspace into K=16 centroids, and store each vector as 8 small codes —
64 float32s (256 B) become 8 code bytes, so a corpus whose raw vectors
need a cluster's worth of RAM fits in one machine's memory for the
coarse scoring pass. Search scores candidates with an asymmetric
distance computation (exact query subvectors against code centroids),
then re-ranks a small candidate pool with exact cosine.

Like the IVF tool (train_ivf_centroids.py), training is per-corpus —
FAISS's ``train()`` pattern — with one artifact
(``analytics/pq_codebooks.json``) holding a codebook per dataset basename
plus a ``default``. Training runs Lloyd's algorithm in numpy on the
collected embedding sample: a PQ training set is a SAMPLE by design (the
subspaces are 8-dim; 20k points per subspace is generous), so the
driver-side fit is the honest offline shape, not a scalability cheat —
at 100 TB you'd train on the same-sized sample of the corpus.

Values are float32-round-tripped so the decimal literals embedded in the
DuckDB oracle parse to the exact doubles Spark computes with.

Usage: python tools/train_pq_codebooks.py [--m 8] [--k 16]
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
    _REPO, "ph_ee_nats_importer_rdbms_spark", "analytics", "pq_codebooks.json"
)

_DEFAULT_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


def _lloyd(x: np.ndarray, k: int, iters: int, seed: int) -> tuple[np.ndarray, float]:
    """Plain Lloyd k-means (L2) with k-means++-ish seeding; returns
    (centroids, objective)."""
    rng = np.random.default_rng(seed)
    # k-means++ seeding
    cents = [x[rng.integers(len(x))]]
    for _ in range(k - 1):
        d2 = np.min(
            ((x[:, None, :] - np.asarray(cents)[None, :, :]) ** 2).sum(-1), axis=1
        )
        probs = d2 / d2.sum() if d2.sum() > 0 else None
        cents.append(x[rng.choice(len(x), p=probs)])
    c = np.asarray(cents, dtype=np.float64)
    for _ in range(iters):
        d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(-1)
        assign = d2.argmin(axis=1)
        new_c = np.vstack(
            [
                x[assign == j].mean(axis=0) if np.any(assign == j) else c[j]
                for j in range(k)
            ]
        )
        if np.allclose(new_c, c):
            c = new_c
            break
        c = new_c
    d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(-1)
    return c, float(d2.min(axis=1).sum())


#: training-set cap: a PQ/k-means training set is a SAMPLE by design
#: (FAISS trains k=16 codebooks on tens of thousands of points; 500k is
#: ~100x that). Corpora above the cap train on a deterministic
#: hash-sample instead of a driver-OOM-sized whole-corpus collect —
#: existing artifact keys are merged, never retrained, so shipped
#: codebooks (and the sf0.01 oracle literals) are unaffected.
TRAIN_SAMPLE_CAP = 500_000


def _train_corpus(
    spark, sf_dir: str, m: int, k: int, iters: int, seeds
) -> list[list[list[float]]]:
    from pyspark.sql import functions as F

    from ph_ee_nats_importer_rdbms_spark.sources.files import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    if n > TRAIN_SAMPLE_CAP:
        frac_ppm = int(1_000_000 * TRAIN_SAMPLE_CAP / n)
        emb = emb.filter(
            F.pmod(F.xxhash64(F.col("vec_id"), F.lit("pq-train")), F.lit(1_000_000))
            < frac_ppm
        )
    rows = emb.select("embedding").toPandas()["embedding"]
    x = np.asarray([np.asarray(v, dtype=np.float64) for v in rows])
    dim = x.shape[1]
    dsub = dim // m
    books = []
    for mi in range(m):
        sub = x[:, mi * dsub : (mi + 1) * dsub]
        best, best_cost = None, float("inf")
        for seed in seeds:
            c, cost = _lloyd(sub, k, iters, seed)
            if cost < best_cost:
                best, best_cost = c, cost
        books.append(
            [[float(v) for v in np.asarray(c, dtype=np.float32)] for c in best]
        )
    return books


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dirs", nargs="*", default=_DEFAULT_DIRS)
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--seeds", type=int, nargs="*", default=[7, 11, 13])
    ap.add_argument("--default-from", default="sf0.1")
    args = ap.parse_args()

    from ph_ee_nats_importer_rdbms_spark.session import build_session

    spark = build_session(app_name="pq-codebook-training")
    # MERGE into the existing artifact (see train_ivf_centroids.py): a
    # scaled-bench training run must not clobber the shipped books, and
    # m/k must match the artifact or the merged books are incomparable.
    codebooks = {}
    if os.path.exists(ARTIFACT):
        with open(ARTIFACT) as f:
            existing = json.load(f)
        if existing.get("m") == args.m and existing.get("k") == args.k:
            codebooks.update(existing["codebooks"])
        else:
            print(
                f"m/k differ from artifact ({existing.get('m')}x"
                f"{existing.get('k')} vs {args.m}x{args.k}): full retrain",
                file=sys.stderr,
            )
    for sf_dir in args.sf_dirs:
        base = os.path.basename(os.path.normpath(sf_dir))
        codebooks[base] = _train_corpus(
            spark, sf_dir, args.m, args.k, args.iters, args.seeds
        )
        print(f"trained {base}: {args.m} subspaces x {args.k} codes")
    if args.default_from in codebooks:
        codebooks["default"] = codebooks[args.default_from]
    payload = {
        "m": args.m,
        "k": args.k,
        "seeds": args.seeds,
        "distance": "l2-per-subspace",
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
