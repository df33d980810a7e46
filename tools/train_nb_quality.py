"""Offline Naive-Bayes quality-model training (analytics/classifier.py).

One distributed sufficient-statistics pass per known corpus, log-odds
fit in numpy float64, weights frozen as integer micros in ONE artifact
(``analytics/nb_quality.json``) keyed by dataset basename plus a
``default`` — the same per-corpus frozen-model deployment as the IVF
codebooks and the BPE merge table. The DuckDB oracle embeds the
``sf0.01`` model (the driver's oracle gate scale).

Usage: python tools/train_nb_quality.py
       [--sf-dirs /root/testdata/sf0.001 /root/testdata/sf0.01 /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

ARTIFACT = os.path.join(
    _REPO, "ph_ee_nats_importer_rdbms_spark", "analytics", "nb_quality.json"
)

_DEFAULT_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


def _scale_of(d: str) -> float:
    """Parsed scale factor of a corpus dir basename ('sf10' -> 10.0);
    unparseable names rank last."""
    import re as _re

    m = _re.search(r"sf([0-9.]+)", os.path.basename(os.path.normpath(d)))
    try:
        return float(m.group(1)) if m else float("-inf")
    except ValueError:
        return float("-inf")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dirs", nargs="+", default=_DEFAULT_DIRS)
    args = ap.parse_args()

    from ph_ee_nats_importer_rdbms_spark.analytics.classifier import (
        train_nb_for_sf,
    )
    from ph_ee_nats_importer_rdbms_spark.session import build_session

    spark = build_session(app_name="train-nb-quality")
    models: dict[str, dict] = {}
    for sf_dir in args.sf_dirs:
        base = os.path.basename(os.path.normpath(sf_dir))
        m = train_nb_for_sf(spark, sf_dir)
        models[base] = m
        print(
            f"{base}: {len(m['weights'])} weights,"
            f" n_pos={m['n_pos']} n_neg={m['n_neg']}"
        )
    # largest corpus by PARSED scale factor (lexicographic basename would
    # rank 'sf2' over 'sf10'); normpath guards trailing-slash dirs
    default_key = max(args.sf_dirs, key=_scale_of)
    models["default"] = models[os.path.basename(os.path.normpath(default_key))]
    with open(ARTIFACT, "w") as f:
        json.dump({"models": models}, f)
    print(f"wrote {ARTIFACT}")


if __name__ == "__main__":
    main()
