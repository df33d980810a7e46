"""Offline BPE merge-table training for the subword encode path.

The deployment story (analytics/bpe.py): a tokenizer is trained ONCE on
the corpus being encoded and versioned with the dataset — this tool is
that offline step, writing ONE artifact
(``analytics/bpe_merges.json``) holding a merge list per dataset
basename plus a ``default`` for unknown corpora. Per-corpus merge
tables for the same reason as the IVF codebooks: the driver's
sf0.01/sf0.1 corpora are independently generated, and a merge table
fits the corpus it was trained on. The DuckDB oracle embeds the
``sf0.01`` table — the driver's oracle gate runs at sf0.01 by contract.

Usage: python tools/train_bpe.py [--n-merges 40]
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
    _REPO, "ph_ee_nats_importer_rdbms_spark", "analytics", "bpe_merges.json"
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
    ap.add_argument("--n-merges", type=int, default=40)
    ap.add_argument("--sf-dirs", nargs="+", default=_DEFAULT_DIRS)
    args = ap.parse_args()

    from ph_ee_nats_importer_rdbms_spark.analytics.bpe import train_bpe_for_sf
    from ph_ee_nats_importer_rdbms_spark.session import build_session

    spark = build_session(app_name="train-bpe")
    merges: dict[str, list[list[str]]] = {}
    for sf_dir in args.sf_dirs:
        base = os.path.basename(os.path.normpath(sf_dir))
        table = train_bpe_for_sf(spark, sf_dir, args.n_merges)
        merges[base] = [list(m) for m in table]
        print(f"{base}: {len(table)} merges, head={table[:5]}")
    # unknown corpora get the largest trained table (the most statistics);
    # select by PARSED scale factor, not lexicographic basename ('sf2'
    # would beat 'sf10'), and normpath before basename so a trailing
    # slash can't yield '' here while the dict key used normpath
    default_key = max(args.sf_dirs, key=_scale_of)
    merges["default"] = merges[os.path.basename(os.path.normpath(default_key))]
    with open(ARTIFACT, "w") as f:
        json.dump({"n_merges": args.n_merges, "merges": merges}, f)
    print(f"wrote {ARTIFACT}")


if __name__ == "__main__":
    main()
