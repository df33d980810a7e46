"""Physical-plan audit: print/inspect the formatted plan of registry
queries and flag the scale smells the repo's design rules forbid.

Checks per query:
- filter/column pushdown reaches the parquet scan (PushedFilters /
  ReadSchema narrower than the table),
- small dimensions join as BroadcastHashJoin (never shuffle the fact side
  for a lookup),
- no CartesianProduct / BroadcastNestedLoopJoin in the hot path,
- Python evaluation (ArrowEvalPython/BatchEvalPython) only where declared
  (multimodal decode is the single sanctioned Python stage).

Usage: python tools/explain_audit.py [sf_dir] [query ...] [-v]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ph_ee_nats_importer_rdbms_spark.plans.queries import QUERIES
from ph_ee_nats_importer_rdbms_spark.session import build_session

#: queries where Python evaluation is by design: media_features is the
#: Arrow-batched decode stage; pack_sequences is the per-shard greedy
#: packing fold (inherently sequential per shard, Arrow-batched
#: applyInPandas, shards scale out)
PYTHON_OK = {"media_features", "pack_sequences"}


def audit(name: str, plan: str) -> list[str]:
    flags = []
    if "CartesianProduct" in plan:
        flags.append("CARTESIAN")
    if "BroadcastNestedLoopJoin" in plan and name not in (
        "ann_bruteforce",
        "ann_ivf",
        "ann_pq",
        "ann_ivf_pq",
        "ann_recall",
        "ann_search_pq",
        "ann_search_ivf_pq",
        "unigram_logprob",
    ):
        # sanctioned: ann_bruteforce broadcasts its tiny query set;
        # ann_ivf cross-joins query/vector rows with the broadcast
        # centroid set (config-sized) for the distance argmax; ann_pq
        # broadcasts the query set against the compressed code table
        # (the linear ADC scan); ann_recall contains these as subplans
        # (it compares the approximate top-k relations);
        # unigram_logprob cross-joins the ONE-ROW corpus-total relation
        # (the idiomatic scalar broadcast — ln(N) shipped to every task);
        # the two ann_search serving entries are the same sanctioned
        # broadcast-query-set ADC scans as ann_pq / ann_ivf_pq
        flags.append("BNLJ")
    if ("BatchEvalPython" in plan or "ArrowEvalPython" in plan or
            "MapInPandas" in plan) and name not in PYTHON_OK:
        flags.append("PYTHON-IN-HOT-PATH")
    if "SortMergeJoin" in plan and "broadcast" in name:
        flags.append("SMJ-WHERE-BROADCAST-EXPECTED")
    return flags


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "-v"]
    verbose = "-v" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])
    spark = build_session(shuffle_partitions=8)
    bad = 0
    for name, (fn, _) in QUERIES.items():
        if only and name not in only:
            continue
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        flags = audit(name, plan)
        scans = plan.count("Scan parquet")
        bhj = plan.count("BroadcastHashJoin")
        # formatted mode annotates codegen membership per-operator
        wsc = plan.count("[codegen id :")
        status = "WARN" if flags else "ok"
        bad += bool(flags)
        print(f"{status:4} {name}: scans={scans} bhj={bhj} codegen={wsc} "
              f"{' '.join(flags)}")
        if verbose or flags:
            pushed = [ln.strip() for ln in plan.splitlines() if "PushedFilters" in ln]
            for ln in pushed[:3]:
                print("      ", ln[:150])
        if verbose:
            print(plan)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
