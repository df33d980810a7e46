"""CLI: run registry queries or the import pipeline from the shell.

    python -m ph_ee_nats_importer_rdbms_spark list
    python -m ph_ee_nats_importer_rdbms_spark run pricing_summary [--sf-dir DIR] [-n 20]
    python -m ph_ee_nats_importer_rdbms_spark oracle pricing_summary

`run` executes the Spark query and prints rows; `oracle` prints the
DuckDB-equivalent SQL (the correctness contract for that operator).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="ph_ee_nats_importer_rdbms_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list registry queries")
    run_p = sub.add_parser("run", help="run one registry query")
    run_p.add_argument("query")
    run_p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    run_p.add_argument("-n", type=int, default=20, help="rows to show")
    or_p = sub.add_parser("oracle", help="print the DuckDB oracle SQL")
    or_p.add_argument("query")
    args = ap.parse_args(argv)

    from ph_ee_nats_importer_rdbms_spark.plans.queries import QUERIES

    if args.cmd == "list":
        for name, (_, oracle) in QUERIES.items():
            gate = "oracle" if oracle else "rows-only"
            print(f"{name:28} [{gate}]")
        return 0
    if args.query not in QUERIES:
        print(f"unknown query {args.query!r}; see `list`", file=sys.stderr)
        return 2
    fn, oracle = QUERIES[args.query]
    if args.cmd == "oracle":
        print(oracle or "-- no SQL form (non-relational operator)")
        return 0
    from ph_ee_nats_importer_rdbms_spark.session import build_session

    spark = build_session(app_name=f"phee-{args.query}")
    df = fn(spark, args.sf_dir)
    df.show(args.n, truncate=False)
    print(f"[{df.count()} rows total]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
