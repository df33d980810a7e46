"""Dev harness mirroring the driver's correctness gate: run every
queries() entry in Spark AND its oracle in DuckDB, compare row count +
columns + order-insensitive values. Usage:

    python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from ph_ee_nats_importer_rdbms_spark.plans.queries import QUERIES
from ph_ee_nats_importer_rdbms_spark.session import build_session
from ph_ee_nats_importer_rdbms_spark.sources.files import TABLE_NAMES


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()

    def canon(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "<null>"
        if pd.isna(v):
            return "<null>"
        if isinstance(v, float):
            return repr(v)
        return str(v)

    out = df.apply(lambda col: col.map(canon))
    return out.sort_values(by=list(out.columns), ignore_index=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = build_session(shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    failures = 0
    for name, (fn, oracle) in QUERIES.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if oracle is None:
            print(f"SKIP {name}: no oracle (rows={len(got)})")
            continue
        try:
            want = con.execute(oracle).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        if sorted(got.columns) != sorted(want.columns):
            print(f"FAIL {name}: columns differ\n  spark: {sorted(got.columns)}\n  duck:  {sorted(want.columns)}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: row count spark={len(got)} duck={len(want)}")
            failures += 1
            continue
        g, w = normalize(got), normalize(want)
        if not g.equals(w):
            neq = (g != w).any(axis=1)
            print(f"FAIL {name}: {int(neq.sum())}/{len(g)} rows differ; first diffs:")
            print(pd.concat([g[neq].head(3).add_suffix("_spark"),
                             w[neq].head(3).add_suffix("_duck")], axis=1).T)
            failures += 1
            continue
        print(f"OK   {name}: {len(got)} rows")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
