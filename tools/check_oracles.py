"""Dev harness mirroring the driver's correctness gate: run every
queries() entry in Spark AND its oracle in DuckDB, compare row count +
columns + order-insensitive values. Usage:

    python tools/check_oracles.py [sf_dir] [query ...]

The comparison core (``open_oracle_connection`` / ``compare_query``) is
shared with tests/test_full_registry.py, the pytest gate that runs the
FULL registry at sf0.001 on every test run.
"""

from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from ph_ee_nats_importer_rdbms_spark.plans.queries import QUERIES


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()

    def canon(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "<null>"
        # list/array cells: canonicalize elementwise — Spark hands back
        # python lists, DuckDB numpy arrays, and their str() forms differ
        # ("[1, 2]" vs "[1 2]"); pd.isna on them is elementwise and
        # un-truthy, so they must be handled before the scalar isna
        if isinstance(v, (list, tuple)) or hasattr(v, "tolist"):
            items = v.tolist() if hasattr(v, "tolist") else list(v)
            return "[" + ", ".join(canon(x) for x in items) + "]"
        if pd.isna(v):
            return "<null>"
        if isinstance(v, float):
            return repr(v)
        return str(v)

    out = df.apply(lambda col: col.map(canon))
    return out.sort_values(by=list(out.columns), ignore_index=True)


def open_oracle_connection(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    """A DuckDB connection with the driver's table views pre-registered."""
    from ph_ee_nats_importer_rdbms_spark.sources.files import TABLE_NAMES

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def compare_query(spark, con, name: str, sf_dir: str) -> tuple[bool, str]:
    """Run one registry entry both ways; (ok, human-readable message).

    ``ok`` is True for value-identical results AND for no-oracle entries
    (those are gated by dedicated pytest bounds instead)."""
    fn, oracle = QUERIES[name]
    try:
        got = fn(spark, sf_dir).toPandas()
    except Exception as e:  # noqa: BLE001
        return False, f"spark error: {e}"
    if oracle is None:
        return True, f"no oracle (rows={len(got)})"
    try:
        want = con.execute(oracle).fetchdf()
    except Exception as e:  # noqa: BLE001
        return False, f"duckdb error: {e}"
    if sorted(got.columns) != sorted(want.columns):
        return False, (
            f"columns differ\n  spark: {sorted(got.columns)}"
            f"\n  duck:  {sorted(want.columns)}"
        )
    if len(got) != len(want):
        return False, f"row count spark={len(got)} duck={len(want)}"
    g, w = normalize(got), normalize(want)
    if not g.equals(w):
        neq = (g != w).any(axis=1)
        diff = pd.concat(
            [g[neq].head(3).add_suffix("_spark"), w[neq].head(3).add_suffix("_duck")],
            axis=1,
        ).T
        return False, f"{int(neq.sum())}/{len(g)} rows differ; first diffs:\n{diff}"
    return True, f"{len(got)} rows"


def main() -> int:
    from ph_ee_nats_importer_rdbms_spark.session import build_session

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = build_session(shuffle_partitions=8)
    con = open_oracle_connection(sf_dir)
    failures = 0
    for name in QUERIES:
        if only and name not in only:
            continue
        ok, msg = compare_query(spark, con, name, sf_dir)
        if ok:
            tag = "SKIP" if msg.startswith("no oracle") else "OK  "
            print(f"{tag} {name}: {msg}")
        else:
            print(f"FAIL {name}: {msg}")
            failures += 1
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
