"""Generate an N×-scaled copy of a driver testdata dir for scaling benches.

Purpose: the driver ships sf0.001/0.01/0.1; the 100 TB story needs measured
evidence that every query family scales ~linearly. This tool replicates the
sf0.1 tables ``factor`` times with key offsets chosen so that:

* **Join integrity holds** — o_custkey offsets track the replicated
  customer table; l_orderkey offsets track orders. Dimension tables
  (region/nation/supplier/part) are copied as-is, so per-copy join fanout
  is identical to the source scale.
* **Workload density scales, not workload shape** — each copy's documents
  get an alphabet rotated by the copy index (``translate``), and each
  copy's embeddings get their components rotated by the copy index, so
  cross-copy texts/vectors are NOT near-duplicates of each other. Without
  this, replication would turn every dup cluster of size c into one of
  size factor*c and pair outputs would grow ~factor² — a semantic change,
  not a scale-up. With it, dup structure is replicated per copy and all
  outputs grow ~linearly, which is what a scaling bench must hold fixed.
* **Determinism** — pure SQL over the source parquet, no RNG.

Copy 0 is byte-identical content-wise to the source (offset 0, rotation 0),
so fixed query ids (ANN's vec_id < N_QUERIES, lookup keys) keep their
semantics and query-side cost stays constant while corpus-side cost scales.

Usage: python tools/make_scaled_sf.py [--factor 10]
       [--src /root/testdata/sf0.1] [--dst <repo>/.scaled/sf1]
"""

from __future__ import annotations

import argparse
import os
import sys

import duckdb

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Key strides: > max key in the source table, round numbers for readability.
STRIDES = {
    "orderkey": 1_000_000,
    "custkey": 100_000,
    "dockey": 100_000,
    "veckey": 10_000,
    "eventkey": 1_000_000,
    "userkey": 10_000,
}

_LOWER = "abcdefghijklmnopqrstuvwxyz"
_UPPER = _LOWER.upper()


def _rot_alpha(copy: int) -> tuple[str, str]:
    """(from, to) arguments for ``translate``: caesar-rotate by ``copy``."""
    r = copy % 26
    lo = _LOWER[r:] + _LOWER[:r]
    return _LOWER + _UPPER, lo + lo.upper()


def _copies_sql(per_copy_sql: str, factor: int) -> str:
    return "\nUNION ALL\n".join(
        per_copy_sql.format(c=c, **STRIDES) for c in range(factor)
    )


def scale(src: str, dst: str, factor: int) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    def write(table: str, select_sql: str) -> None:
        out = os.path.join(dst, f"{table}.parquet")
        con.execute(f"COPY ({select_sql}) TO '{out}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{out}'").fetchone()[0]
        print(f"{table}: {n} rows", file=sys.stderr)

    def src_tbl(table: str) -> str:
        return f"'{os.path.join(src, table + '.parquet')}'"

    # dimensions: verbatim
    for t in ("region", "nation", "supplier", "part"):
        write(t, f"SELECT * FROM {src_tbl(t)}")

    write(
        "customer",
        _copies_sql(
            f"SELECT c_custkey + {{c}}*{{custkey}} AS c_custkey, c_name, "
            f"c_nationkey, c_acctbal, c_mktsegment FROM {src_tbl('customer')}",
            factor,
        ),
    )
    write(
        "orders",
        _copies_sql(
            f"SELECT o_orderkey + {{c}}*{{orderkey}} AS o_orderkey, "
            f"o_custkey + {{c}}*{{custkey}} AS o_custkey, o_orderstatus, "
            f"o_totalprice, o_orderdate, o_orderpriority FROM {src_tbl('orders')}",
            factor,
        ),
    )
    write(
        "lineitem",
        _copies_sql(
            f"SELECT l_orderkey + {{c}}*{{orderkey}} AS l_orderkey, l_partkey, "
            f"l_suppkey, l_linenumber, l_quantity, l_extendedprice, l_discount, "
            f"l_tax, l_returnflag, l_linestatus, l_shipdate FROM {src_tbl('lineitem')}",
            factor,
        ),
    )
    write(
        "events",
        _copies_sql(
            f"SELECT event_id + {{c}}*{{eventkey}} AS event_id, ts, "
            f"user_id + {{c}}*{{userkey}} AS user_id, event_type, value, props "
            f"FROM {src_tbl('events')}",
            factor,
        ),
    )
    # documents: rotate the alphabet per copy so cross-copy texts are not
    # near-duplicates (dup structure replicates instead of densifying)
    doc_parts = []
    for c in range(factor):
        frm, to = _rot_alpha(c)
        doc_parts.append(
            f"SELECT doc_id + {c}*{STRIDES['dockey']} AS doc_id, "
            f"translate(text, '{frm}', '{to}') AS text, lang, source, n_chars "
            f"FROM {src_tbl('documents')}"
        )
    write("documents", "\nUNION ALL\n".join(doc_parts))
    # embeddings: rotate vector components per copy — preserves norms and
    # within-copy pairwise cosines exactly; cross-copy cosines decorrelate
    dim = con.execute(
        f"SELECT len(any_value(embedding)) FROM {src_tbl('embeddings')}"
    ).fetchone()[0]
    write(
        "embeddings",
        _copies_sql(
            f"SELECT vec_id + {{c}}*{{veckey}} AS vec_id, "
            f"CAST(list_transform(range(1, {dim} + 1), "
            f"i -> embedding[1 + ((i - 1 + {{c}}) % {dim})]) AS FLOAT[]) AS embedding, "
            f"label FROM {src_tbl('embeddings')}",
            factor,
        ),
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default=os.path.join(_REPO, ".scaled", "sf1"))
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()
    scale(args.src, args.dst, args.factor)
    print(args.dst)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
