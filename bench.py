"""Benchmark harness: runs every registry query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints TWO
JSON lines: the full detail {"metric", "value" (warm total sec), "unit",
"sf", "queries": {name: sec}, "value_cold", "queries_cold": {name: sec}}
with the warm headline keys first, then a COMPACT summary line carrying
just the totals — short enough that a bounded capture window (the driver
records a ~2000-char tail) always preserves the round-comparable warm
number even when the detail line is truncated (VERDICT r7 task #4).

Each query is timed to FULL materialization of every output column: a
bare count() lets Catalyst prune map-only projections down to a row
count (a per-doc scorer would "run" in 0.1s at any scale without ever
computing its score), so the harness folds one xxhash64 across all
output columns into a single max — every column evaluates, nothing
transfers to the driver beyond one row.

COLD/WARM CONTRACT (VERDICT r6 task #5): every query runs TWICE.
The first run ("queries_cold") absorbs whatever first-touch staging its
family needs — staged artifacts build on first use, so WHICH query pays
that cost depends on registry order, and registry order rotates every
round with the correctness driver's snapshot cap. The second run
("queries", the headline "value") reads everything staged and is the
ROUND-COMPARABLE number: a rotation that moves a family's head entry can
shift cold numbers by seconds while warm numbers stay put (round 5's
embedding_outliers read 7.25s cold-as-head vs 0.95s warm — same code).
Regressions should be judged warm-vs-warm; cold-vs-warm gaps locate
staging cost."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ph_ee_nats_importer_rdbms_spark.plans.queries import QUERIES
from ph_ee_nats_importer_rdbms_spark.session import build_session


def materialize(df) -> int:
    """Force evaluation of EVERY output column; return the row count.
    count() alone is not materialization — Catalyst prunes unneeded
    columns, so a map-only projection's entire compute is skipped."""
    from pyspark.sql import functions as F

    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.max(F.xxhash64(*[F.col(c) for c in df.columns])).alias("h"),
    ).collect()[0]
    return row["n"]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    only = sys.argv[1:]
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # -Xlog:disable: under heap pressure (the 100x corpora) the JVM's
    # unified logging writes gc,alloc warnings to THIS process's stdout,
    # and the harness contract is JSON-only stdout (the detail line plus
    # the compact summary line) — observed a "[warning][gc,alloc] ...
    # Retried waiting for GC" line landing ahead of the JSON at sf10.
    spark = build_session(
        app_name="ph-ee-spark-bench",
        extra_conf={"spark.driver.extraJavaOptions": "-Xlog:disable"},
    )

    # Standard JVM warmup (codegen, Hadoop FS init, task-scheduler spin-up)
    # on data-independent work, so the first timed query measures the query,
    # not one-time session costs.
    spark.range(10_000_000).selectExpr("sum(id)").collect()
    # Warm the parquet reader/writer code path on a THROWAWAY file (never
    # the dataset): the first parquet touch in a session otherwise pays
    # ~2-4s of Hadoop/parquet class init, which lands on whichever query
    # happens to be first in registry order — measurement noise, not query
    # cost. (Registry order is driven by the correctness driver's snapshot
    # cap, so the head entry changes round to round.)
    import tempfile

    with tempfile.TemporaryDirectory() as _wd:
        _p = os.path.join(_wd, "warm.parquet")
        spark.range(1).write.mode("overwrite").parquet(_p)
        spark.read.parquet(_p).count()

    # Warm the Python/Arrow worker pool too: the first Arrow-exchange
    # stage in a session pays python.daemon fork + Arrow serializer init
    # (measured: the registry's first applyInPandas query swings 0.2s vs
    # ~4s between runs depending on whether a prior session's pool is
    # alive). One trivial mapInPandas puts that cost here, not on
    # whichever query happens to hit Python first.
    def _ident(it):
        yield from it

    spark.range(32).repartition(4).mapInPandas(_ident, "id long").count()

    # At the 100x bench scale, 70 queries share one JVM heap: a query
    # scheduled after a multi-GB aggregation pays its neighbor's GC wave
    # (measured at sf10: 4 entries looked supralinear in sequence but
    # were linear in isolation — BENCH_NOTES round 6). Opt-in GC barrier
    # between queries attributes heap pressure to the query that caused
    # it instead of whoever runs next.
    gc_between = os.environ.get("SPARK_GRAFT_BENCH_GC", "0").strip() not in (
        "0", "", "false", "no", "off",
    )

    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name, (fn, _) in QUERIES.items():
        if only and name not in only:
            continue
        for run, book in (("cold", cold), ("warm", timings)):
            if gc_between:
                spark._jvm.System.gc()  # noqa: SLF001
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = materialize(df)
            book[name] = round(time.perf_counter() - t0, 3)
            print(
                f"# {name} [{run}]: {book[name]:.3f}s ({n} rows)",
                file=sys.stderr,
            )

    total = round(sum(timings.values()), 3)
    total_cold = round(sum(cold.values()), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # Full detail line: warm headline keys FIRST, queries_cold last
    # (VERDICT r7 task #4 — round 7's capture window truncated the line
    # and lost the round-comparable warm total to the cold dict).
    print(
        json.dumps(
            {
                "metric": "total_query_sec",
                "value": total,
                "unit": "sec",
                "sf": sf_val,
                "queries": timings,
                "value_cold": total_cold,
                "queries_cold": cold,
            }
        )
    )
    # Compact summary line LAST: always shorter than any plausible tail
    # capture window, so the warm headline survives even when the full
    # detail line above gets truncated. Parsers that take the last
    # parseable JSON line get this; parsers that take the first line get
    # the full detail.
    print(
        json.dumps(
            {
                "metric": "total_query_sec",
                "value": total,
                "unit": "sec",
                "sf": sf_val,
                "value_cold": total_cold,
                "n_queries": len(timings),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
