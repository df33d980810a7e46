"""Same-window A/B of the r13 decontamination_capped restructure.

Builds BOTH shapes (the pre-r13 self-join and the collect-then-explode
one) in one session and times them alternating A,B,A,B,... so the
host's speed swings (BENCH_NOTES §Round 13: ±25%-to-10x whole-machine
drift) hit both sides equally. Also cross-checks the two outputs are
bit-identical via an order-insensitive xxhash fold.

Usage: python tools/ab_decon.py [sf_dir] [rounds]
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from ph_ee_nats_importer_rdbms_spark.analytics.dedup import (  # noqa: E402
    shingle_sets,
)
from ph_ee_nats_importer_rdbms_spark.analytics.training import (  # noqa: E402
    DECON_MAX_DF,
    DECONTAMINATION_MIN_OVERLAP,
    q_decontamination_capped,
    split_column,
)
from ph_ee_nats_importer_rdbms_spark.session import build_session  # noqa: E402


def old_shape(spark, sf_dir):
    """The pre-r13 plan: DF-cap semi-join, then a test<->train self-join."""
    sh = shingle_sets(spark, sf_dir)
    labeled = sh.select(
        "doc_id", split_column().alias("split"), F.explode("shingles").alias("shingle")
    )
    rare = (
        labeled.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= DECON_MAX_DF)
        .select("shingle")
    )
    capped = labeled.join(rare, "shingle", "leftsemi")
    test = capped.filter(F.col("split") == "test").select(
        F.col("doc_id").alias("test_doc_id"), "shingle"
    )
    train = capped.filter(F.col("split") == "train").select(
        F.col("doc_id").alias("train_doc_id"), "shingle"
    )
    pairs = test.join(train, on="shingle").groupBy(
        "test_doc_id", "train_doc_id"
    ).agg(F.count("*").alias("overlap"))
    return pairs.filter(F.col("overlap") >= DECONTAMINATION_MIN_OVERLAP)


def materialize(df) -> tuple[int, int]:
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64(*[F.col(c) for c in df.columns])).alias("h"),
    ).collect()[0]
    return row["n"], row["h"]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = build_session(app_name="ab-decon")
    spark.range(10_000_000).selectExpr("sum(id)").collect()
    # warm the staged shingle read once so neither side pays first-touch
    shingle_sets(spark, sf_dir).count()

    a = old_shape(spark, sf_dir)
    b = q_decontamination_capped(spark, sf_dir)
    na, ha = materialize(a)
    nb, hb = materialize(b)
    print(f"old: n={na} hash={ha}  new: n={nb} hash={hb}  "
          f"match={na == nb and ha == hb}")

    ta, tb = [], []
    for _ in range(rounds):
        for name, df, book in (("old", a, ta), ("new", b, tb)):
            spark._jvm.System.gc()  # noqa: SLF001
            t0 = time.perf_counter()
            materialize(df)
            book.append(time.perf_counter() - t0)
    fmt = lambda xs: " ".join(f"{x:.3f}" for x in xs)  # noqa: E731
    print(f"old: {fmt(ta)}  min={min(ta):.3f} med={sorted(ta)[len(ta)//2]:.3f}")
    print(f"new: {fmt(tb)}  min={min(tb):.3f} med={sorted(tb)[len(tb)//2]:.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
