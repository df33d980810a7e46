"""Same-window A/B of the round-13 second-pass restructures:

- ann_lsh_multi: broadcast the candidate side into a bare corpus-scan
  probe (was: spread + whole-corpus broadcast on the scoring join)
- embedding_outliers: read the staged per-vector centroid distance
  (was: the cosine subtree inlined twice — once under the stats
  broadcast, once on the probe side)

Builds BOTH shapes in one session, alternates A,B,A,B,... so host-speed
drift hits both sides equally, and cross-checks outputs bit-identically
via an order-insensitive xxhash fold.

Usage: python tools/ab_r13b.py [sf_dir] [rounds]
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from ph_ee_nats_importer_rdbms_spark.analytics import similarity as S  # noqa: E402
from ph_ee_nats_importer_rdbms_spark.session import build_session  # noqa: E402


def old_lsh_multi(spark, sf_dir):
    """Pre-restructure scoring join: spread corpus joined as the right
    side (Catalyst broadcast it whole)."""
    from ph_ee_nats_importer_rdbms_spark.sources.files import load_table, spread

    e = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "embedding"
    )

    def build_long():
        tables = F.array(
            *[
                F.struct(
                    F.lit(t).alias("table_id"),
                    S._embed_bucket_col(
                        "embedding",
                        S.hyperplanes(
                            S.ANN_PLANES, S.EMBED_DIM, salt=S._table_salt(t)
                        ),
                    ).alias("bucket"),
                )
                for t in range(S.ANN_LSH_TABLES)
            ]
        )
        return e.select("vec_id", F.explode(tables).alias("tb")).select(
            "vec_id", "tb.table_id", "tb.bucket"
        )

    long = S._staged(spark, sf_dir, "ann_lsh_tables", build_long)
    q_long = long.filter(F.col("vec_id") < S.N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "table_id", "bucket"
    )
    cand = (
        F.broadcast(q_long)
        .join(long, ["table_id", "bucket"])
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    qe = S._corpus_queries(spark, sf_dir)
    scored = cand.join(F.broadcast(qe), "query_id").join(e, "vec_id")
    cos = F.round(S._cosine("q_emb", "embedding"), 4)
    return S._ranked(scored.select("query_id", "vec_id", cos.alias("cosine")))


def old_outliers(spark, sf_dir):
    """Pre-restructure: cosine subtree inlined (computed twice)."""
    assign = S.ivf_assignments(spark, sf_dir)
    cent = S._ivf_centroids(spark, sf_dir).withColumnRenamed("cid", "cluster_id")
    sim = F.round(S._cosine("embedding", "cemb"), 6)
    scored = assign.join(cent, "cluster_id").select(
        "vec_id",
        "cluster_id",
        sim.alias("centroid_cos"),
        F.round(sim * 1000000).cast("long").alias("u"),
    )
    stats = scored.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("u").alias("s1"),
        F.sum(F.col("u") * F.col("u")).alias("s2"),
    )
    mean_u = F.col("s1").cast("double") / F.col("n")
    var_u = (
        F.col("n").cast("double") * F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1").cast("double")
    ) / (F.col("n").cast("double") * F.col("n"))
    sd_u = F.sqrt(var_u)
    z = F.floor((F.col("u") - mean_u) / sd_u * 100) / 100
    return (
        scored.join(F.broadcast(stats), "cluster_id")
        .filter(var_u > 0)
        .select(
            "vec_id",
            "cluster_id",
            "centroid_cos",
            z.alias("z_score"),
            (F.col("u") < mean_u - S.OUTLIER_SIGMA * sd_u).alias("is_outlier"),
        )
    )


def materialize(df) -> tuple[int, int]:
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        # decimal(38,0) sum: order-insensitive and overflow-proof (a plain
        # long sum of xxhash64 values overflows ANSI arithmetic at ~50k rows)
        F.sum(
            F.xxhash64(*[F.col(c) for c in df.columns]).cast("decimal(38,0)")
        ).alias("h"),
    ).collect()[0]
    return row["n"], row["h"]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = build_session(app_name="ab-r13b")
    spark.range(10_000_000).selectExpr("sum(id)").collect()

    pairs = [
        ("lsh_multi", old_lsh_multi(spark, sf_dir),
         S.q_ann_lsh_multi(spark, sf_dir)),
        ("outliers", old_outliers(spark, sf_dir),
         S.q_embedding_outliers(spark, sf_dir)),
    ]
    rc = 0
    for name, a, b in pairs:
        na, ha = materialize(a)
        nb, hb = materialize(b)
        ok = na == nb and ha == hb
        rc |= 0 if ok else 1
        print(f"{name}: old n={na} h={ha}  new n={nb} h={hb}  match={ok}")
        ta, tb = [], []
        for _ in range(rounds):
            for df, book in ((a, ta), (b, tb)):
                spark._jvm.System.gc()  # noqa: SLF001
                t0 = time.perf_counter()
                materialize(df)
                book.append(time.perf_counter() - t0)
        fmt = lambda xs: " ".join(f"{x:.3f}" for x in xs)  # noqa: E731
        print(f"  old: {fmt(ta)}  min={min(ta):.3f}")
        print(f"  new: {fmt(tb)}  min={min(tb):.3f}")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
