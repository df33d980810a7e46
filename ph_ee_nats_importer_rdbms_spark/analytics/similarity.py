"""Approximate-nearest-neighbor search over the ``embeddings`` table.

Two paths:

* ``q_ann_bruteforce`` — exact cosine top-k for a query set, the
  correctness baseline. Query side is tiny → broadcast; the big side is
  scanned once, ranked with a per-query window. Linear in corpus size.
* ``q_ann_lsh`` — sign-LSH (random hyperplane) bucketed variant: only
  candidates sharing the query's bucket are scored. This is the scale
  path: the candidate join is a hash join on the bucket key, so the
  scored pair count drops by ~2^planes while recall stays high for
  near-duplicate neighbors.

Cosine is computed JVM-side with `zip_with`/`aggregate` in double
precision (same summation order as the DuckDB oracle, rounded to 4dp so
hashes compare exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ph_ee_nats_importer_rdbms_spark.analytics.dedup import (
    _DUCK_COSINE,
    _cosine,
    _duck_bucket,
    _embed_bucket_col,
)
from ph_ee_nats_importer_rdbms_spark.analytics.hashing import hyperplanes
from ph_ee_nats_importer_rdbms_spark.sources.files import load_table

N_QUERIES = 10
TOP_K = 10
ANN_PLANES = 6
EMBED_DIM = 64


def _ranked(pairs: DataFrame) -> DataFrame:
    """Deterministic top-k per query: rounded cosine desc, vec_id asc."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def q_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    pairs = F.broadcast(queries).crossJoin(e).filter(
        F.col("query_id") != F.col("vec_id")
    )
    cos = F.round(_cosine("q_emb", "embedding"), 4)
    return _ranked(pairs.select("query_id", "vec_id", cos.alias("cosine")))


ANN_BRUTEFORCE_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < {N_QUERIES}
),
scored AS (
  SELECT a.query_id, b.vec_id, {_DUCK_COSINE} AS cosine
  FROM (SELECT query_id, embedding FROM q) a
  JOIN embeddings b ON a.query_id <> b.vec_id
),
ranked AS (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, rank, vec_id, cosine FROM ranked WHERE rank <= {TOP_K}
"""


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN: score only same-bucket candidates. At 100 TB the
    bucket column is precomputed at ingest and the table is partitioned by
    it, making each query a partition-pruned scan."""
    planes = hyperplanes(ANN_PLANES, EMBED_DIM, salt="ann")
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    bucketed = e.withColumn("bucket", _embed_bucket_col("embedding", planes))
    queries = bucketed.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("bucket").alias("q_bucket"),
    )
    pairs = F.broadcast(queries).join(
        bucketed,
        (F.col("q_bucket") == F.col("bucket"))
        & (F.col("query_id") != F.col("vec_id")),
    )
    cos = F.round(_cosine("q_emb", "embedding"), 4)
    return _ranked(pairs.select("query_id", "vec_id", cos.alias("cosine")))


def _ann_lsh_oracle() -> str:
    planes = hyperplanes(ANN_PLANES, EMBED_DIM, salt="ann")
    return f"""
WITH bk AS (
  SELECT vec_id, embedding, {_duck_bucket("embedding", planes)} AS bucket
  FROM embeddings
),
q AS (
  SELECT vec_id AS query_id, embedding, bucket FROM bk WHERE vec_id < {N_QUERIES}
),
scored AS (
  SELECT a.query_id, b.vec_id, {_DUCK_COSINE} AS cosine
  FROM (SELECT query_id, embedding, bucket FROM q) a
  JOIN bk b ON a.bucket = b.bucket AND a.query_id <> b.vec_id
),
ranked AS (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, rank, vec_id, cosine FROM ranked WHERE rank <= {TOP_K}
"""


ANN_LSH_ORACLE = _ann_lsh_oracle()
