"""Incremental embedding near-dup clusters over an append-mostly vector
corpus — the vectors analog of the document store (incremental_docs),
closing the last full-rebuild curation artifact.

Sign-LSH makes the append incremental by the same construction MinHash
banding does for documents:

- Per-vector artifacts (bucket, norm) depend on the vector alone; the
  hyperplanes are FROZEN at store build (like the PQ/IVF codebooks:
  buckets from two plane draws are not comparable), so a delivery
  buckets only its own vectors.
- A new near-dup pair must involve a new vector, and the pair shares a
  sign-LSH bucket — so candidates are ``new_buckets ⋈ all_buckets`` on
  the bucket key (old↔old never regenerates), exact cosine on
  candidates only, threshold filter.
- Labels merge via the contraction trick: the old (node → label) edges
  preserve old connectivity exactly, so CC over
  ``old label edges ∪ new pairs`` is the correct min-id labeling of the
  merged graph — O(labeled nodes + new pairs), not O(all pairs ever).

Store layout and crash safety use the manifest-transaction helpers
(batch_store.py); labels are versioned per commit (latest manifest is
the pointer). Parity contract (tests/test_incremental_embeddings.py,
fuzzed over delivery splits): pairs and labels equal a from-scratch
build of the union corpus with the same frozen planes — and the
store built over the full corpus reproduces the oracle-checked
``embedding_dups`` / ``embedding_dup_clusters`` registry outputs.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ph_ee_nats_importer_rdbms_spark.analytics import batch_store as bs
from ph_ee_nats_importer_rdbms_spark.analytics.dedup import (
    EMBED_COSINE_THRESHOLD,
    EMBED_DIM,
    EMBED_PLANES,
    _dot,
    _embed_bucket_col,
    _norm,
    connected_components,
    hyperplanes,
)

BUCKETS_SCHEMA = "vec_id long, embedding array<float>, bucket long, norm double"
PAIRS_SCHEMA = "vec_a long, vec_b long, cosine double"
LABELS_SCHEMA = "node long, label long"
_DELIVERED = "vec_id long"


def _planes_path(root: str) -> str:
    return os.path.join(root, "planes.json")


def frozen_planes(root: str) -> list[list[float]]:
    with open(_planes_path(root)) as f:
        return json.load(f)


def _bucketed(vectors: DataFrame, planes: list[list[float]]) -> DataFrame:
    return vectors.select(
        "vec_id",
        "embedding",
        _embed_bucket_col("embedding", planes).alias("bucket"),
        _norm("embedding").alias("norm"),
    )


def _verified_pairs(new_b: DataFrame, all_b: DataFrame) -> DataFrame:
    """Exact-cosine-verified near-dup pairs between the new batch and the
    whole bucketed corpus (bucket-join candidates only; old↔old pairs
    never regenerate because one side is always new)."""
    a = new_b.select(
        "bucket",
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("emb_a"),
        F.col("norm").alias("norm_a"),
    )
    b = all_b.select(
        F.col("bucket").alias("bucket_b"),
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("emb_b"),
        F.col("norm").alias("norm_b"),
    )
    cos = F.round(_dot("emb_a", "emb_b") / (F.col("norm_a") * F.col("norm_b")), 4)
    return (
        a.join(
            b,
            (F.col("bucket") == F.col("bucket_b"))
            & (F.col("id_a") != F.col("id_b")),
        )
        .select(
            F.least("id_a", "id_b").alias("vec_a"),
            F.greatest("id_a", "id_b").alias("vec_b"),
            cos.alias("cosine"),
        )
        .distinct()
        .filter(F.col("cosine") >= EMBED_COSINE_THRESHOLD)
    )


def _labels_or_empty(spark: SparkSession, edges: DataFrame) -> DataFrame:
    e = edges.localCheckpoint(eager=True)
    if e.count() == 0:
        return spark.createDataFrame([], LABELS_SCHEMA)
    return connected_components(e)


def build_embedding_store(
    spark: SparkSession,
    vectors: DataFrame,
    root: str,
    planes: list[list[float]] | None = None,
) -> None:
    """Full build from a (vec_id, embedding) relation; freezes the
    hyperplanes into the store (an append must never redraw them)."""
    planes = planes or hyperplanes(EMBED_PLANES, EMBED_DIM)
    os.makedirs(root, exist_ok=True)
    with open(_planes_path(root), "w") as f:
        json.dump(planes, f)
    bucketed = _bucketed(vectors, planes).localCheckpoint(eager=True)
    pairs = _verified_pairs(bucketed, bucketed).localCheckpoint(eager=True)
    bs.write_artifacts(
        root,
        bs.BASE_BATCH,
        {
            "buckets": bucketed,
            "pairs": pairs,
            "delivered": vectors.select("vec_id"),
            "labels": _labels_or_empty(
                spark, pairs.select(
                    F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
                )
            ),
        },
    )
    bs.commit(root, {"seq": 0, "batch": bs.BASE_BATCH})


def read_pairs(spark: SparkSession, root: str) -> DataFrame:
    return bs.read_union(spark, root, "pairs", PAIRS_SCHEMA)


def read_labels(spark: SparkSession, root: str) -> DataFrame:
    """Latest committed labeling (full replacement per commit; the
    manifest is the pointer)."""
    latest = bs.committed_batches(root)[-1]
    return spark.read.schema(LABELS_SCHEMA).parquet(
        bs.batch_path(root, "labels", latest["batch"])
    )


def read_clusters(spark: SparkSession, root: str) -> DataFrame:
    """(vec_id, cluster_id, is_keeper) — the registry-query shape."""
    return read_labels(spark, root).select(
        F.col("node").alias("vec_id"),
        F.col("label").alias("cluster_id"),
        (F.col("node") == F.col("label")).alias("is_keeper"),
    )


def append_embedding_batch(
    spark: SparkSession,
    new_vectors: DataFrame,
    root: str,
    skip_committed: bool = False,
) -> dict:
    """Fold a vector delivery in: bucket the batch against the frozen
    planes, probe the committed bucket table, verify, merge labels."""
    committed = bs.committed_batches(root)
    batch = bs.batch_id_of(new_vectors, "vec_id")
    if bs.replayed_manifest(
        committed, batch, lambda: bs.legacy_batch_id_of(new_vectors, "vec_id")
    ):
        if skip_committed:
            return {"new_vectors": 0, "skipped": True}
        raise ValueError(
            f"append_embedding_batch: batch {batch} already committed — "
            "this exact delivery has been applied (retry after success?)"
        )
    dup = (
        new_vectors.select("vec_id")
        .join(
            bs.read_union(spark, root, "delivered", _DELIVERED),
            "vec_id",
            "leftsemi",
        )
        .limit(1)
        .collect()
    )
    if dup:
        raise ValueError(
            f"append_embedding_batch: vec_id {dup[0][0]} already in the "
            "store — deliveries must carry new vec_ids"
        )
    new_b = _bucketed(new_vectors, frozen_planes(root)).localCheckpoint(
        eager=True
    )
    all_b = bs.read_union(spark, root, "buckets", BUCKETS_SCHEMA).unionByName(
        new_b
    )
    pairs_new = _verified_pairs(new_b, all_b).localCheckpoint(eager=True)
    old_label_edges = read_labels(spark, root).select(
        F.col("node").alias("doc_a"), F.col("label").alias("doc_b")
    )
    labels = _labels_or_empty(
        spark,
        old_label_edges.unionByName(
            pairs_new.select(
                F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
            )
        ),
    ).localCheckpoint(eager=True)
    bs.write_artifacts(
        root,
        batch,
        {
            "buckets": new_b,
            "pairs": pairs_new,
            "delivered": new_vectors.select("vec_id"),
            "labels": labels,
        },
    )
    n = new_vectors.count()
    bs.commit(root, {"seq": len(committed), "batch": batch})
    return {"new_vectors": n, "new_pairs": pairs_new.count()}


def streaming_append_sink(root: str):
    """``foreachBatch`` sink — same exactly-once composition as the
    vector-index and curation sinks (content-digest batch ids +
    skip-committed replay)."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.isEmpty():
            append_embedding_batch(
                batch_df.sparkSession, batch_df, root, skip_committed=True
            )

    return sink
