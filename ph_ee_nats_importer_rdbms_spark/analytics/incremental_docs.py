"""Incremental near-dup index maintenance over an append-mostly corpus.

A training-data corpus grows in BATCHES (a crawl dump, a vendor delivery,
one `source` at a time); recomputing MinHash-LSH dedup from scratch per
delivery is the 100 TB version of rebuilding the world because one file
changed. The LSH structure makes the append incremental by construction:

- Per-doc artifacts (shingles, signatures, band entries) depend on the
  doc alone — derive them for the NEW batch only and append.
- New near-dup pairs can only involve a new doc (old-vs-old pairs are
  already in the store), and any pair involving a new doc must collide
  with it in some band — so the candidate join is
  ``new_bands ⋈ all_bands`` on the band key: cost ∝ new batch × collision
  rate, never corpus². At cluster scale the stored band table is
  bucketed by (band_id, band_key) so this probe is co-located.
- Cluster labels merge by the standard trick: an existing labeling is a
  CONTRACTION of the old pair graph — the (node → label) edges preserve
  exactly its connectivity — so running connected components over
  ``old label edges ∪ new verified pairs`` yields the correct min-id
  labeling of the merged graph without ever revisiting old pairs. The
  CC input is O(labeled nodes + new pairs), not O(all pairs ever).

``build_index`` lays the store down; ``append_batch`` folds a delivery
in. Parity contract (tests/test_incremental_docs.py, including a
hypothesis fuzz): after any sequence of appends, ``pairs`` equals the
from-scratch pair set of the union corpus and ``labels`` equals the
from-scratch clustering.

Store layout under ``root``::

    shingles/    (doc_id, shingles)           append-only
    signatures/  (doc_id, sig_0..sig_11)      append-only
    bands/       (doc_id, band_id, band_key)  append-only
    pairs/       (doc_a, doc_b, jaccard)      append-only
    labels/      (node, label)                overwritten per append

Batches must carry doc_ids disjoint from the store (append-mostly
corpus contract; the deletion/edit story for derived DOCUMENT artifacts
is re-shingling the affected sources — cheap because everything here is
source-sliceable — and is out of scope for this module).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ph_ee_nats_importer_rdbms_spark.analytics.dedup import (
    bands_of,
    connected_components,
    jaccard_verify,
    shingles_of,
    signatures_of,
)

_SIG_FIELDS = [T.StructField("doc_id", T.LongType())] + [
    T.StructField(f"sig_{j}", T.LongType()) for j in range(12)
]

_SCHEMAS = {
    "shingles": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("shingles", T.ArrayType(T.StringType())),
        ]
    ),
    "signatures": T.StructType(_SIG_FIELDS),
    "bands": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("band_id", T.IntegerType()),
            T.StructField("band_key", T.StringType()),
        ]
    ),
    "pairs": T.StructType(
        [
            T.StructField("doc_a", T.LongType()),
            T.StructField("doc_b", T.LongType()),
            T.StructField("jaccard", T.DoubleType()),
        ]
    ),
    "labels": T.StructType(
        [
            T.StructField("node", T.LongType()),
            T.StructField("label", T.LongType()),
        ]
    ),
}


def _path(root: str, name: str) -> str:
    return os.path.join(root, name)


def _read(spark: SparkSession, root: str, name: str) -> DataFrame:
    # explicit schema: a store whose corpus has no near-dups yet has an
    # empty (inference-less) pairs/labels directory
    return spark.read.schema(_SCHEMAS[name]).parquet(_path(root, name))


def read_pairs(spark: SparkSession, root: str) -> DataFrame:
    return _read(spark, root, "pairs")


def read_labels(spark: SparkSession, root: str) -> DataFrame:
    return _read(spark, root, "labels")


def _cc_or_empty(spark: SparkSession, pairs: DataFrame) -> DataFrame:
    edges = pairs.select("doc_a", "doc_b").localCheckpoint(eager=True)
    if edges.count() == 0:
        return spark.createDataFrame([], _SCHEMAS["labels"])
    return connected_components(edges)


def build_index(spark: SparkSession, docs: DataFrame, root: str) -> None:
    """Full build from a (doc_id, text) relation."""
    sh = shingles_of(docs).localCheckpoint(eager=True)
    sigs = signatures_of(sh).localCheckpoint(eager=True)
    bands = bands_of(sigs).localCheckpoint(eager=True)
    a, b = bands.alias("a"), bands.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    pairs = jaccard_verify(candidates, sh).localCheckpoint(eager=True)
    for name, df in (("shingles", sh), ("signatures", sigs), ("bands", bands), ("pairs", pairs)):
        df.write.mode("overwrite").parquet(_path(root, name))
    _cc_or_empty(spark, pairs).write.mode("overwrite").parquet(
        _path(root, "labels")
    )


def append_batch(spark: SparkSession, new_docs: DataFrame, root: str) -> dict:
    """Fold a new document batch into the store; returns append stats.

    Raises ``ValueError`` if the batch re-delivers a stored doc_id — the
    append-only contract; a silent append would double the doc's band
    entries and corrupt pair generation. The check is a column-pruned
    semi-join against the stored signature ids, cheap next to the append
    itself."""
    dup = (
        new_docs.select("doc_id")
        .join(
            _read(spark, root, "signatures").select("doc_id"), "doc_id", "leftsemi"
        )
        .limit(1)
        .collect()
    )
    if dup:
        raise ValueError(
            f"append_batch: doc_id {dup[0][0]} already in the store — "
            "batches must carry new doc_ids (re-deliveries are not appends)"
        )
    sh_new = shingles_of(new_docs).localCheckpoint(eager=True)
    sig_new = signatures_of(sh_new).localCheckpoint(eager=True)
    bands_new = bands_of(sig_new).localCheckpoint(eager=True)

    # candidate pairs: every pair involving a new doc collides with it in
    # >=1 band, so probing the FULL band table (old ∪ new) with only the
    # new bands finds old↔new and new↔new pairs; old↔old never regenerates.
    bands_all = _read(spark, root, "bands").unionByName(bands_new)
    a = bands_new.alias("a")
    b = bands_all.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .select(
            F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_a"),
            F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_b"),
        )
        .distinct()
    )
    # verification needs both sides' shingle sets; candidates only ever
    # reference new docs + their collision partners, so the join against
    # the stored shingles stays candidate-proportional.
    sh_all = _read(spark, root, "shingles").unionByName(sh_new)
    pairs_new = jaccard_verify(candidates, sh_all).localCheckpoint(eager=True)

    # label merge: old labeling as contraction edges + the new pairs
    old_label_edges = _read(spark, root, "labels").select(
        F.col("node").alias("doc_a"), F.col("label").alias("doc_b")
    )
    merged_input = old_label_edges.unionByName(
        pairs_new.select("doc_a", "doc_b")
    )
    labels = _cc_or_empty(spark, merged_input).localCheckpoint(eager=True)

    for name, df in (
        ("shingles", sh_new),
        ("signatures", sig_new),
        ("bands", bands_new),
        ("pairs", pairs_new),
    ):
        df.write.mode("append").parquet(_path(root, name))
    # overwrite via tmp-swap: the labels read above is checkpointed, but
    # the swap also keeps a reader from ever seeing a half-written dir
    tmp = _path(root, "labels.tmp")
    labels.write.mode("overwrite").parquet(tmp)
    import shutil

    shutil.rmtree(_path(root, "labels"))
    os.rename(tmp, _path(root, "labels"))
    return {
        "new_docs": sh_new.count(),
        "new_pairs": pairs_new.count(),
        "labeled_nodes": labels.count(),
    }
