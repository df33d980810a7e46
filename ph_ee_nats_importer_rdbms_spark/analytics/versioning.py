"""Dataset snapshot diffing — the versioning primitive a training-data
pipeline needs between corpus releases.

Rebuilding a 100 TB corpus per release and asking "what changed?" by
re-reading both copies is the anti-pattern; the operator below answers
it with one full-outer hash join on the document key, comparing
fixed-width CONTENT DIGESTS instead of payloads — the join shuffles
~64 bytes/row regardless of document size, and its output is
proportional to the CHURN, not the corpus (unchanged rows are dropped
before anything leaves the join). Downstream, the diff is exactly the
delivery relation the incremental stores consume: `added` rows feed
``append_batch``-style index maintenance, `removed`/`changed` rows name
the source slices to re-derive.

The registry entry diffs the documents table against a DETERMINISTIC
simulated next release (drop every 17th doc, revise every 20th, add a
new doc for every 23rd) so the oracle can reproduce it exactly; the
``diff_snapshots`` API is the general operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ph_ee_nats_importer_rdbms_spark.sources.files import load_table

#: simulated-next-release knobs (registry entry only)
DIFF_REMOVE_MOD = 17
DIFF_CHANGE_MOD = 20
DIFF_ADD_MOD = 23
DIFF_ADD_OFFSET = 10_000_000


def diff_snapshots(
    old: DataFrame, new: DataFrame, key: str = "doc_id", payload: str = "text"
) -> DataFrame:
    """(key, change) rows where ``change`` ∈ added | removed | changed —
    unchanged rows never leave the join. Digest-compare (sha256 hex) so
    the shuffle carries fixed-width rows; the join is a plain hash join
    on the key (co-partitionable, AQE-skew-splittable) with no payload
    movement."""
    o = old.select(F.col(key), F.sha2(F.col(payload), 256).alias("old_digest"))
    n = new.select(F.col(key), F.sha2(F.col(payload), 256).alias("new_digest"))
    change = (
        F.when(F.col("old_digest").isNull(), F.lit("added"))
        .when(F.col("new_digest").isNull(), F.lit("removed"))
        .when(F.col("old_digest") != F.col("new_digest"), F.lit("changed"))
    )
    return (
        o.join(n, key, "full_outer")
        .select(F.col(key), change.alias("change"))
        .filter(F.col("change").isNotNull())
    )


def _simulated_next(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    kept = d.filter(F.col("doc_id") % DIFF_REMOVE_MOD != 0)
    revised = kept.select(
        "doc_id",
        F.when(
            F.col("doc_id") % DIFF_CHANGE_MOD == 0,
            F.concat(F.col("text"), F.lit(" [rev2]")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    additions = d.filter(F.col("doc_id") % DIFF_ADD_MOD == 0).select(
        (F.col("doc_id") + DIFF_ADD_OFFSET).alias("doc_id"),
        F.concat(F.lit("new companion of "), F.col("doc_id").cast("string")).alias(
            "text"
        ),
    )
    return revised.unionByName(additions)


def q_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diff the current documents release against the simulated next one."""
    old = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return diff_snapshots(old, _simulated_next(spark, sf_dir))


CORPUS_DIFF_ORACLE = f"""
WITH old AS (
  SELECT doc_id, sha256(text) AS old_digest FROM documents
),
new_rel AS (
  SELECT doc_id,
         sha256(CASE WHEN doc_id % {DIFF_CHANGE_MOD} = 0
                     THEN text || ' [rev2]' ELSE text END) AS new_digest
  FROM documents WHERE doc_id % {DIFF_REMOVE_MOD} <> 0
  UNION ALL
  SELECT doc_id + {DIFF_ADD_OFFSET},
         sha256('new companion of ' || CAST(doc_id AS VARCHAR))
  FROM documents WHERE doc_id % {DIFF_ADD_MOD} = 0
)
SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.old_digest IS NULL THEN 'added'
            WHEN n.new_digest IS NULL THEN 'removed'
            WHEN o.old_digest <> n.new_digest THEN 'changed'
       END AS change
FROM old o FULL OUTER JOIN new_rel n ON o.doc_id = n.doc_id
WHERE (CASE WHEN o.old_digest IS NULL THEN 'added'
            WHEN n.new_digest IS NULL THEN 'removed'
            WHEN o.old_digest <> n.new_digest THEN 'changed'
       END) IS NOT NULL
"""
