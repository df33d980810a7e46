"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata,
with decode / feature-extract as Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the decode step is a
clearly-marked deterministic fake (`_fake_decode`) behind the same
interface a real decoder would use — the Spark-side plumbing (schema,
binary columns, Arrow batch shape, partitioning) is real and tested.
Swap `_fake_decode` for PIL/librosa/pyav in a real deployment.

The synthetic media table derives payload bytes from ``documents.text``
(utf-8), so the DuckDB oracle can recompute byte lengths and md5 digests
from the same strings.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ph_ee_nats_importer_rdbms_spark.sources.files import load_table, spread

MEDIA_TYPES = ("image", "audio", "video")

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("payload", BinaryType(), True),
        StructField("declared_width", IntegerType(), True),
        StructField("declared_height", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("content_md5", StringType(), True),
        StructField("feat_0", DoubleType(), True),
        StructField("feat_1", DoubleType(), True),
        StructField("feat_2", DoubleType(), True),
        StructField("feat_3", DoubleType(), True),
    ]
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize the opaque-binary media relation from ``documents``:
    payload = utf-8 bytes of the text, media_type round-robins, declared
    dimensions derive from doc_id (all JVM-side)."""
    # NOT spread: the payload chain feeds mapInPandas, and fanning a
    # bench-SF-sized scan out to 32 partitions costs 32 Python worker
    # launches + per-partition Arrow streams for ~5k rows. At real scale
    # the scan arrives pre-split and parallelism comes for free.
    d = load_table(spark, sf_dir, "documents")
    media_type = F.element_at(
        F.array(*[F.lit(t) for t in MEDIA_TYPES]),
        (F.col("doc_id") % len(MEDIA_TYPES) + 1).cast("int"),
    )
    return d.select(
        F.col("doc_id").alias("media_id"),
        media_type.alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        ((F.col("doc_id") * 37) % 1920 + 1).cast("int").alias("declared_width"),
        ((F.col("doc_id") * 53) % 1080 + 1).cast("int").alias("declared_height"),
    )


def _fake_decode(payload: bytes) -> tuple[str, list[float]]:
    """STUB — deterministic stand-in for a real media decoder.

    A real pipeline would decode the image/audio/video here (PIL, librosa,
    pyav) and emit model features; none of those libs exist in this
    container. We emit the content digest plus 4 pseudo-features from it so
    results are stable and oracle-checkable. Raise-on-use would be the
    other valid choice; a deterministic fake keeps the whole pipeline
    executable. ONE digest per payload: content id and features come from
    the same pass over the bytes (a real decoder reads the payload once
    too)."""
    md5 = hashlib.md5(payload)
    digest = md5.digest()
    return md5.hexdigest(), [round(b / 255.0, 6) for b in digest[:4]]


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched decode/feature-extract over the binary column.

    mapInPandas (not a scalar UDF) so a real decoder could emit a different
    number of rows per input (frame sampling) and hold per-batch decoder
    state. Batches arrive as pandas DataFrames with `payload` as bytes."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = pdf["payload"].map(
                lambda p: _fake_decode(bytes(p)) if p is not None else None
            )
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else None
                    ),
                    "content_md5": decoded.map(
                        lambda d: d[0] if d is not None else None
                    ),
                }
            )
            for i in range(4):
                out[f"feat_{i}"] = decoded.map(
                    lambda d, i=i: d[1][i] if d is not None else None
                )
            yield out

    return media.mapInPandas(decode_batches, schema=FEATURE_SCHEMA)


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decoded media features, staged per DATASET (``media`` domain):
    feature extraction is the ingest-time step of any real media pipeline —
    you decode each payload once per corpus snapshot, never per query. The
    fingerprint covers this module's bytes, so changing the decoder (or the
    synthetic table) rebuilds the stage."""
    from ph_ee_nats_importer_rdbms_spark.plans import staging

    return staging.load_memoized(
        spark,
        sf_dir,
        "media_features",
        lambda: extract_features(media_table(spark, sf_dir)),
        domain="media",
    )


def _md5_feat(i: int) -> str:
    """DuckDB mirror of `_fake_decode`: byte i of md5 digest / 255, 6dp."""
    return (
        f"round(CAST('0x' || substring(md5(text), {2 * i + 1}, 2) AS BIGINT)"
        f" / 255.0, 6) AS feat_{i}"
    )


MEDIA_FEATURES_ORACLE = f"""
SELECT doc_id AS media_id,
       ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS content_md5,
       {", ".join(_md5_feat(i) for i in range(4))}
FROM documents
"""


def q_media_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata aggregation over the media relation — the query a
    curation pipeline runs to size a decode fan-out."""
    m = media_table(spark, sf_dir)
    return m.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.max("declared_width").alias("max_width"),
        F.max("declared_height").alias("max_height"),
    )


MEDIA_SUMMARY_ORACLE = """
SELECT ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
       count(*) AS n_items,
       CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       max(CAST((doc_id * 37) % 1920 + 1 AS INT)) AS max_width,
       max(CAST((doc_id * 53) % 1080 + 1 AS INT)) AS max_height
FROM documents
GROUP BY 1
"""
