"""PII scrubbing — the redaction stage of a training-data pipeline.

Before text reaches a tokenizer, production curation pipelines scrub
direct identifiers (emails, phone numbers, long account numbers) and
record how much was removed, both for compliance audits and because
redaction density is itself a quality signal (a page that is mostly
phone numbers is a directory, not prose).

The operator is a map-only pass: three ``regexp_replace`` rewrites plus
three ``regexp_count`` probes, all JVM-side inside whole-stage codegen —
no UDF, no shuffle, nothing that changes shape at 100 TB (the scan reads
exactly the projected columns; the filterless map parallelizes
per-split). Patterns are written in the syntax subset Java regex and
RE2/DuckDB agree on (no backreferences, no lookaround) so the DuckDB
oracle is the literal same computation.

Demonstrated over the ``customer`` relation (nine-digit account runs
inside ``c_name`` give the long-number pattern real hits; the email and
phone patterns are verified-zero on this corpus) because the synthetic
``documents`` corpus contains no PII-shaped spans at all — scrubbing it
would be a no-op that exercises nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ph_ee_nats_importer_rdbms_spark.sources.files import load_table

#: identifier patterns — Java-regex AND RE2 compatible.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"
LONGNUM_RE = r"[0-9]{9,}"

#: replacement tokens survive tokenization as single rare types, which is
#: why scrubbers prefer them over deletion (keeps sentence structure).
EMAIL_TOKEN = "[EMAIL]"
PHONE_TOKEN = "[PHONE]"
LONGNUM_TOKEN = "[ID]"


def redaction_exprs(profile: F.Column) -> list[F.Column]:
    """The redaction transform as reusable Column exprs over any text
    column: [redacted, n_email, n_phone, n_id]. Email → phone → long-
    number in a fixed order so the rewrite is deterministic even where
    patterns overlap."""
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(profile, F.lit(EMAIL_RE), F.lit(EMAIL_TOKEN)),
            F.lit(PHONE_RE),
            F.lit(PHONE_TOKEN),
        ),
        F.lit(LONGNUM_RE),
        F.lit(LONGNUM_TOKEN),
    )
    return [
        redacted.alias("redacted"),
        F.regexp_count(profile, F.lit(EMAIL_RE)).alias("n_email"),
        F.regexp_count(profile, F.lit(PHONE_RE)).alias("n_phone"),
        F.regexp_count(profile, F.lit(LONGNUM_RE)).alias("n_id"),
    ]


def duck_redaction_sql(profile_sql: str) -> str:
    """The DuckDB twin of :func:`redaction_exprs` (same order, same
    aliases) over an arbitrary text expression."""
    return f"""
       regexp_replace(
         regexp_replace(
           regexp_replace({profile_sql}, '{EMAIL_RE}', '[EMAIL]', 'g'),
           '{PHONE_RE}', '[PHONE]', 'g'),
         '{LONGNUM_RE}', '[ID]', 'g') AS redacted,
       CAST(len(regexp_extract_all({profile_sql}, '{EMAIL_RE}')) AS INT)
         AS n_email,
       CAST(len(regexp_extract_all({profile_sql}, '{PHONE_RE}')) AS INT)
         AS n_phone,
       CAST(len(regexp_extract_all({profile_sql}, '{LONGNUM_RE}')) AS INT)
         AS n_id"""


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(c_custkey, redacted, n_email, n_phone, n_id) per customer profile.

    The profile text is the concatenation of the free-text-ish customer
    columns; redaction applies email → phone → long-number in that fixed
    order (the patterns are disjoint on this corpus, but a fixed order
    makes the transform deterministic even where they are not).
    """
    c = load_table(spark, sf_dir, "customer")
    profile = F.concat_ws(" ", "c_name", "c_mktsegment")
    return c.select("c_custkey", *redaction_exprs(profile))


_DUCK_PROFILE = "concat_ws(' ', c_name, c_mktsegment)"

PII_REDACT_ORACLE = f"""
SELECT c_custkey, {duck_redaction_sql(_DUCK_PROFILE)}
FROM customer
"""
