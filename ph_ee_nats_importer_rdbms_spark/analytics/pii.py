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
RE2/DuckDB agree on (no backreferences, no lookaround; ``\\b`` word
boundaries are ASCII in both engines) so the DuckDB oracle is the
literal same computation.

Audit-count semantics: counts are REPLACEMENTS PERFORMED, not raw-text
occurrences — each pattern is counted on the text as it stands when its
rewrite runs (emails on the raw text, phones on the email-redacted text,
long numbers on the phone-redacted text), so a digit run consumed by the
[EMAIL] replacement can never also be reported as a redacted id.

The long-number pattern is word-boundary guarded: a 9+ digit run glued
to letters (a hex-ish token id, a timestamp inside an identifier) is part
of a larger token, not an account number, and redacting it would mangle
legitimate prose tokens.

Two surfaces: the ``customer`` relation (nine-digit account runs inside
``c_name`` give the long-number pattern organic hits) and the
``documents`` prose corpus — the synthetic documents contain no
PII-shaped spans, so the docs query plants deterministic doc_id-derived
identifiers INTO the prose first (same expression in both engines) and
scrubs the result: the scrubber is exercised on running text, including
a letter-glued digit run that the boundary guard must NOT redact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ph_ee_nats_importer_rdbms_spark.sources.files import load_table

#: identifier patterns — Java-regex AND RE2 compatible (``\b`` is the
#: ASCII word boundary in both).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"
LONGNUM_RE = r"\b[0-9]{9,}\b"

#: replacement tokens survive tokenization as single rare types, which is
#: why scrubbers prefer them over deletion (keeps sentence structure).
EMAIL_TOKEN = "[EMAIL]"
PHONE_TOKEN = "[PHONE]"
LONGNUM_TOKEN = "[ID]"


def redaction_exprs(profile: F.Column) -> list[F.Column]:
    """The redaction transform as reusable Column exprs over any text
    column: [redacted, n_email, n_phone, n_id]. Email → phone → long-
    number in a fixed order so the rewrite is deterministic even where
    patterns overlap — and each count runs on the text THAT rewrite saw,
    so the counts state replacements performed, not raw occurrences."""
    after_email = F.regexp_replace(profile, F.lit(EMAIL_RE), F.lit(EMAIL_TOKEN))
    after_phone = F.regexp_replace(after_email, F.lit(PHONE_RE), F.lit(PHONE_TOKEN))
    redacted = F.regexp_replace(after_phone, F.lit(LONGNUM_RE), F.lit(LONGNUM_TOKEN))
    return [
        redacted.alias("redacted"),
        F.regexp_count(profile, F.lit(EMAIL_RE)).alias("n_email"),
        F.regexp_count(after_email, F.lit(PHONE_RE)).alias("n_phone"),
        F.regexp_count(after_phone, F.lit(LONGNUM_RE)).alias("n_id"),
    ]


def duck_redaction_sql(profile_sql: str) -> str:
    """The DuckDB twin of :func:`redaction_exprs` (same order, same
    aliases, same count-on-intermediate semantics) over an arbitrary text
    expression."""
    after_email = (
        f"regexp_replace({profile_sql}, '{EMAIL_RE}', '[EMAIL]', 'g')"
    )
    after_phone = f"regexp_replace({after_email}, '{PHONE_RE}', '[PHONE]', 'g')"
    return f"""
       regexp_replace({after_phone}, '{LONGNUM_RE}', '[ID]', 'g') AS redacted,
       CAST(len(regexp_extract_all({profile_sql}, '{EMAIL_RE}')) AS INT)
         AS n_email,
       CAST(len(regexp_extract_all({after_email}, '{PHONE_RE}')) AS INT)
         AS n_phone,
       CAST(len(regexp_extract_all({after_phone}, '{LONGNUM_RE}')) AS INT)
         AS n_id"""


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(c_custkey, redacted, n_email, n_phone, n_id) per customer profile.

    The profile text is the concatenation of the free-text-ish customer
    columns; redaction applies email → phone → long-number in that fixed
    order, counting each pattern on the intermediate its rewrite ran on.
    """
    c = load_table(spark, sf_dir, "customer")
    profile = F.concat_ws(" ", "c_name", "c_mktsegment")
    return c.select("c_custkey", *redaction_exprs(profile))


_DUCK_PROFILE = "concat_ws(' ', c_name, c_mktsegment)"

PII_REDACT_ORACLE = f"""
SELECT c_custkey, {duck_redaction_sql(_DUCK_PROFILE)}
FROM customer
"""


def _planted_text_spark() -> F.Column:
    """Prose + planted identifiers, derived purely from (text, doc_id):
    an email, a standalone 10-digit account number (must redact), and a
    letter-glued digit run (must NOT redact — the boundary-guard probe)."""
    return F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example acct "),
        (F.col("doc_id") + F.lit(1000000000)).cast("string"),
        F.lit(" ref"),
        (F.col("doc_id") + F.lit(2000000000)).cast("string"),
        F.lit("x end"),
    )


_PLANTED_TEXT_DUCK = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@mail.example acct ' || CAST(doc_id + 1000000000 AS VARCHAR)"
    " || ' ref' || CAST(doc_id + 2000000000 AS VARCHAR) || 'x end'"
)


def q_pii_redact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, redacted, n_email, n_phone, n_id) over the documents
    PROSE corpus with planted doc_id-derived identifiers (see module
    docstring): every row must report exactly one email and exactly one
    long-number redaction — the ``ref<digits>x`` run stays untouched
    because of the word-boundary guard. Map-only like the customer
    variant; at 100 TB the scan reads (doc_id, text) and nothing else.
    The scrubbed corpus is an ingest artifact like the cleaned corpus
    (dedup_spans), so it stages per dataset (``docs`` domain) — the
    three regex rewrites run once, warm calls read parquet."""
    from ph_ee_nats_importer_rdbms_spark.plans import staging

    def build() -> DataFrame:
        d = load_table(spark, sf_dir, "documents")
        return d.select("doc_id", *redaction_exprs(_planted_text_spark()))

    return staging.load_memoized(
        spark, sf_dir, "pii_redacted_docs", build, domain="docs"
    )


PII_REDACT_DOCS_ORACLE = f"""
SELECT doc_id, {duck_redaction_sql(_PLANTED_TEXT_DUCK)}
FROM documents
"""
