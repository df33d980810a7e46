"""Scalar expression helpers (SURVEY §2.5 X1-X12).

All are pure Column expressions — they stay JVM-side inside whole-stage
codegen; no Python UDFs in the hot path.

Reference citations:
- strip_quotes       OperatorUtils.java:7-9  (strip ^"|"$)
- unescape_json      importer/JsonPathReader.java:26-29 (commons-text
                     unescapeJson on an escaped JSON-in-JSON payload)
- iso_to_ts          OperatorUtils.java:11-13 (yyyy-MM-dd'T'HH:mm:ss, GMT
                     forced at DatabaseImporterApplication.java:14-17)
- epoch_ms_to_ts     new Date(timestamp), e.g. InflightTransferManager.java:30
- to_money           new BigDecimal(strip(v)), VariableParser.java:56,62-63
- bool_to_transfer_status  VariableParser.java:185-187
- first_dash_prefix/suffix NatsConsumer.java:73-75 (split on FIRST dash)
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from ph_ee_nats_importer_rdbms_spark.schemas import MONEY


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def strip_quotes(c: Column | str) -> Column:
    """Remove one leading and one trailing double-quote if present."""
    return F.regexp_replace(_col(c), '^"|"$', "")


def unescape_json(c: Column | str) -> Column:
    r"""Turn an escaped JSON-in-JSON payload ("{\"a\":1}") into parseable
    JSON ({"a":1}): strip outer quotes, then unescape \" and \\.

    The reference uses full JSON unescaping; the two sequences handled here
    are the only ones Zeebe emits for these payloads (object syntax — quotes
    and backslashes).
    """
    s = strip_quotes(c)
    s = F.regexp_replace(s, r'\\"', '"')
    return F.regexp_replace(s, r"\\\\", r"\\")


def payload_json(c: Column | str) -> Column:
    """A variable's raw value as parseable JSON whether it arrived escaped
    ("{\\"a\\":1}") or plain ({"a":1})."""
    raw = _col(c)
    return F.when(raw.startswith('"'), unescape_json(raw)).otherwise(raw)


def jget(c: Column | str, path: str) -> Column:
    """Lenient JSONPath leaf read (null on miss), over a possibly-escaped
    payload — the Spark analog of JsonPathReader.parseEscaped().read()."""
    return F.get_json_object(payload_json(c), path)


def iso_to_ts(c: Column | str) -> Column:
    """yyyy-MM-dd'T'HH:mm:ss (no zone) parsed in the UTC session zone.

    ``to_timestamp`` raises in ANSI mode on malformed input; the reference
    logs-and-skips (VariableParser.java:178-182), so use try_to_timestamp.
    """
    return F.try_to_timestamp(
        strip_quotes(c), F.lit("yyyy-MM-dd'T'HH:mm:ss")
    )


def epoch_ms_to_ts(c: Column | str) -> Column:
    return F.timestamp_millis(_col(c).cast("long"))


def to_money(c: Column | str) -> Column:
    return strip_quotes(c).cast(MONEY)


def bool_to_transfer_status(c: Column | str) -> Column:
    """transferCreateFailed semantics: "false" → COMPLETED, anything else
    (including "true" and garbage) → FAILED."""
    return F.when(strip_quotes(c) == "false", F.lit("COMPLETED")).otherwise(
        F.lit("FAILED")
    )


def bool_to_state(c: Column | str, on_true: str, on_false: str) -> Column:
    """transactionFailed / partyLookupFailed / transferSettlementFailed
    semantics (VariableParser.java:102-133): null/empty → no-op (null here),
    "true" → FAILED, else the per-variable fallback state."""
    s = strip_quotes(c)
    return (
        F.when(s.isNull() | (s == ""), F.lit(None).cast("string"))
        .when(s == "true", F.lit(on_true))
        .otherwise(F.lit(on_false))
    )


def first_dash_prefix(c: Column | str) -> Column:
    """bpmnProcessId without tenant: substring before the FIRST dash."""
    return F.substring_index(_col(c), "-", 1)


def first_dash_suffix(c: Column | str) -> Column:
    """Tenant name: substring after the FIRST dash (keeps later dashes).

    No dash AND trailing dash both mean "no tenant" and normalize to
    NULL — one canonical no-tenant shape (the DuckDB oracle mirrors
    with NULLIF). This also makes the tenant-partitioned routed stage
    round-trip exactly: hive partitioning folds '' into NULL on
    read-back, so an engine that never emits '' cannot diverge across
    the storage layer."""
    col = _col(c)
    return F.when(
        F.instr(col, "-") > 0,
        F.nullif(F.substr(col, F.instr(col, "-") + F.lit(1)), F.lit("")),
    )


def has_parent(c: Column | str) -> Column:
    """parentProcessInstanceKey > 0 (Zeebe uses -1 for none)."""
    return _col(c).isNotNull() & (_col(c) > 0)
