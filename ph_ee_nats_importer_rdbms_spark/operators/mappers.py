"""Variable -> entity-field mappers (SURVEY §2.4 C6, §2.5).

The reference registers ~47 per-variable-name closures that mutate entity
fields in arrival order (VariableParser.java:41-91). Instead of 47 hand
functions, each mapping is a declarative spec row:

    FieldSpec(variable, target, op, mode, cond)

- ``op``   : what to extract from the raw variable value — a tagged tuple
             interpreted twice: as a Column expression for the batch pivot
             (this module) and as a Python function for the streaming
             stateful processor (streaming/state.py). ONE spec table drives
             both paths, so they cannot drift.
- ``mode`` : 'lww'   — last writer wins in (timestamp, position) replay
                       order (the net effect of per-event mutation under
                       the D1 rule);
             'first' — first writer wins (reference sets only-if-null,
                       VariableParser.java:228-233).
- ``cond`` : row-level gate tag, for the direction-conditional mappers
             (VariableParser.java:155-166, 285-295) and value-gated setters.

Op tags:
    ("json", path)                get_json_object leaf (X3)
    ("json_money", path)          leaf cast to DECIMAL(19,4) (X4)
    ("json_default", path, d)     leaf with null-coalesced default (X9)
    ("json_iso_ts", path)         leaf parsed yyyy-MM-dd'T'HH:mm:ss UTC (X5)
    ("strip",)                    quote-stripped raw value (X1)
    ("money",)                    quote-stripped cast to money (X4)
    ("transfer_status",)          "false"→COMPLETED else FAILED (X7)
    ("state_bool", t, f)          null/empty→no-op, "true"→t else f (X7)
    ("const", v)                  literal value
    ("event_ts",)                 the event's own timestamp as TIMESTAMP (X6)

Cond tags: "incoming" | "not_incoming" | "outgoing" | "value_true" |
"value_nonempty" (see _COND_COLS for exact semantics).

The whole pivot is ONE hash aggregation per entity type: every target column
is a conditional min/max_by over a single groupBy(instance_key) pass — one
shuffle, map-side combine, no windows, no per-row Python. That is the shape
that holds at 100 TB.

Fidelity note (documented deviation): the reference applies a closure's
*internal* null-vs-set decisions against entity state at event-processing
time. The batch fixed point reproduces this for every spec here except one
corner: a target written both by an 'lww' spec whose winning value is null
AND by a later 'first' spec would keep null in the reference but take the
'first' value here. No reference flow produces that interleaving
(initiatorType/scenario setters are disjoint in time); the streaming path
(streaming/state.py) is exact.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

from ph_ee_nats_importer_rdbms_spark import config as cfg
from ph_ee_nats_importer_rdbms_spark.functions.scalars import (
    bool_to_state,
    bool_to_transfer_status,
    epoch_ms_to_ts,
    iso_to_ts,
    payload_json,
    strip_quotes,
    to_money,
)


@dataclass(frozen=True)
class FieldSpec:
    variable: str
    target: str
    op: tuple
    mode: str = "lww"  # 'lww' | 'first'
    cond: str | None = None


def _json_paths(specs: list[FieldSpec]) -> list[list[str]]:
    """Dotted leaf paths of every json-op spec, '$.'-stripped and split."""
    paths = []
    for s in specs:
        if s.op[0].startswith("json"):
            paths.append(s.op[1].removeprefix("$.").split("."))
    return paths


def payload_schema(specs: list[FieldSpec]) -> T.StructType:
    """One StructType covering every JSONPath leaf any spec reads, each leaf
    a string (JSON scalars coerce to their literal text, exactly like
    get_json_object). Parsing the payload ONCE through this schema replaces
    the per-extraction get_json_object re-parse — a channelRequest row feeds
    ~6 targets, so this is a ~6x cut in JSON-parse work in the pivot."""

    def build(tree: dict) -> T.StructType:
        fields = []
        for k, sub in sorted(tree.items()):
            dtype = build(sub) if sub else T.StringType()
            fields.append(T.StructField(k, dtype))
        return T.StructType(fields)

    root: dict = {}
    for path in _json_paths(specs):
        node = root
        for part in path:
            node = node.setdefault(part, {})
    return build(root)


def _leaf(parsed: Column, dotted_path: str) -> Column:
    col = parsed
    for part in dotted_path.removeprefix("$.").split("."):
        col = col.getField(part)
    return col


def extract_col(
    spec: FieldSpec, value: Column, payload: Column | None = None,
    parsed: Column | None = None,
) -> Column:
    """Batch interpretation of ``spec.op`` as a Column over the raw value.

    ``payload`` is the pre-normalized JSON form of the value (see
    ``scalars.payload_json``) computed ONCE per row; passing it keeps the
    per-spec expression trees small — inlining the normalization into all
    ~46 specs multiplies both Catalyst analysis time and runtime regex
    work. ``parsed`` is the payload parsed ONCE through
    ``payload_schema``; when given, json ops are struct-field reads instead
    of per-op get_json_object re-parses."""
    tag, *args = spec.op
    pj = payload if payload is not None else payload_json(value)

    def leaf(path: str) -> Column:
        if parsed is not None:
            return _leaf(parsed, path)
        return F.get_json_object(pj, path)

    if tag == "json":
        return leaf(args[0])
    if tag == "json_money":
        return leaf(args[0]).cast("decimal(19,4)")
    if tag == "json_default":
        return F.coalesce(leaf(args[0]), F.lit(args[1]))
    if tag == "json_iso_ts":
        return iso_to_ts(leaf(args[0]))
    if tag == "strip":
        return strip_quotes(value)
    if tag == "money":
        return to_money(value)
    if tag == "transfer_status":
        return bool_to_transfer_status(value)
    if tag == "state_bool":
        return bool_to_state(value, args[0], args[1])
    if tag == "const":
        return F.lit(args[0])
    if tag == "event_ts":
        return epoch_ms_to_ts(F.col("timestamp"))
    raise ValueError(f"unknown op tag {tag!r}")


def _cond_col(tag: str) -> Column:
    """Row gates; evaluated against the direction-joined variable row."""
    if tag == "incoming":
        return F.col("direction") == cfg.INCOMING
    if tag == "not_incoming":  # reference else-branch: includes null direction
        return ~F.coalesce(F.col("direction") == cfg.INCOMING, F.lit(False))
    if tag == "outgoing":
        return F.col("direction") == cfg.OUTGOING
    if tag == "value_true":
        return strip_quotes(F.col("value")) == "true"
    if tag == "value_nonempty":
        s = strip_quotes(F.col("value"))
        return s.isNotNull() & (s != "")
    raise ValueError(f"unknown cond tag {tag!r}")


# --------------------------------------------------------------------------
# Transfers (VariableParser.java:41-69 and the private parsers it routes to)
# --------------------------------------------------------------------------

TRANSFER_SPECS: list[FieldSpec] = [
    # localQuoteResponse — direction-conditional (VariableParser.java:155-166)
    FieldSpec("localQuoteResponse", "payee_fee", ("json_money", "$.fspFee.amount"), cond="incoming"),
    FieldSpec("localQuoteResponse", "payee_fee_currency", ("json", "$.fspFee.currency"), cond="incoming"),
    FieldSpec("localQuoteResponse", "payee_quote_code", ("json", "$.quoteCode"), cond="incoming"),
    FieldSpec("localQuoteResponse", "payer_fee", ("json_money", "$.fspFee.amount"), cond="not_incoming"),
    FieldSpec("localQuoteResponse", "payer_fee_currency", ("json", "$.fspFee.currency"), cond="not_incoming"),
    FieldSpec("localQuoteResponse", "payer_quote_code", ("json", "$.quoteCode"), cond="not_incoming"),
    # quoteSwitchRequest (VariableParser.java:139-153)
    FieldSpec("quoteSwitchRequest", "transaction_id", ("json", "$.transactionId")),
    FieldSpec("quoteSwitchRequest", "payee_party_id_type", ("json", "$.payee.partyIdInfo.partyIdType")),
    FieldSpec("quoteSwitchRequest", "payee_party_id", ("json", "$.payee.partyIdInfo.partyIdentifier")),
    FieldSpec("quoteSwitchRequest", "payee_dfsp_id", ("json", "$.payee.partyIdInfo.fspId")),
    FieldSpec("quoteSwitchRequest", "payer_party_id_type", ("json", "$.payer.partyIdInfo.partyIdType")),
    FieldSpec("quoteSwitchRequest", "payer_party_id", ("json", "$.payer.partyIdInfo.partyIdentifier")),
    FieldSpec("quoteSwitchRequest", "payer_dfsp_id", ("json", "$.payer.partyIdInfo.fspId")),
    FieldSpec("quoteSwitchRequest", "amount", ("json_money", "$.amount.amount")),
    FieldSpec("quoteSwitchRequest", "currency", ("json", "$.amount.currency")),
    # payeeQuoteResponse (VariableParser.java:168-172)
    FieldSpec("payeeQuoteResponse", "payee_fee", ("json_money", "$.payeeFspFee.amount")),
    FieldSpec("payeeQuoteResponse", "payee_fee_currency", ("json", "$.payeeFspFee.currency")),
    # quoteId (VariableParser.java:44)
    FieldSpec("quoteId", "payee_quote_code", ("strip",)),
    # transferResponse-PREPARE / -CREATE (VariableParser.java:174-198)
    FieldSpec("transferResponse-PREPARE", "completed_at", ("json_iso_ts", "$.completedTimestamp")),
    FieldSpec("transferResponse-CREATE", "completed_at", ("json_iso_ts", "$.completedTimestamp")),
    # transferCreateFailed (VariableParser.java:185-187)
    FieldSpec("transferCreateFailed", "status", ("transfer_status",)),
    # partyLookupFspId / initiatorFspId (VariableParser.java:48-49)
    FieldSpec("partyLookupFspId", "payee_dfsp_id", ("strip",)),
    FieldSpec("initiatorFspId", "payer_dfsp_id", ("strip",)),
    # channelRequest (VariableParser.java:200-211)
    FieldSpec("channelRequest", "payer_party_id", ("json", "$.payer.partyIdInfo.partyIdentifier")),
    FieldSpec("channelRequest", "payer_party_id_type", ("json", "$.payer.partyIdInfo.partyIdType")),
    FieldSpec("channelRequest", "payee_party_id", ("json", "$.payee.partyIdInfo.partyIdentifier")),
    FieldSpec("channelRequest", "payee_party_id_type", ("json", "$.payee.partyIdInfo.partyIdType")),
    FieldSpec("channelRequest", "amount", ("json_money", "$.amount.amount")),
    FieldSpec("channelRequest", "currency", ("json", "$.amount.currency")),
    # errorInformation (VariableParser.java:51-52,213-215): stores the text
    # AND routes through parseTransferCreateFailed (value != "false" => FAILED)
    FieldSpec("errorInformation", "error_information", ("strip",)),
    FieldSpec("errorInformation", "status", ("transfer_status",)),
    # batchId / transactionId / amount / accounts / currencies / fees /
    # institutions / quote codes / account types (VariableParser.java:53-69)
    FieldSpec("batchId", "batch_id", ("strip",)),
    FieldSpec("transactionId", "transaction_id", ("strip",)),
    FieldSpec("amount", "amount", ("money",)),
    FieldSpec("sourceAccountId", "payer_party_id", ("strip",)),
    FieldSpec("targetAccountId", "payee_party_id", ("strip",)),
    FieldSpec("currency", "currency", ("strip",)),
    FieldSpec("sourceCurrency", "payer_fee_currency", ("strip",)),
    FieldSpec("targetCurrency", "payee_fee_currency", ("strip",)),
    FieldSpec("sourceFee", "payer_fee", ("money",)),
    FieldSpec("targetFee", "payee_fee", ("money",)),
    FieldSpec("sourceInstitution", "payer_dfsp_id", ("strip",)),
    FieldSpec("targetInstitution", "payee_dfsp_id", ("strip",)),
    FieldSpec("sourceQuoteCode", "payer_quote_code", ("strip",)),
    FieldSpec("targetQuoteCode", "payee_quote_code", ("strip",)),
    FieldSpec("sourceAccountType", "payer_party_id_type", ("strip",)),
    FieldSpec("targetAccountType", "payee_party_id_type", ("strip",)),
]

# --------------------------------------------------------------------------
# Transaction requests (VariableParser.java:71-86)
# --------------------------------------------------------------------------

TRANSACTION_REQUEST_SPECS: list[FieldSpec] = [
    FieldSpec("authType", "auth_type", ("strip",)),
    FieldSpec("transactionId", "transaction_id", ("strip",)),
    FieldSpec("partyLookupFspId", "payer_dfsp_id", ("strip",)),
    # initiatorFspId: OUTGOING-only (VariableParser.java:285-289)
    FieldSpec("initiatorFspId", "payee_dfsp_id", ("strip",), cond="outgoing"),
    # channelRequest (VariableParser.java:217-234); initiatorType/scenario set
    # only-if-null -> 'first' mode
    FieldSpec("channelRequest", "payer_party_id", ("json", "$.payer.partyIdInfo.partyIdentifier")),
    FieldSpec("channelRequest", "payer_party_id_type", ("json", "$.payer.partyIdInfo.partyIdType")),
    FieldSpec("channelRequest", "payee_party_id", ("json", "$.payee.partyIdInfo.partyIdentifier")),
    FieldSpec("channelRequest", "payee_party_id_type", ("json", "$.payee.partyIdInfo.partyIdType")),
    FieldSpec("channelRequest", "amount", ("json_money", "$.amount.amount")),
    FieldSpec("channelRequest", "currency", ("json", "$.amount.currency")),
    FieldSpec("channelRequest", "initiator_type", ("json", "$.transactionType.initiatorType"), mode="first"),
    FieldSpec("channelRequest", "scenario", ("json", "$.transactionType.scenario"), mode="first"),
    # transactionRequestResponse (VariableParser.java:242-245)
    FieldSpec("transactionRequestResponse", "state", ("json", "$.transactionRequestState")),
    # transactionRequestFailed (VariableParser.java:247-251): sets FAILED only
    # on "true"; otherwise no-op -> gate the candidate row itself
    FieldSpec("transactionRequestFailed", "state", ("const", "FAILED"), cond="value_true"),
    # transactionRequest (VariableParser.java:253-272)
    FieldSpec("transactionRequest", "transaction_id", ("json", "$.transactionRequestId")),
    FieldSpec("transactionRequest", "amount", ("json_money", "$.amount.amount")),
    FieldSpec("transactionRequest", "currency", ("json", "$.amount.currency")),
    FieldSpec("transactionRequest", "payee_party_id", ("json", "$.payee.partyIdInfo.partyIdentifier")),
    FieldSpec("transactionRequest", "payee_party_id_type", ("json", "$.payee.partyIdInfo.partyIdType")),
    FieldSpec("transactionRequest", "payee_dfsp_id", ("json", "$.payee.partyIdInfo.fspId")),
    FieldSpec("transactionRequest", "payer_party_id", ("json", "$.payer.partyIdentifier")),
    FieldSpec("transactionRequest", "payer_party_id_type", ("json", "$.payer.partyIdType")),
    FieldSpec("transactionRequest", "payer_dfsp_id", ("json", "$.payer.fspId")),
    FieldSpec("transactionRequest", "auth_type", ("json_default", "$.authenticationType", "NONE")),
    FieldSpec("transactionRequest", "scenario", ("json", "$.transactionType.scenario")),
    FieldSpec("transactionRequest", "initiator_type", ("json", "$.transactionType.initiatorType")),
    # localQuoteResponse / payeeQuoteResponse (VariableParser.java:274-283)
    FieldSpec("localQuoteResponse", "payer_fee", ("json_money", "$.fspFee.amount")),
    FieldSpec("localQuoteResponse", "payer_quote_code", ("json", "$.quoteCode")),
    FieldSpec("payeeQuoteResponse", "payee_fee", ("json_money", "$.payeeFspFee.amount")),
    FieldSpec("quoteId", "payee_quote_code", ("strip",)),
    # transactionState: INCOMING-only (VariableParser.java:291-295)
    FieldSpec("transactionState", "state", ("strip",), cond="incoming"),
    # mpesaChannelRequest (VariableParser.java:236-240): unconditional set
    FieldSpec("mpesaChannelRequest", "initiator_type", ("json", "$.transactionType.initiatorType")),
    FieldSpec("mpesaChannelRequest", "scenario", ("json", "$.transactionType.scenario")),
    # partyLookupFailed / transactionFailed / transferSettlementFailed
    # (VariableParser.java:102-133): null/empty no-op handled by the
    # value_nonempty gate + state_bool
    FieldSpec("partyLookupFailed", "state", ("state_bool", "FAILED", "RECEIVED"), cond="value_nonempty"),
    FieldSpec("transactionFailed", "state", ("state_bool", "FAILED", "IN_PROGRESS"), cond="value_nonempty"),
    FieldSpec("transferSettlementFailed", "state", ("state_bool", "FAILED", "ACCEPTED"), cond="value_nonempty"),
]

# --------------------------------------------------------------------------
# Batches (VariableParser.java:88-91)
# --------------------------------------------------------------------------

BATCH_SPECS: list[FieldSpec] = [
    FieldSpec("batchId", "batch_id", ("strip",)),
    FieldSpec("fileName", "request_file", ("strip",)),
    FieldSpec("requestId", "request_id", ("strip",)),
    FieldSpec("note", "note", ("strip",)),
]

KNOWN_TRANSFER_VARIABLES = sorted({s.variable for s in TRANSFER_SPECS})
KNOWN_TRANSACTION_REQUEST_VARIABLES = sorted({s.variable for s in TRANSACTION_REQUEST_SPECS})
KNOWN_BATCH_VARIABLES = sorted({s.variable for s in BATCH_SPECS})


def pivot_entity_fields(
    variables: DataFrame,
    specs: list[FieldSpec],
    key: str = "instance_key",
) -> DataFrame:
    """One-pass pivot: per instance, resolve every target column from its
    candidate variable events.

    ``variables`` must have: ``instance_key`` (post-rekey), ``name``,
    ``value``, ``timestamp``, ``position``, ``direction`` (nullable).

    Per target column: candidates = rows whose variable name (and optional
    condition) match; winner = max/min (timestamp, position); the *extracted*
    value of the winner is taken even when null, matching the reference's
    unconditional setters.
    """
    by_target: dict[str, list[FieldSpec]] = {}
    for s in specs:
        by_target.setdefault(s.target, []).append(s)

    # normalize the (possibly escaped) JSON payload ONCE per row, then parse
    # it ONCE through the union schema of every path the specs read; every
    # json-op spec is then a free struct-field access instead of its own
    # get_json_object re-parse of the payload string
    variables = variables.withColumn(
        "payload", payload_json(F.col("value"))
    ).withColumn("parsed", F.from_json(F.col("payload"), payload_schema(specs)))

    ord_ = F.struct(F.col("timestamp"), F.col("position"))
    aggs: list[Column] = [
        F.count(F.lit(1)).alias("known_variable_events"),
    ]
    for target, target_specs in sorted(by_target.items()):
        lww = [s for s in target_specs if s.mode == "lww"]
        first = [s for s in target_specs if s.mode == "first"]

        def candidate(specs_: list[FieldSpec]) -> Column:
            expr: Column = F.lit(None)
            for s in specs_:
                gate = F.col("name") == s.variable
                if s.cond is not None:
                    gate = gate & F.coalesce(_cond_col(s.cond), F.lit(False))
                expr = F.when(
                    gate,
                    extract_col(
                        s, F.col("value"), F.col("payload"), F.col("parsed")
                    ),
                ).otherwise(expr)
            return expr

        cols = []
        if lww:
            cand = candidate(lww)
            cols.append(F.max_by(cand, F.when(_is_candidate(lww), ord_)))
        if first:
            cand = candidate(first)
            cols.append(F.min_by(cand, F.when(cand.isNotNull(), ord_)))
        agg = F.coalesce(*cols) if len(cols) > 1 else cols[0]
        aggs.append(agg.alias(target))

    return variables.groupBy(F.col(key)).agg(*aggs)


def _is_candidate(specs_: list[FieldSpec]) -> Column:
    """True when the row is a candidate event for any of the given specs
    (name matches + condition holds), independent of the extracted value —
    needed so a matching event whose extraction is null still wins LWW and
    nulls the field, like the reference's unconditional setters."""
    expr = F.lit(False)
    for s in specs_:
        gate = F.col("name") == s.variable
        if s.cond is not None:
            gate = gate & F.coalesce(_cond_col(s.cond), F.lit(False))
        expr = expr | gate
    return expr
