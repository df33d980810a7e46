"""Variable -> entity-field mappers, batch form (SURVEY §2.4 C6, §2.5).

The reference registers ~47 per-variable-name closures that mutate entity
fields in arrival order (VariableParser.java:41-91). Instead of 47 hand
functions, each mapping is a declarative spec row:

    FieldSpec(variable, target, extract, mode, condition)

- ``extract``  : Column -> Column over the raw variable value (JSONPath leaf
                 reads via get_json_object on the unescaped payload, casts,
                 quote-stripping — §2.5 X1-X10).
- ``mode``     : 'lww'   — last writer wins in (timestamp, position) replay
                           order (the net effect of per-event mutation under
                           the D1 rule);
                 'first' — first writer wins (reference sets only-if-null,
                           VariableParser.java:228-233).
- ``condition``: row-level gate evaluated against the (direction-joined)
                 variable row, for the direction-conditional mappers
                 (VariableParser.java:155-166, 285-295).

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
from typing import Callable

from pyspark.sql import Column, DataFrame, functions as F

from ph_ee_nats_importer_rdbms_spark import config as cfg
from ph_ee_nats_importer_rdbms_spark.functions.scalars import (
    bool_to_state,
    bool_to_transfer_status,
    iso_to_ts,
    jget,
    strip_quotes,
    to_money,
)

Extract = Callable[[Column], Column]
Condition = Callable[[], Column]


@dataclass(frozen=True)
class FieldSpec:
    variable: str
    target: str
    extract: Extract
    mode: str = "lww"  # 'lww' | 'first'
    condition: Condition | None = None  # extra row gate (e.g. direction)


def _s(path: str) -> Extract:
    return lambda v: jget(v, path)


def _money(path: str) -> Extract:
    return lambda v: jget(v, path).cast("decimal(19,4)")


def _strip() -> Extract:
    return lambda v: strip_quotes(v)


def _is_incoming() -> Column:
    return F.col("direction") == cfg.INCOMING


def _not_incoming() -> Column:  # reference: else-branch, includes null direction
    return ~F.coalesce(F.col("direction") == cfg.INCOMING, F.lit(False))


def _is_outgoing() -> Column:
    return F.col("direction") == cfg.OUTGOING


# --------------------------------------------------------------------------
# Transfers (VariableParser.java:41-69 and the private parsers it routes to)
# --------------------------------------------------------------------------

TRANSFER_SPECS: list[FieldSpec] = [
    # localQuoteResponse — direction-conditional (VariableParser.java:155-166)
    FieldSpec("localQuoteResponse", "payee_fee", _money("$.fspFee.amount"), condition=_is_incoming),
    FieldSpec("localQuoteResponse", "payee_fee_currency", _s("$.fspFee.currency"), condition=_is_incoming),
    FieldSpec("localQuoteResponse", "payee_quote_code", _s("$.quoteCode"), condition=_is_incoming),
    FieldSpec("localQuoteResponse", "payer_fee", _money("$.fspFee.amount"), condition=_not_incoming),
    FieldSpec("localQuoteResponse", "payer_fee_currency", _s("$.fspFee.currency"), condition=_not_incoming),
    FieldSpec("localQuoteResponse", "payer_quote_code", _s("$.quoteCode"), condition=_not_incoming),
    # quoteSwitchRequest (VariableParser.java:139-153)
    FieldSpec("quoteSwitchRequest", "transaction_id", _s("$.transactionId")),
    FieldSpec("quoteSwitchRequest", "payee_party_id_type", _s("$.payee.partyIdInfo.partyIdType")),
    FieldSpec("quoteSwitchRequest", "payee_party_id", _s("$.payee.partyIdInfo.partyIdentifier")),
    FieldSpec("quoteSwitchRequest", "payee_dfsp_id", _s("$.payee.partyIdInfo.fspId")),
    FieldSpec("quoteSwitchRequest", "payer_party_id_type", _s("$.payer.partyIdInfo.partyIdType")),
    FieldSpec("quoteSwitchRequest", "payer_party_id", _s("$.payer.partyIdInfo.partyIdentifier")),
    FieldSpec("quoteSwitchRequest", "payer_dfsp_id", _s("$.payer.partyIdInfo.fspId")),
    FieldSpec("quoteSwitchRequest", "amount", _money("$.amount.amount")),
    FieldSpec("quoteSwitchRequest", "currency", _s("$.amount.currency")),
    # payeeQuoteResponse (VariableParser.java:168-172)
    FieldSpec("payeeQuoteResponse", "payee_fee", _money("$.payeeFspFee.amount")),
    FieldSpec("payeeQuoteResponse", "payee_fee_currency", _s("$.payeeFspFee.currency")),
    # quoteId (VariableParser.java:44)
    FieldSpec("quoteId", "payee_quote_code", _strip()),
    # transferResponse-PREPARE / -CREATE (VariableParser.java:174-198)
    FieldSpec("transferResponse-PREPARE", "completed_at", lambda v: iso_to_ts(jget(v, "$.completedTimestamp"))),
    FieldSpec("transferResponse-CREATE", "completed_at", lambda v: iso_to_ts(jget(v, "$.completedTimestamp"))),
    # transferCreateFailed (VariableParser.java:185-187)
    FieldSpec("transferCreateFailed", "status", lambda v: bool_to_transfer_status(v)),
    # partyLookupFspId / initiatorFspId (VariableParser.java:48-49)
    FieldSpec("partyLookupFspId", "payee_dfsp_id", _strip()),
    FieldSpec("initiatorFspId", "payer_dfsp_id", _strip()),
    # channelRequest (VariableParser.java:200-211)
    FieldSpec("channelRequest", "payer_party_id", _s("$.payer.partyIdInfo.partyIdentifier")),
    FieldSpec("channelRequest", "payer_party_id_type", _s("$.payer.partyIdInfo.partyIdType")),
    FieldSpec("channelRequest", "payee_party_id", _s("$.payee.partyIdInfo.partyIdentifier")),
    FieldSpec("channelRequest", "payee_party_id_type", _s("$.payee.partyIdInfo.partyIdType")),
    FieldSpec("channelRequest", "amount", _money("$.amount.amount")),
    FieldSpec("channelRequest", "currency", _s("$.amount.currency")),
    # errorInformation (VariableParser.java:51-52,213-215): stores the text
    # AND routes through parseTransferCreateFailed (value != "false" => FAILED)
    FieldSpec("errorInformation", "error_information", _strip()),
    FieldSpec("errorInformation", "status", lambda v: bool_to_transfer_status(v)),
    # batchId / transactionId / amount / accounts / currencies / fees /
    # institutions / quote codes / account types (VariableParser.java:53-69)
    FieldSpec("batchId", "batch_id", _strip()),
    FieldSpec("transactionId", "transaction_id", _strip()),
    FieldSpec("amount", "amount", lambda v: to_money(v)),
    FieldSpec("sourceAccountId", "payer_party_id", _strip()),
    FieldSpec("targetAccountId", "payee_party_id", _strip()),
    FieldSpec("currency", "currency", _strip()),
    FieldSpec("sourceCurrency", "payer_fee_currency", _strip()),
    FieldSpec("targetCurrency", "payee_fee_currency", _strip()),
    FieldSpec("sourceFee", "payer_fee", lambda v: to_money(v)),
    FieldSpec("targetFee", "payee_fee", lambda v: to_money(v)),
    FieldSpec("sourceInstitution", "payer_dfsp_id", _strip()),
    FieldSpec("targetInstitution", "payee_dfsp_id", _strip()),
    FieldSpec("sourceQuoteCode", "payer_quote_code", _strip()),
    FieldSpec("targetQuoteCode", "payee_quote_code", _strip()),
    FieldSpec("sourceAccountType", "payer_party_id_type", _strip()),
    FieldSpec("targetAccountType", "payee_party_id_type", _strip()),
]

# --------------------------------------------------------------------------
# Transaction requests (VariableParser.java:71-86)
# --------------------------------------------------------------------------

TRANSACTION_REQUEST_SPECS: list[FieldSpec] = [
    FieldSpec("authType", "auth_type", _strip()),
    FieldSpec("transactionId", "transaction_id", _strip()),
    FieldSpec("partyLookupFspId", "payer_dfsp_id", _strip()),
    # initiatorFspId: OUTGOING-only (VariableParser.java:285-289)
    FieldSpec("initiatorFspId", "payee_dfsp_id", _strip(), condition=_is_outgoing),
    # channelRequest (VariableParser.java:217-234); initiatorType/scenario set
    # only-if-null -> 'first' mode
    FieldSpec("channelRequest", "payer_party_id", _s("$.payer.partyIdInfo.partyIdentifier")),
    FieldSpec("channelRequest", "payer_party_id_type", _s("$.payer.partyIdInfo.partyIdType")),
    FieldSpec("channelRequest", "payee_party_id", _s("$.payee.partyIdInfo.partyIdentifier")),
    FieldSpec("channelRequest", "payee_party_id_type", _s("$.payee.partyIdInfo.partyIdType")),
    FieldSpec("channelRequest", "amount", _money("$.amount.amount")),
    FieldSpec("channelRequest", "currency", _s("$.amount.currency")),
    FieldSpec("channelRequest", "initiator_type", _s("$.transactionType.initiatorType"), mode="first"),
    FieldSpec("channelRequest", "scenario", _s("$.transactionType.scenario"), mode="first"),
    # transactionRequestResponse (VariableParser.java:242-245)
    FieldSpec("transactionRequestResponse", "state", _s("$.transactionRequestState")),
    # transactionRequestFailed (VariableParser.java:247-251): sets FAILED only
    # on "true"; otherwise no-op -> gate the candidate row itself
    FieldSpec(
        "transactionRequestFailed", "state", lambda v: F.lit("FAILED"),
        condition=lambda: strip_quotes(F.col("value")) == "true",
    ),
    # transactionRequest (VariableParser.java:253-272)
    FieldSpec("transactionRequest", "transaction_id", _s("$.transactionRequestId")),
    FieldSpec("transactionRequest", "amount", _money("$.amount.amount")),
    FieldSpec("transactionRequest", "currency", _s("$.amount.currency")),
    FieldSpec("transactionRequest", "payee_party_id", _s("$.payee.partyIdInfo.partyIdentifier")),
    FieldSpec("transactionRequest", "payee_party_id_type", _s("$.payee.partyIdInfo.partyIdType")),
    FieldSpec("transactionRequest", "payee_dfsp_id", _s("$.payee.partyIdInfo.fspId")),
    FieldSpec("transactionRequest", "payer_party_id", _s("$.payer.partyIdentifier")),
    FieldSpec("transactionRequest", "payer_party_id_type", _s("$.payer.partyIdType")),
    FieldSpec("transactionRequest", "payer_dfsp_id", _s("$.payer.fspId")),
    FieldSpec("transactionRequest", "auth_type", lambda v: F.coalesce(jget(v, "$.authenticationType"), F.lit("NONE"))),
    FieldSpec("transactionRequest", "scenario", _s("$.transactionType.scenario")),
    FieldSpec("transactionRequest", "initiator_type", _s("$.transactionType.initiatorType")),
    # localQuoteResponse / payeeQuoteResponse (VariableParser.java:274-283)
    FieldSpec("localQuoteResponse", "payer_fee", _money("$.fspFee.amount")),
    FieldSpec("localQuoteResponse", "payer_quote_code", _s("$.quoteCode")),
    FieldSpec("payeeQuoteResponse", "payee_fee", _money("$.payeeFspFee.amount")),
    FieldSpec("quoteId", "payee_quote_code", _strip()),
    # transactionState: INCOMING-only (VariableParser.java:291-295)
    FieldSpec("transactionState", "state", _strip(), condition=_is_incoming),
    # mpesaChannelRequest (VariableParser.java:236-240): unconditional set
    FieldSpec("mpesaChannelRequest", "initiator_type", _s("$.transactionType.initiatorType")),
    FieldSpec("mpesaChannelRequest", "scenario", _s("$.transactionType.scenario")),
    # partyLookupFailed / transactionFailed / transferSettlementFailed
    # (VariableParser.java:102-133): null/empty no-op handled by bool_to_state
    # returning null + the null-candidate gate below
    FieldSpec("partyLookupFailed", "state", lambda v: bool_to_state(v, "FAILED", "RECEIVED"),
              condition=lambda: strip_quotes(F.col("value")).isNotNull() & (strip_quotes(F.col("value")) != "")),
    FieldSpec("transactionFailed", "state", lambda v: bool_to_state(v, "FAILED", "IN_PROGRESS"),
              condition=lambda: strip_quotes(F.col("value")).isNotNull() & (strip_quotes(F.col("value")) != "")),
    FieldSpec("transferSettlementFailed", "state", lambda v: bool_to_state(v, "FAILED", "ACCEPTED"),
              condition=lambda: strip_quotes(F.col("value")).isNotNull() & (strip_quotes(F.col("value")) != "")),
]

# --------------------------------------------------------------------------
# Batches (VariableParser.java:88-91)
# --------------------------------------------------------------------------

BATCH_SPECS: list[FieldSpec] = [
    FieldSpec("batchId", "batch_id", _strip()),
    FieldSpec("fileName", "request_file", _strip()),
    FieldSpec("requestId", "request_id", _strip()),
    FieldSpec("note", "note", _strip()),
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
                if s.condition is not None:
                    gate = gate & F.coalesce(s.condition(), F.lit(False))
                expr = F.when(gate, s.extract(F.col("value"))).otherwise(expr)
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
        if s.condition is not None:
            gate = gate & F.coalesce(s.condition(), F.lit(False))
        expr = expr | gate
    return expr
