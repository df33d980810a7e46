"""Typed schemas for the Zeebe event envelope and the output tables.

Input side is *lenient*: the reference configures JSONPath with
DEFAULT_PATH_LEAF_TO_NULL + SUPPRESS_EXCEPTIONS
(importer/JsonPathReader.java:15-23), so every missing leaf reads as null.
The Spark equivalent is a fully-nullable StructType parsed with
``from_json(..., mode=PERMISSIVE)`` — absent fields become nulls, exactly
like the reference.

Field names are Zeebe 1.x (processInstanceKey / processDefinitionKey /
PROCESS_INSTANCE), which is what the mainline code reads
(NatsConsumer.java:49-53, RecordParser.java:85,134,150).

Output side is *fixed*: the reference declares JPA @Column mappings
(entity/transfer/Transfer.java:18-85, entity/transactionrequest/
TransactionRequest.java:20-74, entity/batch/Batch.java:16-57,
entity/task/Task.java:15-28, entity/variable/Variable.java:17-33). Money is
BigDecimal in the reference → DecimalType(19,4) here, never double.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Event envelope (one Zeebe record). value is kept as a raw JSON string and
# re-parsed per valueType branch: the three variants (PROCESS_INSTANCE /
# VARIABLE / JOB) have disjoint field sets, and keeping the variant raw lets
# Catalyst prune the second from_json to only the fields each branch reads.
# ---------------------------------------------------------------------------

ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("partitionId", T.IntegerType()),
        T.StructField("position", T.LongType()),
        T.StructField("sourceRecordPosition", T.LongType()),
        T.StructField("key", T.LongType()),
        T.StructField("timestamp", T.LongType()),  # epoch millis
        T.StructField("recordType", T.StringType()),
        T.StructField("valueType", T.StringType()),
        T.StructField("intent", T.StringType()),
        T.StructField("rejectionType", T.StringType()),
        T.StructField("rejectionReason", T.StringType()),
        T.StructField("value", T.StringType()),  # variant JSON, parsed per branch
    ]
)

# value for valueType == PROCESS_INSTANCE (RecordParser.java:158-180)
PROCESS_INSTANCE_VALUE_SCHEMA = T.StructType(
    [
        T.StructField("bpmnProcessId", T.StringType()),
        T.StructField("processInstanceKey", T.LongType()),
        T.StructField("processDefinitionKey", T.LongType()),
        T.StructField("parentProcessInstanceKey", T.LongType()),  # -1 = none
        T.StructField("parentElementInstanceKey", T.LongType()),
        T.StructField("flowScopeKey", T.LongType()),
        T.StructField("bpmnElementType", T.StringType()),
        T.StructField("elementId", T.StringType()),
        T.StructField("version", T.IntegerType()),
    ]
)

# value for valueType == VARIABLE (RecordParser.java:133-153)
VARIABLE_VALUE_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("value", T.StringType()),  # raw: scalar or escaped JSON
        T.StructField("processInstanceKey", T.LongType()),
        T.StructField("processDefinitionKey", T.LongType()),
        T.StructField("scopeKey", T.LongType()),
        T.StructField("bpmnProcessId", T.StringType()),
    ]
)

# value for valueType == JOB (RecordParser.java:223-255)
JOB_VALUE_SCHEMA = T.StructType(
    [
        T.StructField("type", T.StringType()),  # null => record skipped
        T.StructField("elementId", T.StringType()),
        T.StructField("processInstanceKey", T.LongType()),
        T.StructField("processDefinitionKey", T.LongType()),
        T.StructField("elementInstanceKey", T.LongType()),
        T.StructField("bpmnProcessId", T.StringType()),
        T.StructField("retries", T.IntegerType()),
        T.StructField("worker", T.StringType()),
        T.StructField("deadline", T.LongType()),
        T.StructField("errorMessage", T.StringType()),
        T.StructField("errorCode", T.StringType()),
    ]
)

# Flat (already-parsed) event relation used by the batch operators. A parquet
# or Kafka/NATS-sourced stream is normalized into this shape first; the
# value_* columns are the union of the variant fields each branch reads.
FLAT_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("partition_id", T.IntegerType()),
        T.StructField("position", T.LongType()),
        T.StructField("key", T.LongType()),
        T.StructField("timestamp", T.LongType()),
        T.StructField("record_type", T.StringType()),
        T.StructField("value_type", T.StringType()),
        T.StructField("intent", T.StringType()),
        T.StructField("bpmn_process_id", T.StringType()),  # with tenant suffix
        T.StructField("process_instance_key", T.LongType()),
        T.StructField("process_definition_key", T.LongType()),
        T.StructField("parent_process_instance_key", T.LongType()),
        T.StructField("bpmn_element_type", T.StringType()),
        T.StructField("element_id", T.StringType()),
        T.StructField("name", T.StringType()),  # VARIABLE only
        T.StructField("value", T.StringType()),  # VARIABLE payload
        T.StructField("job_type", T.StringType()),  # JOB only
    ]
)

MONEY = T.DecimalType(19, 4)

# ---------------------------------------------------------------------------
# Output tables (entity/*/*.java). Natural key is workflow_instance_key —
# the reference's surrogate JPA id is an RDBMS artifact we do not reproduce;
# upserts key on the natural key (SURVEY §2.1 S4).
# ---------------------------------------------------------------------------

TRANSFERS_SCHEMA = T.StructType(
    [
        T.StructField("workflow_instance_key", T.LongType(), False),
        T.StructField("transaction_id", T.StringType()),
        T.StructField("started_at", T.TimestampType()),
        T.StructField("completed_at", T.TimestampType()),
        T.StructField("status", T.StringType()),  # TransferStatus.java:3-8
        T.StructField("status_detail", T.StringType()),
        T.StructField("payee_dfsp_id", T.StringType()),
        T.StructField("payee_party_id", T.StringType()),
        T.StructField("payee_party_id_type", T.StringType()),
        T.StructField("payee_fee", MONEY),
        T.StructField("payee_fee_currency", T.StringType()),
        T.StructField("payee_quote_code", T.StringType()),
        T.StructField("payer_dfsp_id", T.StringType()),
        T.StructField("payer_party_id", T.StringType()),
        T.StructField("payer_party_id_type", T.StringType()),
        T.StructField("payer_fee", MONEY),
        T.StructField("payer_fee_currency", T.StringType()),
        T.StructField("payer_quote_code", T.StringType()),
        T.StructField("amount", MONEY),
        T.StructField("currency", T.StringType()),
        T.StructField("direction", T.StringType()),
        T.StructField("error_information", T.StringType()),
        T.StructField("batch_id", T.StringType()),
    ]
)

TRANSACTION_REQUESTS_SCHEMA = T.StructType(
    [
        T.StructField("workflow_instance_key", T.LongType(), False),
        T.StructField("transaction_id", T.StringType()),
        T.StructField("started_at", T.TimestampType()),
        T.StructField("completed_at", T.TimestampType()),
        T.StructField("state", T.StringType()),  # TransactionRequestState.java:3-9
        T.StructField("payee_dfsp_id", T.StringType()),
        T.StructField("payee_party_id", T.StringType()),
        T.StructField("payee_party_id_type", T.StringType()),
        T.StructField("payee_fee", MONEY),
        T.StructField("payee_quote_code", T.StringType()),
        T.StructField("payer_dfsp_id", T.StringType()),
        T.StructField("payer_party_id", T.StringType()),
        T.StructField("payer_party_id_type", T.StringType()),
        T.StructField("payer_fee", MONEY),
        T.StructField("payer_quote_code", T.StringType()),
        T.StructField("amount", MONEY),
        T.StructField("currency", T.StringType()),
        T.StructField("direction", T.StringType()),
        T.StructField("auth_type", T.StringType()),
        T.StructField("initiator_type", T.StringType()),
        T.StructField("scenario", T.StringType()),
    ]
)

BATCHES_SCHEMA = T.StructType(
    [
        T.StructField("workflow_instance_key", T.LongType(), False),
        T.StructField("workflow_key", T.LongType()),
        T.StructField("batch_id", T.StringType()),
        T.StructField("request_id", T.StringType()),
        T.StructField("request_file", T.StringType()),
        T.StructField("note", T.StringType()),
        T.StructField("result_file", T.StringType()),
        T.StructField("total_transactions", T.LongType()),
        T.StructField("ongoing", T.LongType()),
        T.StructField("failed", T.LongType()),
        T.StructField("completed", T.LongType()),
        T.StructField("result_generated_at", T.TimestampType()),
        T.StructField("started_at", T.TimestampType()),
        T.StructField("completed_at", T.TimestampType()),
    ]
)

TASKS_SCHEMA = T.StructType(
    [
        T.StructField("workflow_key", T.LongType()),
        T.StructField("workflow_instance_key", T.LongType(), False),
        T.StructField("timestamp", T.LongType()),
        T.StructField("intent", T.StringType()),
        T.StructField("record_type", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("element_id", T.StringType()),
    ]
)

VARIABLES_SCHEMA = T.StructType(
    [
        T.StructField("workflow_key", T.LongType()),
        T.StructField("workflow_instance_key", T.LongType(), False),
        T.StructField("timestamp", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("value", T.StringType()),
    ]
)

# tenant_server_connections (entity/tenant/TenantServerConnection.java:30-48)
TENANT_CONNECTIONS_SCHEMA = T.StructType(
    [
        T.StructField("schema_name", T.StringType(), False),
        T.StructField("schema_server", T.StringType()),
        T.StructField("schema_server_port", T.IntegerType()),
        T.StructField("schema_username", T.StringType()),
        T.StructField("schema_password", T.StringType()),
        T.StructField("auto_update", T.BooleanType()),
    ]
)

TRANSFER_STATUSES = ("COMPLETED", "FAILED", "IN_PROGRESS", "UNKNOWN")
TRANSACTION_REQUEST_STATES = (
    "IN_PROGRESS",
    "RECEIVED",
    "ACCEPTED",
    "REJECTED",
    "FAILED",
)
