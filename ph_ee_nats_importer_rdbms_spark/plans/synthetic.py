"""Deterministic Zeebe event corpus derived from the ``orders`` table.

Purpose: the driver's correctness gate compares a Spark query against a
DuckDB oracle over the same parquet tables. The import pipeline's inputs are
Zeebe events, which those tables don't contain — so BOTH engines derive the
exact same synthetic event log from ``orders`` (pure shared-dialect SQL),
Spark runs the real operator pipeline over it, and the oracle re-computes
the expected tables in portable SQL. Every import-semantics rule (D1/D2
dedup, C2-C5 correlation, F1-F6 routing, C6 mapping) is thereby
hash-checked end-to-end.

Corpus shape per order (k = o_orderkey, inst = k*10, ts = epoch ms of
o_orderdate; process cycles by k%4 over TRANSFER-INCOMING /
TRANSFER-OUTGOING / TRANSACTION-REQUEST / BATCH; tenant = 'tn' || custkey%3):

  ts+0     PROCESS_INSTANCE ELEMENT_ACTIVATING
  ts+1000  VARIABLE transactionId "tx-<k>"
  ts+2000  VARIABLE amount "<totalprice>"
  ts+2000  VARIABLE amount "999999.99"  (k%5=0 — same-ts duplicate, D1-drop)
  ts+2500  VARIABLE currency
  ts+2600  VARIABLE batchId "b-<k>"
  ts+2650  VARIABLE quoteId, EMPTY bpmnProcessId (k%11=0 — C5 resolution)
  ts+2700  JOB CREATED svc-<k%6> / Task_<k%6>
  ts+2800  JOB CREATED duplicate         (k%3=0 — D2-drop)
  ts+2900  JOB COMPLETED                 (k%2=0)
  ts+3000  VARIABLE amount rewrite       (k%7=0 — LWW winner)
  ts+4000  child PROCESS ELEMENT_ACTIVATING, parent=inst   (k%20=0)
  ts+4500  child VARIABLE transactionId "ctx-<k>"          (k%20=0 — re-keys)
  ts+9000  child PROCESS ELEMENT_COMPLETED                 (k%20=0 & status O)
  ts+10000 PROCESS ELEMENT_COMPLETED                       (status F)
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# Shared-dialect derivation (runs verbatim in Spark SQL and DuckDB after
# substituting the one non-portable expression: epoch-ms of a timestamp).
# ---------------------------------------------------------------------------

SPARK_EPOCH_MS = "unix_millis(CAST(o_orderdate AS TIMESTAMP))"
DUCKDB_EPOCH_MS = "epoch_ms(o_orderdate)"

_BASE = """
base AS (
  SELECT CAST(o_orderkey AS BIGINT) AS k,
         CAST(o_orderkey AS BIGINT) * 10 AS inst,
         {EPOCH_MS} AS ts,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS STRING) AS amt,
         CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) + 1 AS DECIMAL(18,2)) AS STRING) AS amt2,
         CASE CAST(o_orderkey % 4 AS INT)
           WHEN 0 THEN 'PayeeQuoteTransfer'
           WHEN 1 THEN 'PayerFundTransfer'
           WHEN 2 THEN 'mpesa_flow'
           ELSE 'bulk_processor' END AS proc,
         'tn' || CAST(o_custkey % 3 AS STRING) AS tenant,
         CAST(o_orderkey AS BIGINT) * 100 + 50 AS def,
         CAST(o_orderkey AS BIGINT) * 100 + 55 AS cdef,
         o_orderstatus AS st,
         CASE WHEN o_custkey % 2 = 0 THEN 'USD' ELSE 'TZS' END AS cur
  FROM orders
)
"""

# Column order of every branch:
# partition_id, position, key, timestamp, record_type, value_type, intent,
# bpmn_process_id, process_instance_key, process_definition_key,
# parent_process_instance_key, bpmn_element_type, element_id, name, value,
# job_type
_EVENTS = """
zeebe_events AS (
  SELECT CAST(1 AS INT) AS partition_id, k*1000+1 AS position, inst AS key, ts AS timestamp,
         'EVENT' AS record_type, 'PROCESS_INSTANCE' AS value_type, 'ELEMENT_ACTIVATING' AS intent,
         proc || '-' || tenant AS bpmn_process_id, inst AS process_instance_key, def AS process_definition_key,
         CAST(-1 AS BIGINT) AS parent_process_instance_key, 'PROCESS' AS bpmn_element_type, proc AS element_id,
         CAST(NULL AS STRING) AS name, CAST(NULL AS STRING) AS value, CAST(NULL AS STRING) AS job_type
  FROM base
  UNION ALL
  SELECT 1, k*1000+2, inst+1, ts+1000, 'EVENT', 'VARIABLE', 'CREATED',
         proc || '-' || tenant, inst, def, CAST(NULL AS BIGINT), CAST(NULL AS STRING), CAST(NULL AS STRING),
         'transactionId', '"tx-' || CAST(k AS STRING) || '"', CAST(NULL AS STRING)
  FROM base
  UNION ALL
  SELECT 1, k*1000+3, inst+1, ts+2000, 'EVENT', 'VARIABLE', 'CREATED',
         proc || '-' || tenant, inst, def, CAST(NULL AS BIGINT), NULL, NULL,
         'amount', '"' || amt || '"', NULL
  FROM base
  UNION ALL
  SELECT 1, k*1000+4, inst+1, ts+2000, 'EVENT', 'VARIABLE', 'CREATED',
         proc || '-' || tenant, inst, def, CAST(NULL AS BIGINT), NULL, NULL,
         'amount', '"999999.99"', NULL
  FROM base WHERE k % 5 = 0
  UNION ALL
  SELECT 1, k*1000+5, inst+1, ts+3000, 'EVENT', 'VARIABLE', 'CREATED',
         proc || '-' || tenant, inst, def, CAST(NULL AS BIGINT), NULL, NULL,
         'amount', '"' || amt2 || '"', NULL
  FROM base WHERE k % 7 = 0
  UNION ALL
  SELECT 1, k*1000+6, inst+1, ts+2500, 'EVENT', 'VARIABLE', 'CREATED',
         proc || '-' || tenant, inst, def, CAST(NULL AS BIGINT), NULL, NULL,
         'currency', '"' || cur || '"', NULL
  FROM base
  UNION ALL
  SELECT 1, k*1000+7, inst+1, ts+2600, 'EVENT', 'VARIABLE', 'CREATED',
         proc || '-' || tenant, inst, def, CAST(NULL AS BIGINT), NULL, NULL,
         'batchId', '"b-' || CAST(k AS STRING) || '"', NULL
  FROM base
  UNION ALL
  SELECT 1, k*1000+8, inst+1, ts+2650, 'EVENT', 'VARIABLE', 'CREATED',
         '', inst, def, CAST(NULL AS BIGINT), NULL, NULL,
         'quoteId', '"q-' || CAST(k AS STRING) || '"', NULL
  FROM base WHERE k % 11 = 0
  UNION ALL
  SELECT 1, k*1000+9, inst+2, ts+2700, 'EVENT', 'JOB', 'CREATED',
         proc || '-' || tenant, inst, def, CAST(NULL AS BIGINT), NULL,
         'Task_' || CAST(k % 6 AS STRING), NULL, NULL, 'svc-' || CAST(k % 6 AS STRING)
  FROM base
  UNION ALL
  SELECT 1, k*1000+10, inst+2, ts+2800, 'EVENT', 'JOB', 'CREATED',
         proc || '-' || tenant, inst, def, CAST(NULL AS BIGINT), NULL,
         'Task_' || CAST(k % 6 AS STRING), NULL, NULL, 'svc-' || CAST(k % 6 AS STRING)
  FROM base WHERE k % 3 = 0
  UNION ALL
  SELECT 1, k*1000+11, inst+2, ts+2900, 'EVENT', 'JOB', 'COMPLETED',
         proc || '-' || tenant, inst, def, CAST(NULL AS BIGINT), NULL,
         'Task_' || CAST(k % 6 AS STRING), NULL, NULL, 'svc-' || CAST(k % 6 AS STRING)
  FROM base WHERE k % 2 = 0
  UNION ALL
  SELECT 1, k*1000+12, inst, ts+10000, 'EVENT', 'PROCESS_INSTANCE', 'ELEMENT_COMPLETED',
         proc || '-' || tenant, inst, def, CAST(-1 AS BIGINT), 'PROCESS', proc, NULL, NULL, NULL
  FROM base WHERE st = 'F'
  UNION ALL
  SELECT 1, k*1000+13, inst+1, ts+4000, 'EVENT', 'PROCESS_INSTANCE', 'ELEMENT_ACTIVATING',
         'PayeeQuoteTransfer-' || tenant, inst+1, cdef, inst, 'PROCESS', 'PayeeQuoteTransfer', NULL, NULL, NULL
  FROM base WHERE k % 20 = 0
  UNION ALL
  SELECT 1, k*1000+14, inst+3, ts+4500, 'EVENT', 'VARIABLE', 'CREATED',
         'PayeeQuoteTransfer-' || tenant, inst+1, cdef, CAST(NULL AS BIGINT), NULL, NULL,
         'transactionId', '"ctx-' || CAST(k AS STRING) || '"', NULL
  FROM base WHERE k % 20 = 0
  UNION ALL
  SELECT 1, k*1000+15, inst+1, ts+9000, 'EVENT', 'PROCESS_INSTANCE', 'ELEMENT_COMPLETED',
         'PayeeQuoteTransfer-' || tenant, inst+1, cdef, inst, 'PROCESS', 'PayeeQuoteTransfer', NULL, NULL, NULL
  FROM base WHERE k % 20 = 0 AND st = 'O'
)
"""


def derivation_sql(dialect: str) -> str:
    """WITH-clause body (base + zeebe_events CTEs) for the given dialect."""
    epoch = SPARK_EPOCH_MS if dialect == "spark" else DUCKDB_EPOCH_MS
    return (_BASE + ", " + _EVENTS).replace("{EPOCH_MS}", epoch)


def spark_events_sql() -> str:
    return "WITH " + derivation_sql("spark") + " SELECT * FROM zeebe_events"


def spark_base_sql() -> str:
    """Just the ``base`` CTE — callers stage it once so the 14 union
    branches scan the staged relation instead of recomputing the shared
    projection (decimal casts, string builds, epoch-ms) 14× over the
    parquet scan."""
    return (
        "WITH " + _BASE.replace("{EPOCH_MS}", SPARK_EPOCH_MS) + " SELECT * FROM base"
    )


def spark_events_from_base_sql() -> str:
    """The zeebe_events CTE over an existing ``base`` view."""
    return "WITH " + _EVENTS + " SELECT * FROM zeebe_events"


# ---------------------------------------------------------------------------
# DuckDB oracle CTEs re-computing the pipeline semantics in portable SQL.
# These encode the SAME rules the operators implement (citations in the
# operator modules); they are intentionally window-function based — clarity
# over speed, since the oracle runs only at sf0.01.
# ---------------------------------------------------------------------------

_ORACLE_COMMON = """
resolved AS (
  SELECT e.* EXCLUDE (bpmn_process_id),
         COALESCE(NULLIF(e.bpmn_process_id, ''), d.bpmn) AS bpmn_process_id
  FROM zeebe_events e
  LEFT JOIN (
    SELECT process_definition_key AS dk, max(bpmn_process_id) AS bpmn
    FROM zeebe_events
    WHERE bpmn_process_id IS NOT NULL AND bpmn_process_id <> ''
      AND process_definition_key IS NOT NULL
    GROUP BY 1
  ) d ON e.process_definition_key = d.dk
  WHERE COALESCE(NULLIF(e.bpmn_process_id, ''), d.bpmn) IS NOT NULL
),
routed AS (
  SELECT *,
         split_part(bpmn_process_id, '-', 1) AS process_id,
         nullif(substr(bpmn_process_id, length(split_part(bpmn_process_id, '-', 1)) + 2), '') AS tenant,
         CASE split_part(bpmn_process_id, '-', 1)
           WHEN 'PayeeQuoteTransfer' THEN 'TRANSFER'
           WHEN 'PayerFundTransfer' THEN 'TRANSFER'
           WHEN 'mpesa_flow' THEN 'TRANSACTION-REQUEST'
           WHEN 'bulk_processor' THEN 'BATCH'
           ELSE 'UNKNOWN' END AS process_type,
         CASE split_part(bpmn_process_id, '-', 1)
           WHEN 'PayeeQuoteTransfer' THEN 'INCOMING'
           WHEN 'PayerFundTransfer' THEN 'OUTGOING'
           WHEN 'mpesa_flow' THEN 'INCOMING'
           ELSE 'UNKNOWN' END AS process_direction
  FROM resolved
),
links AS (
  SELECT process_instance_key AS child_key, max(parent_process_instance_key) AS parent_key
  FROM routed
  WHERE value_type = 'PROCESS_INSTANCE' AND bpmn_element_type = 'PROCESS'
    AND intent = 'ELEMENT_ACTIVATING' AND COALESCE(parent_process_instance_key, -1) > 0
  GROUP BY 1
),
vars_d1 AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY process_instance_key, name, timestamp ORDER BY position
    ) AS _rn
    FROM routed WHERE value_type = 'VARIABLE'
  ) WHERE _rn = 1
),
proc_rows AS (
  SELECT * FROM routed
  WHERE value_type = 'PROCESS_INSTANCE' AND bpmn_element_type = 'PROCESS'
),
start_cand AS (
  SELECT process_instance_key AS inst, timestamp, position,
         process_direction AS direction, process_type
  FROM proc_rows
  WHERE intent = 'ELEMENT_ACTIVATING' AND COALESCE(parent_process_instance_key, -1) <= 0
  UNION ALL
  SELECT parent_process_instance_key, timestamp, position, 'OUTGOING', process_type
  FROM proc_rows
  WHERE intent = 'ELEMENT_ACTIVATING' AND COALESCE(parent_process_instance_key, -1) > 0
),
starts AS (
  SELECT inst, timestamp AS started_at_ms, direction, process_type FROM (
    SELECT *, row_number() OVER (PARTITION BY inst ORDER BY timestamp, position) AS _rn
    FROM start_cand
  ) WHERE _rn = 1
),
ends AS (
  SELECT COALESCE(l.parent_key, p.process_instance_key) AS inst,
         min(p.timestamp) AS completed_at_ms
  FROM proc_rows p LEFT JOIN links l ON p.process_instance_key = l.child_key
  WHERE p.intent = 'ELEMENT_COMPLETED'
  GROUP BY 1
)
"""


def _entity_vars_cte(process_type: str, known_names: str) -> str:
    return f"""
evars AS (
  SELECT COALESCE(l.parent_key, v.process_instance_key) AS inst,
         v.name, trim(v.value, '"') AS val, v.timestamp, v.position
  FROM vars_d1 v LEFT JOIN links l ON v.process_instance_key = l.child_key
  WHERE v.process_type = '{process_type}' AND v.name IN ({known_names})
),
elast AS (
  SELECT inst, name, val FROM (
    SELECT *, row_number() OVER (
      PARTITION BY inst, name ORDER BY timestamp DESC, position DESC
    ) AS _rn FROM evars
  ) WHERE _rn = 1
),
einstances AS (
  SELECT inst FROM elast GROUP BY 1
  UNION
  SELECT inst FROM starts WHERE process_type = '{process_type}'
)
"""


def oracle_with_clause() -> str:
    return derivation_sql("duckdb") + ", " + _ORACLE_COMMON


TRANSFERS_ORACLE = (
    "WITH "
    + oracle_with_clause()
    + ", "
    + _entity_vars_cte("TRANSFER", "'transactionId','amount','currency','batchId','quoteId'")
    + """
, tpivot AS (
  SELECT inst,
         max(CASE WHEN name = 'transactionId' THEN val END) AS transaction_id,
         max(CASE WHEN name = 'amount' THEN val END) AS amount_s,
         max(CASE WHEN name = 'currency' THEN val END) AS currency,
         max(CASE WHEN name = 'batchId' THEN val END) AS batch_id,
         max(CASE WHEN name = 'quoteId' THEN val END) AS payee_quote_code
  FROM elast GROUP BY 1
)
SELECT i.inst AS workflow_instance_key,
       p.transaction_id,
       s.started_at_ms,
       e.completed_at_ms,
       CASE WHEN e.completed_at_ms IS NOT NULL THEN 'COMPLETED' ELSE 'IN_PROGRESS' END AS status,
       CAST(NULL AS VARCHAR) AS status_detail,
       CAST(NULL AS VARCHAR) AS payee_dfsp_id,
       CAST(NULL AS VARCHAR) AS payee_party_id,
       CAST(NULL AS VARCHAR) AS payee_party_id_type,
       CAST(NULL AS DOUBLE) AS payee_fee,
       CAST(NULL AS VARCHAR) AS payee_fee_currency,
       p.payee_quote_code,
       CAST(NULL AS VARCHAR) AS payer_dfsp_id,
       CAST(NULL AS VARCHAR) AS payer_party_id,
       CAST(NULL AS VARCHAR) AS payer_party_id_type,
       CAST(NULL AS DOUBLE) AS payer_fee,
       CAST(NULL AS VARCHAR) AS payer_fee_currency,
       CAST(NULL AS VARCHAR) AS payer_quote_code,
       CAST(p.amount_s AS DOUBLE) AS amount,
       p.currency,
       s.direction,
       CAST(NULL AS VARCHAR) AS error_information,
       p.batch_id
FROM einstances i
LEFT JOIN tpivot p ON i.inst = p.inst
LEFT JOIN starts s ON i.inst = s.inst AND s.process_type = 'TRANSFER'
LEFT JOIN ends e ON i.inst = e.inst
"""
)

TRANSACTION_REQUESTS_ORACLE = (
    "WITH "
    + oracle_with_clause()
    + ", "
    + _entity_vars_cte("TRANSACTION-REQUEST", "'transactionId','quoteId'")
    + """
, tpivot AS (
  SELECT inst,
         max(CASE WHEN name = 'transactionId' THEN val END) AS transaction_id,
         max(CASE WHEN name = 'quoteId' THEN val END) AS payee_quote_code
  FROM elast GROUP BY 1
)
SELECT i.inst AS workflow_instance_key,
       p.transaction_id,
       s.started_at_ms,
       e.completed_at_ms,
       'IN_PROGRESS' AS state,
       CAST(NULL AS VARCHAR) AS payee_dfsp_id,
       CAST(NULL AS VARCHAR) AS payee_party_id,
       CAST(NULL AS VARCHAR) AS payee_party_id_type,
       CAST(NULL AS DOUBLE) AS payee_fee,
       p.payee_quote_code,
       CAST(NULL AS VARCHAR) AS payer_dfsp_id,
       CAST(NULL AS VARCHAR) AS payer_party_id,
       CAST(NULL AS VARCHAR) AS payer_party_id_type,
       CAST(NULL AS DOUBLE) AS payer_fee,
       CAST(NULL AS VARCHAR) AS payer_quote_code,
       CAST(NULL AS DOUBLE) AS amount,
       CAST(NULL AS VARCHAR) AS currency,
       s.direction,
       CAST(NULL AS VARCHAR) AS auth_type,
       CAST(NULL AS VARCHAR) AS initiator_type,
       CAST(NULL AS VARCHAR) AS scenario
FROM einstances i
LEFT JOIN tpivot p ON i.inst = p.inst
LEFT JOIN starts s ON i.inst = s.inst AND s.process_type = 'TRANSACTION-REQUEST'
LEFT JOIN ends e ON i.inst = e.inst
"""
)

BATCHES_ORACLE = (
    "WITH "
    + oracle_with_clause()
    + ", "
    + _entity_vars_cte("BATCH", "'batchId'")
    + """
, tpivot AS (
  SELECT inst, max(CASE WHEN name = 'batchId' THEN val END) AS batch_id
  FROM elast GROUP BY 1
),
wf AS (
  SELECT process_instance_key AS inst, min(process_definition_key) AS workflow_key
  FROM routed WHERE value_type = 'VARIABLE' AND process_type = 'BATCH' GROUP BY 1
)
SELECT i.inst AS workflow_instance_key,
       w.workflow_key,
       p.batch_id,
       CAST(NULL AS VARCHAR) AS request_id,
       CAST(NULL AS VARCHAR) AS request_file,
       CAST(NULL AS VARCHAR) AS note,
       CAST(NULL AS VARCHAR) AS result_file,
       CAST(NULL AS BIGINT) AS total_transactions,
       CAST(NULL AS BIGINT) AS ongoing,
       CAST(NULL AS BIGINT) AS failed,
       CAST(NULL AS BIGINT) AS completed,
       CAST(NULL AS BIGINT) AS result_generated_at_ms,
       s.started_at_ms,
       e.completed_at_ms
FROM einstances i
LEFT JOIN tpivot p ON i.inst = p.inst
LEFT JOIN wf w ON i.inst = w.inst
LEFT JOIN starts s ON i.inst = s.inst AND s.process_type = 'BATCH'
LEFT JOIN ends e ON i.inst = e.inst
"""
)

VARIABLES_ORACLE = (
    "WITH "
    + oracle_with_clause()
    + """
SELECT process_definition_key AS workflow_key,
       process_instance_key AS workflow_instance_key,
       timestamp,
       name,
       value
FROM vars_d1
"""
)

TASKS_ORACLE = (
    "WITH "
    + oracle_with_clause()
    + """
SELECT process_definition_key AS workflow_key,
       process_instance_key AS workflow_instance_key,
       timestamp,
       intent,
       record_type,
       job_type AS type,
       element_id
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY process_instance_key, element_id, intent
    ORDER BY timestamp, position
  ) AS _trn
  FROM routed WHERE value_type = 'JOB' AND job_type IS NOT NULL
) WHERE _trn = 1
"""
)

ROUTING_ORACLE = (
    "WITH "
    + oracle_with_clause()
    + """
SELECT tenant, process_type, count(*) AS n_events
FROM routed GROUP BY 1, 2
"""
)
