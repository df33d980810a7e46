"""The reference's own unit-test payloads, end-to-end.

JsonParseTest.java:22-122 carries four inline Zeebe event JSONs (task
CREATED, process ELEMENT_ACTIVATING, DEPLOYMENT, variable CREATED). Here
they are re-typed to the Zeebe 1.x field names the mainline code reads
(SURVEY §0: workflowInstanceKey -> processInstanceKey, workflowKey ->
processDefinitionKey, WORKFLOW_INSTANCE -> PROCESS_INSTANCE / JOB) and
replayed through the real pipeline, asserting the same field extractions
the reference's test() checks (JsonParseTest.java:124-137) plus the
routing/dedup/lifecycle behavior around them. The reference's
variableCreated payload contains a trailing comma (lenient json-smart
accepts it); strict JSON is used here — the lenient-parse contract for
actually-malformed input is covered by the import-pipeline suite.
"""

from __future__ import annotations

import json

from ph_ee_nats_importer_rdbms_spark.operators import (
    parse_envelope,
    run_import_pipeline,
)

TASK_CREATED = {
    "partitionId": 3,
    "sourceRecordPosition": 12885411520,
    "recordType": "EVENT",
    "valueType": "JOB",
    "position": 12885411896,
    "value": {
        "elementId": "Task_1lfzg19",
        "variables": {},
        "type": "payee-party-lookup-DFSPID",
        "retries": 3,
        "elementInstanceKey": 6755399441058323,
        "processDefinitionKey": 2251799813687425,
        "processInstanceKey": 6755399441058311,
        "bpmnProcessId": "PayeePartyLookup-tn01",
        "deadline": -1,
        "worker": "",
    },
    "intent": "CREATED",
    "key": 6755399441058324,
    "timestamp": 1586104064972,
}

PROCESS_ACTIVATING = {
    "partitionId": 1,
    "value": {
        "version": 1,
        "flowScopeKey": -1,
        "bpmnElementType": "PROCESS",
        "parentProcessInstanceKey": -1,
        "parentElementInstanceKey": -1,
        "processInstanceKey": 2251799813686963,
        "bpmnProcessId": "PayerFundTransfer-tn01",
        "processDefinitionKey": 2251799813686925,
        "elementId": "PayerFundTransfer-tn01",
    },
    "sourceRecordPosition": 4296365776,
    "position": 4296367480,
    "key": 2251799813686963,
    "timestamp": 1590762784476,
    "valueType": "PROCESS_INSTANCE",
    "recordType": "EVENT",
    "intent": "ELEMENT_ACTIVATING",
}

DEPLOYMENT = {
    "partitionId": 1,
    "value": {
        "deployedWorkflows": [
            {
                "version": 1,
                "bpmnProcessId": "transfer-process-tn02",
                "processDefinitionKey": 2251799813688244,
            }
        ]
    },
    "position": 4299964072,
    "key": 2251799813688245,
    "timestamp": 1591957096471,
    "valueType": "DEPLOYMENT",
    "intent": "CREATED",
    "recordType": "EVENT",
}

VARIABLE_CREATED = {
    "partitionId": 3,
    "recordType": "EVENT",
    "valueType": "VARIABLE",
    "position": 12885411897,
    "value": {
        "name": "transactionId",
        "value": "abc-123-def-456",
        "processDefinitionKey": 2251799813687425,
        "processInstanceKey": 6755399441058311,
        "scopeKey": 6755399441058311,
    },
    "intent": "CREATED",
    "key": 6755399441058325,
    "timestamp": 1586104064972,
}


def test_reference_payloads_through_pipeline(spark):
    raw = [json.dumps(p) for p in
           [TASK_CREATED, PROCESS_ACTIVATING, DEPLOYMENT, VARIABLE_CREATED]]
    df = spark.createDataFrame([(s,) for s in raw], "value string")
    out = run_import_pipeline(parse_envelope(df))

    # JsonParseTest.test() field extractions, via the tasks table
    tasks = out["tasks"].collect()
    assert len(tasks) == 1
    t = tasks[0]
    assert t["type"] == "payee-party-lookup-DFSPID"
    assert t["element_id"] == "Task_1lfzg19"
    assert t["workflow_instance_key"] == 6755399441058311
    assert t["workflow_key"] == 2251799813687425
    assert t["intent"] == "CREATED"
    assert t["timestamp"] == 1586104064972

    # DEPLOYMENT is dropped (F1): nothing of it in any table
    vars_ = out["variables"].collect()
    assert len(vars_) == 1
    v = vars_[0]
    assert v["name"] == "transactionId"
    assert v["value"] == "abc-123-def-456"
    assert v["workflow_instance_key"] == 6755399441058311

    # PayerFundTransfer is a registered TRANSFER: ACTIVATING starts it
    transfers = {r["workflow_instance_key"]: r for r in out["transfers"].collect()}
    started = transfers[2251799813686963]
    assert started["status"] == "IN_PROGRESS"
    assert started["direction"] == "OUTGOING"
    assert started["started_at"] is not None and started["completed_at"] is None
    # PayeePartyLookup is NOT in the registry -> UNKNOWN type: its
    # transactionId variable is logged (above) but creates no entity
    assert 6755399441058311 not in transfers
