"""Streaming pipeline tests: state-machine unit tests (no Spark) + a
multi-hop end-to-end run compared against the batch pipeline on the same
corpus — the batch fixed point IS the specification for the final tables.
"""

from __future__ import annotations

import json

import pytest

from ph_ee_nats_importer_rdbms_spark.streaming import state as sm
from tests.zeebe_fixtures import (
    CHANNEL_REQUEST,
    escaped_json,
    flat_event,
    job_event,
    process_event,
    to_df,
    variable_event,
)

# ---------------------------------------------------------------------------
# State machine unit tests (pure Python, fast)
# ---------------------------------------------------------------------------


def test_resolve_buffers_until_definition_known():
    st = sm.ResolveState()
    ev_unres = {"bpmn_process_id": "", "name": "amount", "timestamp": 1}
    st, out = sm.resolve_step(st, [ev_unres])
    assert out == [] and len(st.buffered) == 1
    carrier = {"bpmn_process_id": "flow-tn01", "timestamp": 2}
    st, out = sm.resolve_step(st, [carrier])
    # buffered event replays first, with the learned id
    assert [e.get("bpmn_process_id") for e in out] == ["flow-tn01", "flow-tn01"]
    assert st.buffered == [] and st.resolved_bpmn == "flow-tn01"
    # later unresolved events pass straight through
    st, out = sm.resolve_step(st, [dict(ev_unres)])
    assert out[0]["bpmn_process_id"] == "flow-tn01"


def test_rekey_child_lifecycle():
    st = sm.RekeyState()
    act = {
        "value_type": "PROCESS_INSTANCE", "bpmn_element_type": "PROCESS",
        "intent": "ELEMENT_ACTIVATING", "process_instance_key": 77,
        "parent_process_instance_key": 70,
    }
    var = {"value_type": "VARIABLE", "process_instance_key": 77, "name": "x"}
    done = {
        "value_type": "PROCESS_INSTANCE", "bpmn_element_type": "PROCESS",
        "intent": "ELEMENT_COMPLETED", "process_instance_key": 77,
    }
    st, out = sm.rekey_step(st, [act, var, done])
    assert [e["effective_key"] for e in out] == [70, 70, 70]
    assert out[0]["child_start"] is True
    assert st.parent_key is None  # completion popped the link
    # post-completion events are NOT re-keyed (map was popped)
    st, out = sm.rekey_step(st, [dict(var)])
    assert out[0]["effective_key"] == 77


def test_entity_d1_d3_d4_semantics():
    st = sm.EntityState()
    mk = lambda ts, name, value: {
        "value_type": "VARIABLE", "process_instance_key": 9, "timestamp": ts,
        "name": name, "value": value, "process_type": "TRANSFER",
        "process_definition_key": 1,
    }
    start = {
        "value_type": "PROCESS_INSTANCE", "bpmn_element_type": "PROCESS",
        "intent": "ELEMENT_ACTIVATING", "process_instance_key": 9,
        "timestamp": 5, "process_type": "TRANSFER",
        "process_direction": "INCOMING", "process_definition_key": 1,
    }
    end = dict(start, intent="ELEMENT_COMPLETED", timestamp=30)
    st, out = sm.entity_step(
        st,
        [
            start,
            mk(10, "amount", '"5.00"'),
            mk(10, "amount", '"9.99"'),   # D1: same ts -> dropped
            mk(20, "amount", '"7.00"'),   # newer ts -> wins
            dict(start, timestamp=25),     # D3: second start ignored
            end,
            dict(end, timestamp=40),       # D4: second completion ignored
        ],
    )
    assert st.entity["amount"] == 7.0
    assert st.entity["started_at"] == 5 and st.entity["completed_at"] == 30
    assert st.entity["status"] == "COMPLETED"
    assert st.entity["direction"] == "INCOMING"
    # two accepted variable rows (D1 kept ts=10 once and ts=20)
    assert [r["timestamp"] for r in out if r["kind"] == "variable"] == [10, 20]


def test_entity_task_dedup_and_null_type_guard():
    st = sm.EntityState()
    job = lambda intent, ts, jt="svc": {
        "value_type": "JOB", "process_instance_key": 3, "timestamp": ts,
        "element_id": "T1", "intent": intent, "job_type": jt,
        "record_type": "EVENT", "process_type": "TRANSFER",
        "process_definition_key": 1,
    }
    st, out = sm.entity_step(
        st, [job("CREATED", 1), job("CREATED", 2), job("COMPLETED", 3),
             job("FAILED", 4, jt=None)]
    )
    kinds = [(r["intent"]) for r in out if r["kind"] == "task"]
    assert kinds == ["CREATED", "COMPLETED"]  # dup CREATED + null-type dropped


def test_entity_mapper_interpretation_matches_condition_gates():
    st = sm.EntityState()
    start = {
        "value_type": "PROCESS_INSTANCE", "bpmn_element_type": "PROCESS",
        "intent": "ELEMENT_ACTIVATING", "process_instance_key": 4,
        "timestamp": 1, "process_type": "TRANSFER",
        "process_direction": "INCOMING", "process_definition_key": 1,
    }
    lqr = {
        "value_type": "VARIABLE", "process_instance_key": 4, "timestamp": 2,
        "name": "localQuoteResponse", "value": escaped_json(
            {"fspFee": {"amount": "1.25", "currency": "USD"}, "quoteCode": "Q-7"}
        ),
        "process_type": "TRANSFER", "process_definition_key": 1,
    }
    st, _ = sm.entity_step(st, [start, lqr])
    # INCOMING direction -> payee_* fields set, payer_* untouched
    assert st.entity["payee_fee"] == 1.25
    assert st.entity["payee_quote_code"] == "Q-7"
    assert "payer_fee" not in st.entity


# ---------------------------------------------------------------------------
# End-to-end multi-hop streaming vs batch pipeline
# ---------------------------------------------------------------------------


def _corpus() -> list[dict]:
    """A corpus exercising C4 (call activity), C5 (unresolved bpmn), D1-D4,
    and all three entity types."""
    ev = []
    # transfer with call-activity child (parent 100, child 101)
    ev += [
        process_event(100, "ELEMENT_ACTIVATING", 1_000),
        variable_event(100, "transactionId", '"tx-A"', 2_000),
        variable_event(100, "channelRequest", escaped_json(CHANNEL_REQUEST), 2_500),
        process_event(101, "ELEMENT_ACTIVATING", 3_000, parent=100, definition=5002),
        variable_event(101, "amount", '"77.70"', 3_500, definition=5002),
        process_event(101, "ELEMENT_COMPLETED", 4_000, parent=100, definition=5002),
        job_event(100, "svc-a", "T1", "CREATED", 4_200),
        job_event(100, "svc-a", "T1", "CREATED", 4_300),  # D2 dup
        process_event(100, "ELEMENT_COMPLETED", 5_000),
    ]
    # C5: variable arrives with empty bpmn BEFORE any carrier of def 6001
    ev += [
        variable_event(200, "batchId", '"B-9"', 6_000, bpmn="", definition=6001),
        process_event(200, "ELEMENT_ACTIVATING", 7_000, bpmn="bulk_processor-tn02", definition=6001),
        variable_event(200, "fileName", '"f.csv"', 7_500, bpmn="bulk_processor-tn02", definition=6001),
    ]
    # transaction request with same-ts D1 duplicate
    ev += [
        process_event(300, "ELEMENT_ACTIVATING", 8_000, bpmn="mpesa_flow-tn03", definition=7001),
        variable_event(300, "transactionId", '"tr-1"', 9_000, bpmn="mpesa_flow-tn03", definition=7001),
        variable_event(300, "transactionId", '"tr-2"', 9_000, bpmn="mpesa_flow-tn03", definition=7001, position=999_999),
        variable_event(300, "transactionState", '"ACCEPTED"', 9_500, bpmn="mpesa_flow-tn03", definition=7001),
    ]
    return ev


def _raw_json(flat: dict) -> str:
    """Inverse of parse_envelope: flat fixture row -> Zeebe 1.x envelope."""
    value: dict = {}
    for src, dst in (
        ("bpmn_process_id", "bpmnProcessId"),
        ("process_instance_key", "processInstanceKey"),
        ("process_definition_key", "processDefinitionKey"),
        ("parent_process_instance_key", "parentProcessInstanceKey"),
        ("bpmn_element_type", "bpmnElementType"),
        ("element_id", "elementId"),
        ("name", "name"),
        ("job_type", "type"),
    ):
        if flat.get(src) is not None:
            value[dst] = flat[src]
    if flat.get("value") is not None:
        # the raw variable value string, exactly as the fixture stored it
        value["value"] = flat["value"]
    env = {
        "partitionId": flat.get("partition_id"),
        "position": flat.get("position"),
        "key": flat.get("key"),
        "timestamp": flat.get("timestamp"),
        "recordType": flat.get("record_type"),
        "valueType": flat.get("value_type"),
        "intent": flat.get("intent"),
        "value": value,
    }
    return json.dumps(env)


def test_multi_hop_matches_batch(spark, tmp_path):
    from ph_ee_nats_importer_rdbms_spark.operators.classify import parse_envelope
    from ph_ee_nats_importer_rdbms_spark.operators.pipeline import run_import_pipeline
    from ph_ee_nats_importer_rdbms_spark.streaming import pipeline as sp

    corpus = _corpus()

    # three file drops -> with maxFilesPerTrigger=1, three micro-batches,
    # so C4/C5 state must survive across batches
    src = tmp_path / "events"
    src.mkdir()
    chunks = [corpus[0:6], corpus[6:12], corpus[12:]]
    for i, chunk in enumerate(chunks):
        (src / f"drop_{i}.jsonl").write_text(
            "\n".join(_raw_json(e) for e in chunk) + "\n"
        )

    paths = sp.run_multi_hop(
        spark, str(src), str(tmp_path / "work"), max_files_per_trigger=1
    )
    got = sp.materialize_tables(spark, paths["changes"])

    # batch reference on the same events — via the raw-JSON parse path too
    raw_df = spark.createDataFrame(
        [(_raw_json(e),) for e in corpus], "value string"
    )
    want = run_import_pipeline(parse_envelope(raw_df))

    # --- transfers: parent 100 carries the child's amount (C4) ---
    t_want = {r["workflow_instance_key"]: r.asDict() for r in want["transfers"].collect()}
    t_got = {
        r["workflow_instance_key"]: json.loads(r["payload"])
        for r in got["transfers"].collect()
    }
    assert set(t_got) == set(t_want) == {100}
    w, g = t_want[100], t_got[100]
    assert float(g["amount"]) == float(w["amount"]) == 77.70
    assert g["status"] == w["status"] == "COMPLETED"
    assert g["transaction_id"] == w["transaction_id"] == "tx-A"
    assert g["direction"] == w["direction"]
    # the child's COMPLETED (ts 4000) re-keys to the parent and wins first-
    # completion (D4); the parent's own COMPLETED at 5000 is then dropped —
    # same as the batch min() and the reference's idempotent transferEnded
    assert g["started_at"] == 1_000 and g["completed_at"] == 4_000
    import pyspark.sql.functions as _F
    w_ms = want["transfers"].select(
        _F.unix_millis("completed_at").alias("ms")
    ).collect()[0]["ms"]
    assert w_ms == g["completed_at"]

    # --- batches: C5 resolution routed instance 200 to BATCH ---
    b_got = {
        r["workflow_instance_key"]: json.loads(r["payload"])
        for r in got["batches"].collect()
    }
    assert b_got[200]["batch_id"] == "B-9"
    assert b_got[200]["request_file"] == "f.csv"

    # --- transaction requests: D1 kept tr-1; INCOMING state applied ---
    tr_got = {
        r["workflow_instance_key"]: json.loads(r["payload"])
        for r in got["transaction_requests"].collect()
    }
    assert tr_got[300]["transaction_id"] == "tr-1"
    assert tr_got[300]["state"] == "ACCEPTED"

    # --- event logs match the batch tables exactly ---
    for name in ("variables", "tasks"):
        wv = {tuple(r) for r in want[name].collect()}
        gv = {tuple(r) for r in got[name].select(*want[name].columns).collect()}
        assert gv == wv, f"{name} mismatch"


def test_multi_hop_rocksdb_state_store(spark, tmp_path):
    """Same 3-hop topology on the RocksDB state-store provider (the
    at-scale backend): cross-batch C4/C5 state must survive in RocksDB and
    produce the identical change log."""
    from ph_ee_nats_importer_rdbms_spark.streaming import pipeline as sp

    corpus = _corpus()
    src = tmp_path / "events"
    src.mkdir()
    chunks = [corpus[0:6], corpus[6:12], corpus[12:]]
    for i, chunk in enumerate(chunks):
        (src / f"drop_{i}.jsonl").write_text(
            "\n".join(_raw_json(e) for e in chunk) + "\n"
        )
    try:
        paths = sp.run_multi_hop(
            spark,
            str(src),
            str(tmp_path / "work"),
            max_files_per_trigger=1,
            state_store="rocksdb",
        )
        got = sp.materialize_tables(spark, paths["changes"])
        t = {
            r["workflow_instance_key"]: json.loads(r["payload"])
            for r in got["transfers"].collect()
        }
        assert set(t) == {100}
        assert t[100]["status"] == "COMPLETED"
        assert float(t[100]["amount"]) == 77.70
        assert t[100]["completed_at"] == 4_000
    finally:
        sp.configure_state_store(spark, "hdfs")  # don't leak into other tests


def test_multi_hop_restart_resumes_state(spark, tmp_path):
    """Process restart between event arrivals (checkpoint resume): a second
    run_multi_hop over the SAME work_dir must (a) not re-emit run-1 changes
    (exactly-once), (b) restore keyed state so run-2 events complete run-1
    instances (C3/D4), dedup against run-1 history (D1), and re-key through
    a parent link learned in run 1 (C4)."""
    from ph_ee_nats_importer_rdbms_spark.operators.classify import parse_envelope
    from ph_ee_nats_importer_rdbms_spark.operators.pipeline import run_import_pipeline
    from ph_ee_nats_importer_rdbms_spark.streaming import pipeline as sp

    batch_a = [
        process_event(100, "ELEMENT_ACTIVATING", 1_000),
        variable_event(100, "transactionId", '"tx-A"', 2_000),
        # child activates in run 1 -> parent link must survive the restart
        process_event(101, "ELEMENT_ACTIVATING", 3_000, parent=100, definition=5002),
    ]
    batch_b = [
        # child variable in run 2 re-keys to parent via the run-1 link (C4)
        variable_event(101, "amount", '"12.34"', 3_500, definition=5002),
        # D1: same (instance, name, ts) as run 1 -> must be suppressed
        variable_event(100, "transactionId", '"tx-DUP"', 2_000, position=888_888),
        # completion in run 2 for the instance started in run 1 (C3)
        process_event(100, "ELEMENT_COMPLETED", 5_000),
    ]

    src = tmp_path / "events"
    src.mkdir()
    work = str(tmp_path / "work")
    (src / "drop_0.jsonl").write_text(
        "\n".join(_raw_json(e) for e in batch_a) + "\n"
    )
    sp.run_multi_hop(spark, str(src), work)

    (src / "drop_1.jsonl").write_text(
        "\n".join(_raw_json(e) for e in batch_b) + "\n"
    )
    paths = sp.run_multi_hop(spark, str(src), work)  # restart, same checkpoints
    got = sp.materialize_tables(spark, paths["changes"])

    t = {
        r["workflow_instance_key"]: json.loads(r["payload"])
        for r in got["transfers"].collect()
    }
    assert set(t) == {100}
    assert t[100]["transaction_id"] == "tx-A"  # D1 held across restart
    assert float(t[100]["amount"]) == 12.34  # C4 link held across restart
    assert t[100]["status"] == "COMPLETED" and t[100]["completed_at"] == 5_000

    # exactly-once: the variables log has no duplicate rows after two runs
    vrows = got["variables"].collect()
    assert len(vrows) == len({tuple(r) for r in vrows})
    names = sorted(
        (r["workflow_instance_key"], r["name"]) for r in vrows
    )
    assert names == [(100, "transactionId"), (101, "amount")]

    # batch replay of A+B agrees with the restarted streaming run
    raw_df = spark.createDataFrame(
        [(_raw_json(e),) for e in batch_a + batch_b], "value string"
    )
    want = run_import_pipeline(parse_envelope(raw_df))
    w = want["transfers"].collect()[0]
    assert w["transaction_id"] == t[100]["transaction_id"]
    assert float(w["amount"]) == float(t[100]["amount"])
    assert w["status"] == t[100]["status"]


@pytest.mark.slow
def test_multi_hop_matches_batch_at_corpus_scale(spark, tmp_path):
    """The fixture-corpus parity test, scaled to the sf0.001 synthetic
    corpus (~11k events, ~3.7k instances): every D1/D2/C2-C5 path at
    corpus density, split across micro-batches so keyed state carries
    thousands of in-flight instances between triggers. The batch fixed
    point is the specification."""
    from ph_ee_nats_importer_rdbms_spark.operators.pipeline import (
        run_import_pipeline,
    )
    from ph_ee_nats_importer_rdbms_spark.plans.queries import zeebe_events_df
    from ph_ee_nats_importer_rdbms_spark.streaming import pipeline as sp
    import pyspark.sql.functions as F

    corpus_df = zeebe_events_df(spark, "/root/testdata/sf0.001")
    flat = [r.asDict() for r in corpus_df.collect()]
    flat.sort(key=lambda e: (e["timestamp"], e["position"]))

    src = tmp_path / "cs_events"
    src.mkdir()
    third = (len(flat) + 2) // 3
    for i in range(3):
        chunk = flat[i * third : (i + 1) * third]
        (src / f"drop_{i}.jsonl").write_text(
            "\n".join(_raw_json(e) for e in chunk) + "\n"
        )

    paths = sp.run_multi_hop(
        spark, str(src), str(tmp_path / "cs_work"), max_files_per_trigger=1
    )
    got = sp.materialize_tables(spark, paths["changes"])
    want = run_import_pipeline(corpus_df)

    # event logs: exact set equality
    for name in ("variables", "tasks"):
        wv = {tuple(r) for r in want[name].collect()}
        gv = {tuple(r) for r in got[name].select(*want[name].columns).collect()}
        assert len(gv) == len(wv) and gv == wv, f"{name} mismatch"

    # entity tables: compare the business fields per instance key
    def batch_snap(df, fields):
        out = {}
        for r in df.collect():
            d = r.asDict()
            out[d["workflow_instance_key"]] = tuple(d.get(f) for f in fields)
        return out

    def stream_snap(rows, fields):
        out = {}
        for r in rows:
            p = json.loads(r["payload"])
            out[p["workflow_instance_key"]] = tuple(p.get(f) for f in fields)
        return out

    t_fields = ("transaction_id", "status", "direction", "batch_id")
    w = batch_snap(want["transfers"], t_fields)
    g = stream_snap(got["transfers"].collect(), t_fields)
    assert set(w) == set(g)
    mismatches = {k for k in w if w[k] != g[k]}
    assert not mismatches, f"{len(mismatches)} transfer mismatches, e.g. {sorted(mismatches)[:3]}"
    # money + lifecycle timestamps compared via epoch-ms
    w_ms = {
        r["workflow_instance_key"]: (
            str(r["amount"]) if r["amount"] is not None else None,
            r["started_ms"],
            r["completed_ms"],
        )
        for r in want["transfers"].select(
            "workflow_instance_key",
            "amount",
            F.unix_millis("started_at").alias("started_ms"),
            F.unix_millis("completed_at").alias("completed_ms"),
        ).collect()
    }
    for r in got["transfers"].collect():
        p = json.loads(r["payload"])
        k = p["workflow_instance_key"]
        amt = p.get("amount")
        amt = f"{amt:.4f}" if amt is not None else None
        assert (amt, p.get("started_at"), p.get("completed_at")) == w_ms[k], k

    tr_fields = ("transaction_id", "state", "direction", "auth_type")
    assert batch_snap(want["transaction_requests"], tr_fields) == stream_snap(
        got["transaction_requests"].collect(), tr_fields
    )
    b_fields = ("batch_id", "request_file", "request_id", "note")
    assert batch_snap(want["batches"], b_fields) == stream_snap(
        got["batches"].collect(), b_fields
    )


def test_resolve_state_ttl_evicts_buffer_and_recreates(spark, tmp_path):
    """C5 buffer eviction (the documented TTL improvement over the
    reference's unbounded TempDocumentStore): a definition key idle past
    the TTL is dropped — its buffered rows are discarded — and a late
    carrier re-creates state from scratch (get-or-create), after which
    resolution works normally again."""
    import time

    from ph_ee_nats_importer_rdbms_spark.streaming import pipeline as sp

    src = tmp_path / "ttl_events"
    src.mkdir()
    work = str(tmp_path / "ttl_work")
    ttl_minutes = 1 / 60  # 1 second

    # availableNow runs must not spin no-data batches waiting on pending
    # timers (see resolve_stage docstring); timers then fire lazily on the
    # next data-carrying batch — the shape this test asserts.
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")

    def run():
        return sp.run_multi_hop(
            spark, str(src), work, state_ttl_minutes=ttl_minutes
        )

    # run 1: gapped row (empty bpmn) for def 6001 -> buffered, not emitted
    (src / "d0.jsonl").write_text(
        _raw_json(variable_event(200, "batchId", '"B-9"', 1_000, bpmn="", definition=6001)) + "\n"
    )
    paths = run()
    resolved = spark.read.schema(sp.FLAT_SCHEMA).parquet(paths["resolved"])
    assert resolved.filter("process_definition_key = 6001").count() == 0

    # run 2 after the TTL: an unrelated key's batch triggers timeout
    # processing -> def 6001's state (with the buffered row) is evicted
    time.sleep(1.5)
    (src / "d1.jsonl").write_text(
        _raw_json(process_event(300, "ELEMENT_ACTIVATING", 2_000, bpmn="mpesa_flow-tn03", definition=7001)) + "\n"
    )
    run()

    # run 3: a carrier for def 6001 re-creates state; a following gapped
    # row resolves off the re-created mapping. The evicted B-9 row must
    # NOT replay.
    (src / "d2.jsonl").write_text(
        _raw_json(process_event(200, "ELEMENT_ACTIVATING", 3_000, bpmn="bulk_processor-tn02", definition=6001))
        + "\n"
        + _raw_json(variable_event(200, "note", '"late"', 3_500, bpmn="", definition=6001))
        + "\n"
    )
    try:
        paths = run()
    finally:
        spark.conf.unset("spark.sql.streaming.noDataMicroBatches.enabled")
    resolved = spark.read.schema(sp.FLAT_SCHEMA).parquet(paths["resolved"])
    rows = sorted(
        (r["timestamp"], r["bpmn_process_id"])
        for r in resolved.filter("process_definition_key = 6001").collect()
    )
    assert rows == [
        (3_000, "bulk_processor-tn02"),
        (3_500, "bulk_processor-tn02"),
    ]


def test_run_deployment_requires_a_source(spark, tmp_path):
    """Misuse guard: neither source_dir nor nats_options is a clear error,
    not an obscure failure deep inside the file source."""
    from ph_ee_nats_importer_rdbms_spark.streaming import pipeline as sp

    with pytest.raises(ValueError, match="ingestion source"):
        sp.run_deployment(
            spark, str(tmp_path / "w"), lambda t: None, lambda u, s: None
        )


def test_run_deployment_end_to_end_jdbc(spark, tmp_path):
    """The one-call deployed topology: file-bridge source -> 3 hops ->
    per-tenant JDBC MERGE/append through a recording executor. Asserts the
    statements a real MySQL would receive, and that a restart with no new
    data replays nothing (checkpointed sink)."""
    from ph_ee_nats_importer_rdbms_spark.streaming import pipeline as sp

    corpus = _corpus()
    src = tmp_path / "dep_events"
    src.mkdir()
    (src / "all.jsonl").write_text("\n".join(_raw_json(e) for e in corpus) + "\n")

    writes: list[tuple[str, str]] = []  # (url, sql) pairs

    def executor(url, statements):
        for sql, batches in statements:
            writes.append((url, sql))

    def resolve_url(tenant):
        return f"jdbc:mysql://db/{tenant}" if tenant else None

    sp.run_deployment(
        spark,
        str(tmp_path / "dep_work"),
        resolve_url,
        executor,
        source_dir=str(src),
        distributed=False,  # in-memory recording executor: driver mode
    )

    urls = {u for u, _ in writes}
    assert any("tn01" in u for u in urls)
    merges = [s for _, s in writes if s.lstrip().upper().startswith("INSERT INTO PH_TRANSFERS")]
    assert merges and all("ON DUPLICATE KEY UPDATE" in s.upper() for s in merges)
    appends = [s for _, s in writes if "ph_variables" in s or "ph_tasks" in s]
    assert appends

    # restart with no new input: checkpoints replay nothing
    n = len(writes)
    sp.run_deployment(
        spark,
        str(tmp_path / "dep_work"),
        resolve_url,
        executor,
        source_dir=str(src),
        distributed=False,
    )
    assert len(writes) == n
