"""transformWithStateInPandas resolve stage (streaming/tws.py).

The processor logic is unit-tested against stub ValueState/ListState (no
broker, no protobuf needed); the full streaming parity run against the
applyInPandasWithState stage requires the ``protobuf`` package (the TWS
worker's state protocol) and skips where it is absent.
"""

from __future__ import annotations

import pandas as pd
import pytest

from tests.test_streaming import _raw_json
from tests.zeebe_fixtures import process_event, variable_event


def _protobuf_available() -> bool:
    from tests.protobuf_compat import ensure_protobuf

    return ensure_protobuf()


class _StubValueState:
    def __init__(self):
        self.v = None

    def exists(self):
        return self.v is not None

    def get(self):
        return self.v

    def update(self, v):
        self.v = v


class _StubListState:
    def __init__(self):
        self.rows: list[tuple] = []

    def exists(self):
        return bool(self.rows)

    def get(self):
        return iter(list(self.rows))

    def appendList(self, rows):
        self.rows.extend(rows)

    def clear(self):
        self.rows = []


def _processor():
    from ph_ee_nats_importer_rdbms_spark.streaming.tws import ResolveProcessor

    p = ResolveProcessor()
    p._resolved = _StubValueState()
    p._buffered = _StubListState()
    return p


def _pdf(events):
    from ph_ee_nats_importer_rdbms_spark.streaming.tws import _COLS

    rows = [tuple(e.get(c) for c in _COLS) for e in events]
    return pd.DataFrame(rows, columns=_COLS)


def _emit(p, events):
    out = list(p.handleInputRows(None, iter([_pdf(events)]), None))
    return pd.concat(out) if out else pd.DataFrame()


def test_processor_buffers_then_replays_across_batches():
    p = _processor()
    # batch 1: two gapped rows -> nothing emitted, buffered in list state
    got = _emit(p, [
        variable_event(200, "batchId", '"B"', 1_000, bpmn="", definition=6001),
        variable_event(200, "note", '"n"', 1_500, bpmn="", definition=6001),
    ])
    assert got.empty and len(p._buffered.rows) == 2
    # batch 2: carrier arrives -> buffer replays resolved, then the carrier
    got = _emit(p, [
        process_event(200, "ELEMENT_ACTIVATING", 2_000,
                      bpmn="bulk_processor-tn02", definition=6001),
    ])
    assert list(got["bpmn_process_id"]) == ["bulk_processor-tn02"] * 3
    assert list(got["timestamp"]) == [1_000, 1_500, 2_000]
    assert not p._buffered.rows and p._resolved.get() == ("bulk_processor-tn02",)
    # batch 3: later gapped row flows straight through off value state
    got = _emit(p, [
        variable_event(200, "x", '"y"', 3_000, bpmn="", definition=6001),
    ])
    assert list(got["bpmn_process_id"]) == ["bulk_processor-tn02"]


def test_processor_same_batch_replay_order():
    p = _processor()
    got = _emit(p, [
        variable_event(1, "a", '"1"', 1_000, bpmn="", definition=5),
        process_event(1, "ELEMENT_ACTIVATING", 2_000, bpmn="P-t", definition=5),
        variable_event(1, "b", '"2"', 3_000, bpmn="", definition=5),
    ])
    # buffered row replays when the carrier lands, then carrier, then tail
    assert list(got["timestamp"]) == [1_000, 2_000, 3_000]
    assert set(got["bpmn_process_id"]) == {"P-t"}


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithStateInPandas worker needs the protobuf package",
)
def test_tws_resolve_matches_applyinpandas_stage(spark, tmp_path):
    from ph_ee_nats_importer_rdbms_spark.streaming.pipeline import (
        configure_state_store,
        read_raw_stream,
        resolve_stage,
    )
    from ph_ee_nats_importer_rdbms_spark.streaming.tws import resolve_stage_tws

    # transformWithStateInPandas needs multiple column families (one per
    # typed state), which only the RocksDB provider supports
    configure_state_store(spark, "rocksdb")

    events = [
        variable_event(200, "batchId", '"B-9"', 1_000, bpmn="", definition=6001),
        process_event(200, "ELEMENT_ACTIVATING", 2_000,
                      bpmn="bulk_processor-tn02", definition=6001),
        variable_event(300, "x", '"1"', 2_500, bpmn="", definition=7001),
        process_event(100, "ELEMENT_ACTIVATING", 3_000),
    ]

    def run(stage_fn, name):
        src = tmp_path / f"src_{name}"
        src.mkdir()
        for i, e in enumerate(events):
            (src / f"d{i}.jsonl").write_text(_raw_json(e) + "\n")
        q = (
            stage_fn(read_raw_stream(spark, str(src), max_files_per_trigger=1))
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
            .start()
        )
        q.awaitTermination(180)
        rows = spark.sql(
            f"SELECT process_instance_key, name, bpmn_process_id, timestamp "
            f"FROM {name}"
        ).collect()
        return sorted(
            (tuple(r) for r in rows),
            key=lambda t: tuple((v is None, v) for v in t),
        )

    try:
        assert run(resolve_stage_tws, "tws_out") == run(resolve_stage, "aip_out")
    finally:
        configure_state_store(spark, "hdfs")  # don't leak into other tests


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithStateInPandas worker needs the protobuf package",
)
def test_tws_entity_stage_matches_applyinpandas_stage(spark, tmp_path):
    """EntityProcessor through a REAL transformWithStateInPandas query
    (typed ValueState + MapState + ListState over RocksDB), split across
    micro-batches, must emit exactly the change rows the
    applyInPandasWithState entity_stage emits."""
    from ph_ee_nats_importer_rdbms_spark.streaming.pipeline import (
        REKEYED_SCHEMA,
        configure_state_store,
        entity_stage,
    )
    from ph_ee_nats_importer_rdbms_spark.streaming.tws import entity_stage_tws

    configure_state_store(spark, "rocksdb")
    cols = [f.name for f in REKEYED_SCHEMA.fields]
    events = [
        {c: e.get(c) for c in cols} | {"effective_key": 42}
        for e in _entity_events()
    ]
    chunks = (events[:2], events[2:4], events[4:])

    def run(stage_fn, name):
        import os
        import shutil

        src = tmp_path / f"esrc_{name}"
        src.mkdir()
        for i, chunk in enumerate(chunks):
            tmp = tmp_path / f"etmp_{name}_{i}"
            spark.createDataFrame(chunk, REKEYED_SCHEMA).coalesce(1).write.parquet(str(tmp))
            part = next(
                p
                for p in tmp.iterdir()
                if p.name.endswith(".parquet") and not p.name.startswith(".")
            )
            dst = src / f"d{i}.parquet"
            shutil.copy(part, dst)
            # strictly increasing mtimes -> deterministic batch order
            os.utime(dst, (1_000_000_000 + i, 1_000_000_000 + i))
        stream = (
            spark.readStream.schema(REKEYED_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = (
            stage_fn(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / f"eck_{name}"))
            .start()
        )
        q.awaitTermination(180)
        rows = spark.sql(
            f"SELECT kind, workflow_instance_key, tenant, payload FROM {name}"
        ).collect()
        return sorted(
            (tuple(r) for r in rows),
            key=lambda t: tuple((v is None, v) for v in t),
        )

    try:
        got = run(entity_stage_tws, "tws_ent")
        want = run(entity_stage, "aip_ent")
    finally:
        configure_state_store(spark, "hdfs")
    assert got == want
    # sanity: the parity set includes the D1/D2-filtered inserts and the
    # final COMPLETED transfer snapshot with the instance's tenant
    import json as _json

    kinds = [t[0] for t in got]
    assert kinds.count("variable") == 1 and kinds.count("task") == 1
    snaps = [_json.loads(t[3]) for t in got if t[0] == "transfer"]
    assert snaps and all(t[2] == "tn1" for t in got if t[0] == "transfer")
    assert any(s.get("status") == "COMPLETED" for s in snaps)


class _StubMapState:
    def __init__(self):
        self.m: dict[tuple, tuple] = {}

    def exists(self):
        return bool(self.m)

    def iterator(self):
        return iter(list(self.m.items()))

    def updateValue(self, k, v):
        self.m[tuple(k)] = tuple(v)

    def containsKey(self, k):
        return tuple(k) in self.m

    def getValue(self, k):
        return self.m[tuple(k)]


def _entity_processor():
    from ph_ee_nats_importer_rdbms_spark.streaming.tws import EntityProcessor

    p = EntityProcessor()
    p._meta = _StubValueState()
    p._var_ts = _StubMapState()
    p._tasks = _StubListState()
    return p


def _entity_events():
    base = dict(
        process_type="TRANSFER",
        process_direction="INCOMING",
        tenant="tn1",
        process_definition_key=500,
        process_instance_key=42,
        child_start=False,
    )
    return [
        dict(base, value_type="PROCESS_INSTANCE", bpmn_element_type="PROCESS",
             intent="ELEMENT_ACTIVATING", timestamp=1_000, position=1,
             name=None, value=None, job_type=None, element_id=None,
             record_type="EVENT"),
        dict(base, value_type="VARIABLE", bpmn_element_type=None,
             intent="CREATED", timestamp=2_000, position=2,
             name="amount", value='"12.5"', job_type=None, element_id=None,
             record_type="EVENT"),
        # D1 duplicate: same name, same ts -> dropped
        dict(base, value_type="VARIABLE", bpmn_element_type=None,
             intent="CREATED", timestamp=2_000, position=3,
             name="amount", value='"99.9"', job_type=None, element_id=None,
             record_type="EVENT"),
        dict(base, value_type="JOB", bpmn_element_type=None,
             intent="CREATED", timestamp=3_000, position=4,
             name=None, value=None, job_type="svc", element_id="T1",
             record_type="EVENT"),
        # D2 duplicate task
        dict(base, value_type="JOB", bpmn_element_type=None,
             intent="CREATED", timestamp=3_500, position=5,
             name=None, value=None, job_type="svc", element_id="T1",
             record_type="EVENT"),
        dict(base, value_type="PROCESS_INSTANCE", bpmn_element_type="PROCESS",
             intent="ELEMENT_COMPLETED", timestamp=9_000, position=6,
             name=None, value=None, job_type=None, element_id=None,
             record_type="EVENT"),
    ]


def _run_entity(p, events):
    import pandas as pd

    cols = sorted({k for e in events for k in e})
    pdf = pd.DataFrame([{c: e.get(c) for c in cols} for e in events])
    out = list(p.handleInputRows((42,), iter([pdf]), None))
    return pd.concat(out) if out else pd.DataFrame(columns=["kind"])


def test_tws_entity_fold_matches_pure_reducer_across_batch_splits():
    """Splitting the same event sequence across micro-batches must produce
    the same final snapshot as one pass of the pure reducer — i.e. the
    typed-state round-trip (ValueState + MapState + ListState) is lossless."""
    import json

    from ph_ee_nats_importer_rdbms_spark.streaming import state as sm

    events = _entity_events()

    # reference: one pass of the pure reducer
    st_ref, rows_ref = sm.entity_step(sm.EntityState(), events)
    snap_ref = sm.entity_snapshot(42, st_ref)

    # TWS processor fed the same events split into three batches
    p = _entity_processor()
    outs = []
    for chunk in (events[:2], events[2:4], events[4:]):
        outs.append(_run_entity(p, chunk))

    import pandas as pd

    all_out = pd.concat(outs, ignore_index=True)
    inserts = all_out[all_out["kind"].isin(["variable", "task"])]
    # D1 dropped the duplicate amount, D2 the duplicate task
    assert list(inserts["kind"]) == ["variable", "task"]
    assert len(rows_ref) == 2

    # final snapshot emitted in the last batch == pure-reducer snapshot
    last_snap = json.loads(outs[-1][outs[-1]["kind"] == "transfer"].iloc[-1]["payload"])
    snap_ref = {k: v for k, v in snap_ref.items() if k != "kind"}
    for k in ("workflow_instance_key", "amount", "status", "direction"):
        assert last_snap[k] == snap_ref[k], k
    assert last_snap["status"] == "COMPLETED"
    assert last_snap["amount"] == 12.5
    # state persisted through the typed handles
    assert p._var_ts.m == {("amount",): (2_000,)}
    assert p._tasks.rows == [("T1", "CREATED")]


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithStateInPandas worker needs the protobuf package",
)
def test_tws_full_topology_end_to_end_jdbc(spark, tmp_path):
    """The COMPLETE deployed topology on the TWS engine (VERDICT r6 task
    #6): file-bridge source -> resolve -> route/rekey -> entity fold (all
    three hops on transformWithStateInPandas over RocksDB) -> per-tenant
    JDBC through a recording executor. Twin of
    test_streaming.test_run_deployment_end_to_end_jdbc: asserts the same
    MERGE/append statement classes, that the change set equals the
    applyInPandasWithState engine's run bit-for-bit, and that a
    checkpointed restart with no new data replays nothing."""
    from ph_ee_nats_importer_rdbms_spark.streaming import pipeline as sp
    from tests.test_streaming import _corpus

    corpus = _corpus()
    src = tmp_path / "tws_events"
    src.mkdir()
    (src / "all.jsonl").write_text(
        "\n".join(_raw_json(e) for e in corpus) + "\n"
    )

    writes: list[tuple[str, str]] = []

    def executor(url, statements):
        for sql, batches in statements:
            writes.append((url, sql))

    def resolve_url(tenant):
        return f"jdbc:mysql://db/{tenant}" if tenant else None

    try:
        sp.run_deployment(
            spark,
            str(tmp_path / "tws_work"),
            resolve_url,
            executor,
            source_dir=str(src),
            distributed=False,  # in-memory recording executor: driver mode
            engine="tws",
        )
    finally:
        sp.configure_state_store(spark, "hdfs")  # don't leak the provider

    urls = {u for u, _ in writes}
    assert any("tn01" in u for u in urls)
    merges = [
        s
        for _, s in writes
        if s.lstrip().upper().startswith("INSERT INTO PH_TRANSFERS")
    ]
    assert merges and all(
        "ON DUPLICATE KEY UPDATE" in s.upper() for s in merges
    )
    appends = [s for _, s in writes if "ph_variables" in s or "ph_tasks" in s]
    assert appends

    # the TWS engine's change log equals the applyInPandasWithState
    # engine's, row for row (the cross-engine parity contract, now at
    # full-topology scope rather than per stage)
    aip_src = tmp_path / "aip_events"
    aip_src.mkdir()
    (aip_src / "all.jsonl").write_text(
        "\n".join(_raw_json(e) for e in corpus) + "\n"
    )
    aip_paths = sp.run_multi_hop(
        spark, str(aip_src), str(tmp_path / "aip_work")
    )

    def change_set(path):
        rows = (
            spark.read.schema(sp.CHANGES_SCHEMA).parquet(path).collect()
        )
        return sorted(
            (tuple(r) for r in rows),
            key=lambda t: tuple((v is None, v) for v in t),
        )

    tws_changes = str(tmp_path / "tws_work" / "changes")
    assert change_set(tws_changes) == change_set(aip_paths["changes"])

    # restart with no new input: every hop + the sink are checkpointed,
    # nothing replays
    n = len(writes)
    try:
        sp.run_deployment(
            spark,
            str(tmp_path / "tws_work"),
            resolve_url,
            executor,
            source_dir=str(src),
            distributed=False,
            engine="tws",
        )
    finally:
        sp.configure_state_store(spark, "hdfs")
    assert len(writes) == n
