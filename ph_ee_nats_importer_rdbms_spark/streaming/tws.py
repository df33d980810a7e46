"""transformWithStateInPandas variants of ALL THREE stateful hops
(C5 resolve, C4 rekey, C1-C3/C6/D1-D4 entity fold) — a complete
alternative engine for the multi-hop pipeline, selected with
``run_multi_hop(..., engine="tws")`` / ``run_deployment(...,
engine="tws")``.

The default stages run on ``applyInPandasWithState`` (one serialized
state blob per key). This module implements the same semantics (e.g. C5:
TempDocumentStore.java:16-42 buffering, NatsConsumer.java:60-70 replay)
on the newer ``transformWithStateInPandas`` API, which models the state
the way the reference actually holds it:

- a ``ValueState`` for the learned definition->bpmnProcessId mapping
  (TempDocumentStore.java:17 ``workflowKeyBpmnProcessIdMap`` entry), and
- a ``ListState`` of buffered event rows (``:16`` ``documentStore``),
  appended row-typed instead of re-serializing a JSON blob per batch — at
  scale a hot definition key's buffer updates cost O(new rows), not
  O(buffer size).

Parity between the two implementations is pinned by
tests/test_tws_resolve.py; pick per deployment. NOTE: the TWS Python
worker needs the ``protobuf`` package (its state API speaks protobuf to
the JVM); environments without it — including this build container — can
only run the applyInPandasWithState stages, so the end-to-end parity test
skips there and the processor logic is unit-tested against stub states.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import StructType

from ph_ee_nats_importer_rdbms_spark.operators.classify import DROPPED_VALUE_TYPES
from ph_ee_nats_importer_rdbms_spark.schemas import FLAT_EVENT_SCHEMA

_RESOLVED_SCHEMA = "resolved_bpmn string"
_COLS = [f.name for f in FLAT_EVENT_SCHEMA.fields]
_BPMN_IDX = _COLS.index("bpmn_process_id")


class ResolveProcessor(StatefulProcessor):
    """Per-definition-key C5 resolution, arrival order = (timestamp,
    position) within each micro-batch (the NATS log order, SURVEY §3)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._resolved = handle.getValueState("resolved", _RESOLVED_SCHEMA)
        self._buffered = handle.getListState("buffered", FLAT_EVENT_SCHEMA)

    def handleInputRows(
        self, key, rows, timerValues
    ) -> Iterator[pd.DataFrame]:
        resolved = (
            self._resolved.get()[0] if self._resolved.exists() else None
        )
        out: list[tuple] = []
        pending: list[tuple] = []
        for pdf in rows:
            pdf = pdf.sort_values(["timestamp", "position"])
            for row in pdf.itertuples(index=False):
                t = tuple(row)
                bpmn = t[_BPMN_IDX]
                if bpmn:
                    if resolved is None:
                        resolved = bpmn
                        self._resolved.update((resolved,))
                        # replay: first the cross-batch buffer, then any
                        # rows buffered earlier in THIS batch
                        if self._buffered.exists():
                            for buf in self._buffered.get():
                                b = list(buf)
                                b[_BPMN_IDX] = resolved
                                out.append(tuple(b))
                            self._buffered.clear()
                        for b in pending:
                            b = list(b)
                            b[_BPMN_IDX] = resolved
                            out.append(tuple(b))
                        pending = []
                    out.append(t)
                elif resolved is not None:
                    b = list(t)
                    b[_BPMN_IDX] = resolved
                    out.append(tuple(b))
                else:
                    pending.append(t)
        if pending:
            self._buffered.appendList(pending)
        if out:
            yield pd.DataFrame(out, columns=_COLS)

    def close(self) -> None:
        pass


def resolve_stage_tws(
    events: DataFrame, output_schema: StructType = FLAT_EVENT_SCHEMA
) -> DataFrame:
    """Drop-in replacement for streaming/pipeline.resolve_stage built on
    transformWithStateInPandas (same F1-F3 pre-filters, same output)."""
    filtered = events.filter(
        ~F.col("value_type").isin(*DROPPED_VALUE_TYPES)
    ).filter(
        ~(
            (F.col("bpmn_process_id").isNull() | (F.col("bpmn_process_id") == ""))
            & F.col("process_definition_key").isNull()
        )
    )
    return filtered.groupBy("process_definition_key").transformWithStateInPandas(
        statefulProcessor=ResolveProcessor(),
        outputStructType=output_schema,
        outputMode="append",
        timeMode="none",
    )


def _clean_events(rows: Iterator[pd.DataFrame]) -> list[dict]:
    """Arrow batches -> plain-python event dicts in (timestamp, position)
    arrival order (NaN -> None, numpy scalars unboxed) — the shape the
    pure reducers in streaming/state.py take."""
    events: list[dict] = []
    for pdf in rows:
        for rec in pdf.to_dict("records"):
            events.append(
                {
                    k: (
                        None
                        if v is None or (isinstance(v, float) and pd.isna(v))
                        else (v.item() if hasattr(v, "item") else v)
                    )
                    for k, v in rec.items()
                }
            )
    events.sort(key=lambda e: (e["timestamp"], e["position"]))
    return events


# ---------------------------------------------------------------------------
# C4 call-activity re-key on transformWithStateInPandas
# ---------------------------------------------------------------------------


class RekeyProcessor(StatefulProcessor):
    """Per-instance call-activity link (C4) on a single typed ValueState —
    the reference's inflightCallActivities map entry
    (RecordParser.java:75). A thin adapter around the SAME pure reducer
    the applyInPandasWithState stage uses (streaming/state.rekey_step),
    so the two implementations cannot drift; only the state plumbing
    differs."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._parent = handle.getValueState("parent", "parent_key long")

    def handleInputRows(
        self, key, rows, timerValues
    ) -> Iterator[pd.DataFrame]:
        from ph_ee_nats_importer_rdbms_spark.streaming import state as sm
        from ph_ee_nats_importer_rdbms_spark.streaming.pipeline import (
            REKEYED_SCHEMA,
        )

        st = sm.RekeyState(
            parent_key=self._parent.get()[0] if self._parent.exists() else None
        )
        st, out = sm.rekey_step(st, _clean_events(rows))
        if st.parent_key is None:
            self._parent.clear()
        else:
            self._parent.update((st.parent_key,))
        if out:
            yield pd.DataFrame(
                out, columns=[f.name for f in REKEYED_SCHEMA.fields]
            )

    def close(self) -> None:
        pass


def rekey_stage_tws(routed: DataFrame) -> DataFrame:
    """Drop-in replacement for streaming/pipeline.rekey_stage on
    transformWithStateInPandas (same input, same REKEYED_SCHEMA
    output)."""
    from ph_ee_nats_importer_rdbms_spark.streaming.pipeline import (
        REKEYED_SCHEMA,
    )

    return routed.groupBy("process_instance_key").transformWithStateInPandas(
        statefulProcessor=RekeyProcessor(),
        outputStructType=REKEYED_SCHEMA,
        outputMode="append",
        timeMode="none",
    )


# ---------------------------------------------------------------------------
# Entity fold (C1-C3/C6/D1-D4) on transformWithStateInPandas
# ---------------------------------------------------------------------------

#: Typed state layout — modeled the way the reference holds it:
#: - meta ValueState     = the inflight entity row + lifecycle flags
#:   (InflightTransferManager.java:19 map entry + started/completed guards)
#: - var_ts MapState     = per-name max timestamp (the D1 dedup lookup the
#:   reference does against ph_variables, RecordParser.java:133-145) —
#:   updates cost O(names touched this batch), not O(all names ever seen)
#: - tasks ListState     = (element_id, intent) pairs already inserted
#:   (the D2 existence check, RecordParser.java:233-245)
_META_SCHEMA = (
    "entity_type string, started boolean, completed boolean, seq long,"
    " entity_json string, tenant string"
)
_VAR_TS_KEY_SCHEMA = "name string"
_VAR_TS_VALUE_SCHEMA = "max_ts long"
_TASK_SIG_SCHEMA = "element_id string, intent string"

_CHANGES_COLS = ["kind", "workflow_instance_key", "tenant", "payload"]


class EntityProcessor(StatefulProcessor):
    """Per-effective-key entity state machine on the typed-state API.

    A thin adapter around the SAME pure-Python reducer the
    applyInPandasWithState stage uses (streaming/state.entity_step), so the
    two implementations cannot drift; only the state plumbing differs.
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._meta = handle.getValueState("meta", _META_SCHEMA)
        self._var_ts = handle.getMapState(
            "var_ts", _VAR_TS_KEY_SCHEMA, _VAR_TS_VALUE_SCHEMA
        )
        self._tasks = handle.getListState("tasks", _TASK_SIG_SCHEMA)

    def _load(self):
        import json as _json

        from ph_ee_nats_importer_rdbms_spark.streaming import state as sm

        st = sm.EntityState()
        if self._meta.exists():
            etype, started, completed, seq, entity_json, tenant = self._meta.get()
            st.entity_type = etype
            st.started = bool(started)
            st.completed = bool(completed)
            st.seq = int(seq)
            st.entity = _json.loads(entity_json) if entity_json else {}
            st.tenant = tenant
        if self._var_ts.exists():
            for (name,), (ts,) in self._var_ts.iterator():
                st.var_max_ts[name] = ts
        if self._tasks.exists():
            st.tasks_seen = [list(sig) for sig in self._tasks.get()]
        return st

    def _store(self, st, prior_var_ts, prior_n_tasks) -> None:
        import json as _json

        self._meta.update(
            (
                st.entity_type,
                st.started,
                st.completed,
                st.seq,
                _json.dumps(st.entity),
                st.tenant,
            )
        )
        for name, ts in st.var_max_ts.items():
            if prior_var_ts.get(name) != ts:
                self._var_ts.updateValue((name,), (ts,))
        new_sigs = st.tasks_seen[prior_n_tasks:]
        if new_sigs:
            self._tasks.appendList([tuple(sig) for sig in new_sigs])

    def handleInputRows(
        self, key, rows, timerValues
    ) -> Iterator[pd.DataFrame]:
        import json as _json

        from ph_ee_nats_importer_rdbms_spark.streaming import state as sm

        st = self._load()
        prior_var_ts = dict(st.var_max_ts)
        prior_n_tasks = len(st.tasks_seen)

        events = _clean_events(rows)
        # tenant: first non-empty in GLOBAL time order (mirrors entity_stage
        # exactly), sticky in state so a later batch with only null-tenant
        # events keeps routing to the instance's tenant DB
        st.tenant = st.tenant or next(
            (e.get("tenant") for e in events if e.get("tenant")), None
        )
        tenant = st.tenant

        st, out_rows = sm.entity_step(st, events)
        st.seq += 1
        out = [
            {
                "kind": r.pop("kind"),
                "workflow_instance_key": r.get("workflow_instance_key"),
                "tenant": tenant,
                "payload": _json.dumps(r),
            }
            for r in out_rows
        ]
        snap = sm.entity_snapshot(int(key[0]), st)
        if snap is not None:
            out.append(
                {
                    "kind": snap.pop("kind"),
                    "workflow_instance_key": snap["workflow_instance_key"],
                    "tenant": tenant,
                    "payload": _json.dumps(snap),
                }
            )
        self._store(st, prior_var_ts, prior_n_tasks)
        if out:
            yield pd.DataFrame(out, columns=_CHANGES_COLS)

    def close(self) -> None:
        pass


def entity_stage_tws(rekeyed: DataFrame) -> DataFrame:
    """Drop-in replacement for streaming/pipeline.entity_stage on
    transformWithStateInPandas (same input, same CHANGES_SCHEMA output)."""
    from ph_ee_nats_importer_rdbms_spark.streaming.pipeline import CHANGES_SCHEMA

    return rekeyed.groupBy("effective_key").transformWithStateInPandas(
        statefulProcessor=EntityProcessor(),
        outputStructType=CHANGES_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
