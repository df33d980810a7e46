"""transformWithStateInPandas variant of the C5 resolve stage.

The multi-hop pipeline's stages run on ``applyInPandasWithState`` (one
serialized state blob per key). This module implements the same C5
semantics (TempDocumentStore.java:16-42 buffering, NatsConsumer.java:60-70
replay) on the newer ``transformWithStateInPandas`` API, which models the
state the way the reference actually holds it:

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
