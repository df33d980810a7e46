"""Structured Streaming wiring: stateful stage wrappers + multi-hop
topology (see package docstring for the stage map).

Each stage keys on a different column, and chaining arbitrary stateful
operators inside one streaming query is not supported — so the pipeline is
a standard multi-hop (bronze→silver→gold) DAG: every hop is its own
checkpointed streaming query writing parquet, giving per-hop exactly-once
and independent scaling. With ``availableNow`` triggers the same topology
runs as an incremental batch (used by the tests); in production the hops
run continuously.

Scale notes: state lives in the Spark state store (RocksDB provider on a
real cluster — set ``spark.sql.streaming.stateStore.providerClass``), hash
partitioned by the stage key across executors; the Python reducers see one
key group at a time. The reference holds all of this in single-JVM maps —
the streaming port is what makes the same semantics horizontally
shardable.
"""

from __future__ import annotations

import json
import os
import time
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StringType, StructField, StructType

from ph_ee_nats_importer_rdbms_spark import schemas
from ph_ee_nats_importer_rdbms_spark.operators.classify import (
    DROPPED_VALUE_TYPES,
    parse_envelope,
    with_routing,
)
from ph_ee_nats_importer_rdbms_spark.streaming import state as sm

# Hop schemas and the per-group row helpers define replay SEMANTICS, so
# they live in batch_replay.py (fingerprinted by the stream staging
# domains) and are re-exported here for the wrappers and their callers —
# this module is wrapper/engine code whose edits must not invalidate
# staged replay artifacts (VERDICT r13 task #3).
from ph_ee_nats_importer_rdbms_spark.streaming.batch_replay import (  # noqa: F401
    CHANGES_SCHEMA,
    FLAT_SCHEMA,
    REKEYED_SCHEMA,
    ROUTED_SCHEMA,
    _concat,
    _event_sort_key,
    _records,
)

_STATE_SCHEMA = StructType([StructField("blob", StringType(), True)])


def _sorted_events(pdf_iter: Iterator[pd.DataFrame]) -> list[dict]:
    # sort the records, not the frame: the many-key hops see ~20-row
    # groups, where pandas lexsort machinery costs more than converting
    # and sorting the dicts directly (r13)
    records = _records(_concat(pdf_iter))
    records.sort(key=_event_sort_key)
    return records


def _columns(schema: StructType) -> list[str]:
    return [f.name for f in schema.fields]


# ---------------------------------------------------------------------------
# Stage wrappers
# ---------------------------------------------------------------------------


def _resolve_batch(
    resolved: str | None, buffered: list[dict], pdf: pd.DataFrame
) -> tuple[str | None, list[dict], pd.DataFrame]:
    """One micro-batch of the C5 resolve state machine, vectorized — the
    column-op replay of :func:`state.resolve_step` (r13, guide §1.2: this
    hop moves EVERY envelope through Python; the dict-per-event path cost
    ~44s per sf0.1 replay build). The per-key semantics are narrow enough
    for column ops: ``resolved`` is SET-ONCE (the first truthy bpmn in
    stream order), every falsy-bpmn event is emitted with the resolved
    value if known by its time (buffered rows flush in arrival order the
    moment it becomes known), and with no resolution the whole batch
    buffers. Output rows, order, and state are identical to
    resolve_step's — pinned against randomized multi-batch replays in
    tests/test_round13_opts.py."""
    cols = _columns(FLAT_SCHEMA)
    pdf = pdf.sort_values(
        ["timestamp", "position"], kind="mergesort", ignore_index=True
    )
    bp = pdf["bpmn_process_id"]
    known = bp.notna() & (bp != "")
    if resolved is None and bool(known.any()):
        resolved = bp.iat[int(known.to_numpy().argmax())]
    if resolved is not None:
        if not bool(known.all()):
            pdf["bpmn_process_id"] = bp.where(known, resolved)
        out = pdf[cols]
        if buffered:
            for r in buffered:
                r["bpmn_process_id"] = resolved
            out = pd.concat(
                [pd.DataFrame(buffered, columns=cols), out],
                ignore_index=True,
            )
            buffered = []
    else:
        buffered = buffered + _records(pdf)
        out = pd.DataFrame([], columns=cols)
    return resolved, buffered, out


def _rekey_batch(
    parent0: int | None, pdf: pd.DataFrame
) -> tuple[int | None, pd.DataFrame]:
    """One micro-batch of the C4 re-key state machine. Fast path (r13,
    guide §1.2): with no live call-activity link, an instance's events
    only ever re-key when one of THIS batch's events registers a link
    (PROCESS ELEMENT_ACTIVATING with parent > 0 — rekey_step's only
    state write). Absent that, every event maps to itself:
    effective_key = own instance key, child_start = false, state stays
    empty — pure column ops, no per-event dict replay, no sort (rows
    are independent). Only instances that ARE call-activity children
    take the dict path. Parity pinned against randomized replays in
    tests/test_round13_opts.py."""
    cols = _columns(REKEYED_SCHEMA)
    if parent0 is None:
        # cheapest discriminator first: a link needs a POSITIVE parent key
        # somewhere in the batch — most instances are not call-activity
        # children, so one numpy compare settles the common case without
        # building the 3-way string mask
        ppik = pdf["parent_process_instance_key"]
        arr = ppik.to_numpy()
        if arr.dtype == object:
            arr = pd.to_numeric(ppik, errors="coerce").to_numpy()
        pos = arr > 0
        links_possible = bool(pos.any())
        if links_possible:
            links = (
                (pdf["value_type"] == "PROCESS_INSTANCE")
                & (pdf["bpmn_element_type"] == "PROCESS")
                & (pdf["intent"] == "ELEMENT_ACTIVATING")
                & pos
            )
            links_possible = bool(links.any())
        if not links_possible:
            if list(pdf.columns) == cols[:-2]:
                # input arrives in ROUTED order and REKEYED appends the
                # two new columns at the end: one shallow copy instead of
                # assign+reorder (2.5x on the ~1ms per-group fast path)
                out = pdf.copy(deep=False)
                out["effective_key"] = out["process_instance_key"]
                out["child_start"] = False
            else:
                out = pdf.assign(
                    effective_key=pdf["process_instance_key"],
                    child_start=False,
                )[cols]
            return None, out
    records = _records(pdf)
    records.sort(key=_event_sort_key)
    st = sm.RekeyState(parent_key=parent0)
    st, out = sm.rekey_step(st, records)
    return st.parent_key, pd.DataFrame(out, columns=cols)


def _ttl(state_ttl_minutes: float | None) -> tuple[int | None, GroupStateTimeout]:
    ttl_ms = int(state_ttl_minutes * 60_000) if state_ttl_minutes else None
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return ttl_ms, timeout


def resolve_stage(
    events: DataFrame, state_ttl_minutes: float | None = None
) -> DataFrame:
    """C5: resolve empty bpmnProcessIds through per-definition-key state.

    ``state_ttl_minutes`` is a documented IMPROVEMENT over the reference,
    whose definition map and buffer never evict (TempDocumentStore.java:16-17
    — an unresolvable definition key accumulates buffered rows forever).
    With a TTL, a definition key idle longer than the window is dropped:
    its resolved mapping re-learns from the next carrier event (get-or-
    create, NatsConsumer.java:60-70), and any still-unresolved buffered rows
    are discarded — the same loss the reference suffers on restart, but at
    a bounded, chosen horizon instead of OOM. Default None = parity.

    Operational note (all TTL'd stages): with ``availableNow`` triggers,
    set ``spark.sql.streaming.noDataMicroBatches.enabled=false`` — a
    pending processing-time timer otherwise keeps scheduling no-data
    batches whose batch timestamp never crosses the timer, spinning the
    run; eviction then happens lazily on the next data-carrying batch.
    Continuous triggers (production) need no special handling."""
    cols = _columns(FLAT_SCHEMA)
    ttl_ms, timeout = _ttl(state_ttl_minutes)

    def fn(key, pdf_iter, state: GroupState):
        if ttl_ms is not None and state.hasTimedOut:
            state.remove()
            yield pd.DataFrame([], columns=cols)
            return
        if state.exists:
            d = json.loads(state.get[0])
            resolved, buffered = d["resolved_bpmn"], d["buffered"]
        else:
            resolved, buffered = None, []
        resolved, buffered, out = _resolve_batch(
            resolved, buffered, _concat(pdf_iter)
        )
        state.update(
            (json.dumps({"resolved_bpmn": resolved, "buffered": buffered}),)
        )
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield out

    filtered = events.filter(
        ~F.col("value_type").isin(*DROPPED_VALUE_TYPES)
    ).filter(
        ~(
            (F.col("bpmn_process_id").isNull() | (F.col("bpmn_process_id") == ""))
            & F.col("process_definition_key").isNull()
        )
    )
    return filtered.groupBy("process_definition_key").applyInPandasWithState(
        fn, FLAT_SCHEMA, _STATE_SCHEMA, "append", timeout
    )


def rekey_stage(
    routed: DataFrame, state_ttl_minutes: float | None = None
) -> DataFrame:
    """C4: add effective_key via per-instance call-activity link state.

    ``state_ttl_minutes``: optional eviction for idle call-activity links
    (the reference's inflightCallActivities map is unbounded,
    RecordParser.java:75). An evicted link means a later child event keys
    to itself instead of the parent — identical to the reference after a
    restart; a fresh ELEMENT_ACTIVATING re-creates the link (get-or-create,
    InflightTransferManager.java:56-70). Default None = parity."""
    cols = _columns(REKEYED_SCHEMA)
    ttl_ms, timeout = _ttl(state_ttl_minutes)

    def fn(key, pdf_iter, state: GroupState):
        if ttl_ms is not None and state.hasTimedOut:
            state.remove()
            yield pd.DataFrame([], columns=cols)
            return
        parent0 = (
            json.loads(state.get[0])["parent_key"] if state.exists else None
        )
        parent, out = _rekey_batch(parent0, _concat(pdf_iter))
        state.update((json.dumps({"parent_key": parent}),))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield out

    return routed.groupBy("process_instance_key").applyInPandasWithState(
        fn, REKEYED_SCHEMA, _STATE_SCHEMA, "append", timeout
    )


def entity_stage(rekeyed: DataFrame, state_ttl_minutes: float | None = None) -> DataFrame:
    """C1-C3/C6/D1-D4: per-effective-key entity state machine emitting
    variable/task inserts + entity upsert snapshots.

    ``state_ttl_minutes`` is a documented IMPROVEMENT over the reference,
    whose in-JVM maps never evict (InflightTransferManager.java:19 et al. —
    they grow until OOM). With a TTL, instances idle longer than the window
    are dropped from the state store; their rows are already durable in the
    sink, and a late event for an evicted instance re-creates state exactly
    like the reference's get-or-create-after-restart path
    (InflightTransferManager.java:56-70). Default None = reference parity.
    """
    cols = _columns(CHANGES_SCHEMA)
    ttl_ms, timeout = _ttl(state_ttl_minutes)

    def fn(key, pdf_iter, state: GroupState):
        if ttl_ms is not None and state.hasTimedOut:
            state.remove()
            yield pd.DataFrame([], columns=cols)
            return
        st = sm.EntityState.from_json(state.get[0]) if state.exists else sm.EntityState()
        events = _sorted_events(pdf_iter)
        # first tenant in time order, sticky across batches: a later batch
        # with only null-tenant events keeps routing to the instance's DB
        st.tenant = st.tenant or next(
            (e.get("tenant") for e in events if e.get("tenant")), None
        )
        tenant = st.tenant
        st, rows = sm.entity_step(st, events)
        st.seq += 1
        out = [
            {
                "kind": r.pop("kind"),
                "workflow_instance_key": r.get("workflow_instance_key"),
                "tenant": tenant,
                "payload": json.dumps(r),
            }
            for r in rows
        ]
        snap = sm.entity_snapshot(int(key[0]), st)
        if snap is not None:
            out.append(
                {
                    "kind": snap.pop("kind"),
                    "workflow_instance_key": snap["workflow_instance_key"],
                    "tenant": tenant,
                    "payload": json.dumps(snap),
                }
            )
        state.update((st.to_json(),))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(out, columns=cols)

    return rekeyed.groupBy("effective_key").applyInPandasWithState(
        fn, CHANGES_SCHEMA, _STATE_SCHEMA, "append", timeout
    )


# ---------------------------------------------------------------------------
# Multi-hop topology
# ---------------------------------------------------------------------------


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def configure_state_store(spark: SparkSession, provider: str = "rocksdb") -> None:
    """Select the state-store backend for subsequently started queries.

    ``rocksdb`` is the at-scale choice: state lives off-heap/on-disk per
    executor instead of in the JVM heap (the reference's unbounded in-heap
    maps are exactly what this replaces), and changelog checkpointing
    uploads per-batch deltas rather than full snapshots, so checkpoint cost
    is O(changed keys) — the difference between a 10-minute and a
    sub-second commit once entity state reaches 100 TB-scale cardinality.
    ``hdfs`` (Spark's default in-memory provider) suits tests/small state.
    """
    if provider == "rocksdb":
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
        spark.conf.set(
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
            "true",
        )
    elif provider == "hdfs":
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    else:
        raise ValueError(f"unknown state store provider: {provider}")


def read_raw_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int = 64
) -> DataFrame:
    """Raw Zeebe envelope JSON strings from a file-drop directory — the
    NATS-bridge ingestion pattern (sources/nats.py writes this layout).
    ``max_files_per_trigger`` bounds micro-batch size (tests set 1 to force
    cross-batch state handoff)."""
    return (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(source_dir)
        .transform(parse_envelope)
    )


def read_raw_nats_stream(spark: SparkSession, **options: str) -> DataFrame:
    """Raw Zeebe envelope stream straight off NATS JetStream via the native
    ``format("nats")`` source (sources/nats_source.py) — no file bridge.
    Options pass through (``servers``, ``subject``, ``stream``,
    ``max_rows_per_trigger``, or ``transport=file``+``path`` for captured
    replays). Interchangeable with read_raw_stream: both yield the parsed
    flat event relation."""
    from ph_ee_nats_importer_rdbms_spark.sources.nats_source import (
        register_nats_source,
    )

    register_nats_source(spark)
    reader = spark.readStream.format("nats")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load().transform(parse_envelope)


def run_multi_hop(
    spark: SparkSession,
    source_dir: str,
    work_dir: str,
    registry: DataFrame | None = None,
    available_now: bool = True,
    max_files_per_trigger: int = 64,
    state_store: str | None = None,
    events: DataFrame | None = None,
    state_ttl_minutes: float | None = None,
    engine: str = "applyinpandas",
    hop_timings: dict | None = None,
) -> dict[str, str]:
    """Run the 3-hop pipeline over ``source_dir``; returns output paths.

    Hops (each checkpointed, restart-safe, exactly-once into parquet):
      resolved/  flat events after F1-F3 + C5
      rekeyed/   + routing (F5/F6) + effective_key (C4)
      changes/   typed change rows (variable/task inserts, entity upserts)

    ``state_store='rocksdb'`` switches the three stateful hops onto the
    RocksDB provider (see :func:`configure_state_store`); None keeps the
    session's current setting. ``events`` overrides the hop-1 input with an
    already-built flat event stream (e.g. read_raw_nats_stream) — then
    ``source_dir`` is ignored. ``state_ttl_minutes`` applies the documented
    eviction improvement to all three stateful hops (see each stage's
    docstring); None = reference parity (unbounded state).

    ``engine`` selects the stateful-stage implementation:
    ``"applyinpandas"`` (default — one serialized state blob per key) or
    ``"tws"`` (transformWithStateInPandas — typed ValueState/MapState/
    ListState per key, streaming/tws.py; parity pinned per stage by
    tests/test_tws_resolve.py). TWS needs multiple column families, which
    only the RocksDB provider supports, so ``state_store=None`` is
    promoted to ``"rocksdb"`` there; the TTL improvement is not
    implemented on the TWS stages (pass ``state_ttl_minutes=None``).

    ``hop_timings`` (optional dict) accumulates wall seconds per hop
    (``resolve``/``rekey``/``entity``, += so multi-wave callers fold) —
    the ingest throughput bench's per-hop attribution
    (tools/bench_ingest.py)."""
    if engine not in ("applyinpandas", "tws"):
        raise ValueError(
            f"engine must be applyinpandas|tws, got {engine!r}"
        )
    if engine == "tws":
        if state_ttl_minutes is not None:
            raise ValueError(
                "state_ttl_minutes is not implemented on the tws engine "
                "(timers are an applyInPandasWithState feature here)"
            )
        if state_store is None:
            state_store = "rocksdb"
        from ph_ee_nats_importer_rdbms_spark.streaming import tws as _tws

        resolve_fn = lambda df, _ttl: _tws.resolve_stage_tws(  # noqa: E731
            df, output_schema=FLAT_SCHEMA
        )
        rekey_fn = lambda df, _ttl: _tws.rekey_stage_tws(df)  # noqa: E731
        entity_fn = lambda df, _ttl: _tws.entity_stage_tws(df)  # noqa: E731
    else:
        resolve_fn, rekey_fn, entity_fn = resolve_stage, rekey_stage, entity_stage
    if state_store is not None:
        configure_state_store(spark, state_store)
    paths = {
        n: os.path.join(work_dir, n) for n in ("resolved", "rekeyed", "changes")
    }

    def start(df: DataFrame, name: str):
        w = (
            df.writeStream.format("parquet")
            .option("path", paths[name])
            .option("checkpointLocation", os.path.join(work_dir, f"ckpt_{name}"))
            .outputMode("append")
        )
        if available_now:
            w = w.trigger(availableNow=True)
        return w.start()

    def timed(hop: str, run):
        t0 = time.perf_counter()
        run()
        if hop_timings is not None:
            hop_timings[hop] = hop_timings.get(hop, 0.0) + (
                time.perf_counter() - t0
            )

    source = (
        events
        if events is not None
        else read_raw_stream(spark, source_dir, max_files_per_trigger)
    )
    timed(
        "resolve",
        lambda: start(
            resolve_fn(source, state_ttl_minutes), "resolved"
        ).awaitTermination(),
    )

    resolved = spark.readStream.schema(FLAT_SCHEMA).parquet(paths["resolved"])
    timed(
        "rekey",
        lambda: start(
            rekey_fn(
                with_routing(resolved, registry, resolve_definitions=False),
                state_ttl_minutes,
            ),
            "rekeyed",
        ).awaitTermination(),
    )

    rekeyed = spark.readStream.schema(REKEYED_SCHEMA).parquet(paths["rekeyed"])
    timed(
        "entity",
        lambda: start(
            entity_fn(rekeyed, state_ttl_minutes), "changes"
        ).awaitTermination(),
    )
    return paths


def materialize_tables(spark: SparkSession, changes_path: str) -> dict[str, DataFrame]:
    """Fold the change log into the five output tables (upsert semantics:
    the latest snapshot per instance wins; variables/tasks are appends).
    In production this folding runs inside foreachBatch straight into JDBC
    (sinks/jdbc.py); reading the parquet change log gives the same tables
    for verification."""
    ch = spark.read.schema(CHANGES_SCHEMA).parquet(changes_path)
    # snapshots carry a per-key micro-batch sequence (_seq); the upsert fold
    # is max_by(_seq) per key — exactly what a MERGE sink applies per batch.
    ent = ch.filter(F.col("kind").isin("transfer", "transaction_request", "batch"))
    latest = (
        ent.withColumn("_seq", F.get_json_object("payload", "$._seq").cast("long"))
        .groupBy("kind", "workflow_instance_key")
        .agg(F.max_by("payload", F.col("_seq")).alias("payload"))
    )
    out: dict[str, DataFrame] = {}
    for kind, plural in (
        ("transfer", "transfers"),
        ("transaction_request", "transaction_requests"),
        ("batch", "batches"),
    ):
        out[plural] = latest.filter(F.col("kind") == kind).select(
            "workflow_instance_key", "payload"
        )
    for kind, plural, schema in (
        ("variable", "variables", schemas.VARIABLES_SCHEMA),
        ("task", "tasks", schemas.TASKS_SCHEMA),
    ):
        rows = ch.filter(F.col("kind") == kind)
        out[plural] = rows.select(
            F.from_json("payload", schema).alias("r")
        ).select("r.*")
    return out


def run_deployment(
    spark: SparkSession,
    work_dir: str,
    resolve_url,
    executor,
    source_dir: str | None = None,
    nats_options: dict[str, str] | None = None,
    registry: DataFrame | None = None,
    available_now: bool = True,
    max_files_per_trigger: int = 64,
    state_store: str | None = None,
    distributed: bool = True,
    dialect: str = "mysql",
    engine: str = "applyinpandas",
) -> dict[str, str]:
    """The full deployed topology in one call — what a user of the
    reference runs instead of the Spring Boot importer:

        NATS (native source, or file-drop bridge dir) -> resolve -> route/
        rekey -> entity state machine -> change log -> per-tenant JDBC
        MERGE/append (sinks/jdbc.changes_foreach_batch).

    ``resolve_url`` maps tenant -> JDBC url (sinks/jdbc.tenant_url_resolver
    over the master tenant_server_connections table); ``executor`` runs
    (url, statements) batches (a picklable DBAPI executor from
    sinks/dbapi.py in production, a recording fake in tests).
    ``distributed``/``dialect`` pass through to the sink (see
    changes_foreach_batch): the default is the DISTRIBUTED writer — rows
    never traverse the driver — which requires a picklable executor;
    pass ``distributed=False`` for the driver-collect topology (small
    deployments, py4j ``jvm_executor``). ``engine="tws"`` runs the three
    stateful hops on transformWithStateInPandas (see run_multi_hop).
    Every hop and the sink query are independently checkpointed under
    ``work_dir`` — restart resumes with exactly-once delivery into the
    idempotent MERGE."""
    from ph_ee_nats_importer_rdbms_spark.sinks.jdbc import changes_foreach_batch

    if source_dir is None and nats_options is None:
        raise ValueError(
            "run_deployment needs an ingestion source: pass source_dir "
            "(file-drop bridge directory) or nats_options (native NATS source)"
        )
    events = (
        read_raw_nats_stream(spark, **nats_options)
        if nats_options is not None
        else None
    )
    paths = run_multi_hop(
        spark,
        source_dir or "",
        work_dir,
        registry=registry,
        available_now=available_now,
        max_files_per_trigger=max_files_per_trigger,
        state_store=state_store,
        events=events,
        engine=engine,
    )

    changes = spark.readStream.schema(CHANGES_SCHEMA).parquet(paths["changes"])
    sink = (
        changes.writeStream.foreachBatch(
            changes_foreach_batch(
                resolve_url, executor, distributed=distributed, dialect=dialect
            )
        )
        .option("checkpointLocation", os.path.join(work_dir, "ckpt_jdbc"))
        .outputMode("append")
    )
    if available_now:
        sink = sink.trigger(availableNow=True)
    q = sink.start()
    q.awaitTermination()
    return paths
