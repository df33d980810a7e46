"""Append-side event tables: ph_variables (D1) and ph_tasks (D2).

Batch replay order. The reference processes events in NATS arrival order;
a batch replay has no arrival order, so the canonical order here (and in the
DuckDB oracles) is event order ``(timestamp, position)`` — Zeebe's own log
order. All dedup rules below are stated against that order.

D1 — variable history (RecordParser.java:133-156): a VARIABLE event is
dropped iff an *earlier-processed* event with the same
(workflowInstanceKey, name) had ``timestamp >= new.timestamp``. Replayed in
(timestamp, position) order, an earlier event always has ts <= new ts, so
the rule degenerates to: among events sharing (instance, name, timestamp)
keep the first by position; strictly newer timestamps always insert (it is
last-writer-wins *history*, one row per re-write, not a pure dedup).

D2 — task log (RecordParser.java:223-256): insert once per
(workflowInstanceKey, elementId, intent); later duplicates are dropped
regardless of timestamp. JOB records with null ``value.type`` are skipped
(:224-227).

Both use a single hash-aggregate (groupBy + min_by) rather than a window:
one shuffle on the dedup key, map-side partial aggregation, no sort — the
shape that survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_ORDER = ("timestamp", "position")


def _first_by_order(value_cols: list[str], df: DataFrame, keys: list[str]) -> DataFrame:
    ord_ = F.struct(*[F.col(c) for c in _ORDER])
    aggs = [F.min_by(F.col(c), ord_).alias(c) for c in value_cols]
    return df.groupBy(*keys).agg(*aggs)


# what the entity-assembly stage actually reads off the deduped stream
# (entities._known_variables + the reg_dir / wf_keys side aggregates)
_ENTITY_VAR_COLS = [
    "process_instance_key", "name", "timestamp", "position", "value",
    "process_type", "process_direction", "process_definition_key",
]


def variables_deduped(routed: DataFrame) -> DataFrame:
    """The routed VARIABLE stream with D1 applied, projected to the columns
    the entity-assembly stage reads (_ENTITY_VAR_COLS).

    The reference short-circuits processVariable on a D1 duplicate *before*
    addVariableToEntity (RecordParser.java:137-145 guard precedes the
    :77-131 entity update), so the entity mappers must see the deduped
    stream, not the raw one — a same-timestamp duplicate must not win LWW.

    Shape: one scalar ``min_by(col, position)`` per payload column rather
    than a single ``min_by(struct(*), position)``. Positions are unique, so
    every min_by resolves to the same winner row; scalar buffers keep the
    aggregate narrow and let the early projection drop the 12 unused event
    columns before the shuffle (the struct form shuffles and sorts the full
    20-column row — measured 2.6x slower at sf0.1).
    """
    vars_ = routed.filter(F.col("value_type") == "VARIABLE").select(*_ENTITY_VAR_COLS)
    keys = ["process_instance_key", "name", "timestamp"]
    # within a (instance, name, timestamp) group order is by position alone
    aggs = [
        F.min_by(F.col(c), F.col("position")).alias(c)
        for c in _ENTITY_VAR_COLS
        if c not in keys and c != "position"
    ]
    aggs.append(F.min("position").alias("position"))
    return vars_.groupBy(*keys).agg(*aggs)


def variables_table(routed: DataFrame) -> DataFrame:
    """ph_variables (entity/variable/Variable.java:17-33). Keeps the raw
    (pre-rekey) instance key, exactly like processVariable."""
    vars_ = routed.filter(F.col("value_type") == "VARIABLE")
    deduped = _first_by_order(
        ["process_definition_key", "position", "value"],
        vars_.select(
            "process_instance_key", "name", "timestamp", "position",
            "process_definition_key", "value",
        ),
        ["process_instance_key", "name", "timestamp"],
    )
    return deduped.select(
        F.col("process_definition_key").alias("workflow_key"),
        F.col("process_instance_key").alias("workflow_instance_key"),
        F.col("timestamp"),
        F.col("name"),
        F.col("value"),
    )


def tasks_table(routed: DataFrame) -> DataFrame:
    """ph_tasks (entity/task/Task.java:15-28)."""
    jobs = routed.filter(
        (F.col("value_type") == "JOB") & F.col("job_type").isNotNull()
    )
    deduped = _first_by_order(
        ["process_definition_key", "timestamp", "record_type", "job_type"],
        jobs.select(
            "process_instance_key", "element_id", "intent", "timestamp", "position",
            "process_definition_key", "record_type", "job_type",
        ),
        ["process_instance_key", "element_id", "intent"],
    )
    return deduped.select(
        F.col("process_definition_key").alias("workflow_key"),
        F.col("process_instance_key").alias("workflow_instance_key"),
        F.col("timestamp"),
        F.col("intent"),
        F.col("record_type"),
        F.col("job_type").alias("type"),
        F.col("element_id"),
    )


def businesskeys_table(variables: DataFrame) -> DataFrame:
    """ph_businesskeys mirror (BusinessKeyRepository.java:9; SURVEY §1.4:
    the reference defines the table but its importer never writes it — the
    ops app derives it from business variables). Same derivation here:
    the domain's business keys are the transactionId / batchId variables,
    quote-stripped per OperatorUtils.java:7-9. ~2 rows per instance, with
    ``business_key`` a plain column so a lookup predicate pushes into the
    stored scan. Lives in this module so the staging fingerprint
    (plans/staging.py _SEMANTIC_SOURCES) covers the derivation."""
    from ph_ee_nats_importer_rdbms_spark.functions.scalars import strip_quotes

    return variables.filter(
        F.col("name").isin("transactionId", "batchId")
    ).select(
        strip_quotes("value").alias("business_key"),
        F.col("name").alias("business_key_type"),
        "workflow_instance_key",
        "timestamp",
    )
