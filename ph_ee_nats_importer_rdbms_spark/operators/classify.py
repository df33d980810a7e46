"""Classification / routing operators (SURVEY §2.2 F1-F6, §2.4 C5).

The reference does this per message in NatsConsumer.listen
(NatsConsumer.java:34-122); here each step is a declarative DataFrame
transformation so Catalyst can push the drops into the scan and keep the
whole chain inside one whole-stage-codegen span:

- F1/F2  drop DEPLOYMENT / VARIABLE_DOCUMENT records  (NatsConsumer.java:39-47)
- F3     drop records with neither bpmnProcessId nor processDefinitionKey
         (NatsConsumer.java:56-59)
- C5     resolve a missing bpmnProcessId through other records that carry the
         same processDefinitionKey (TempDocumentStore.java:16-42). Batch mode
         resolves set-wide with a definition-key dimension join; the
         streaming path buffers in keyed state instead.
- F5     tenant / process-id split on the FIRST dash (NatsConsumer.java:73-75)
- F6     process-registry enrichment with UNKNOWN fallback
         (BpmnProcessProperties.java:26-31) — broadcast join, never a shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ph_ee_nats_importer_rdbms_spark import config as cfg
from ph_ee_nats_importer_rdbms_spark import schemas
from ph_ee_nats_importer_rdbms_spark.functions.scalars import (
    first_dash_prefix,
    first_dash_suffix,
)

DROPPED_VALUE_TYPES = ("DEPLOYMENT", "VARIABLE_DOCUMENT")


def parse_envelope(raw_df: DataFrame, value_col: str = "value") -> DataFrame:
    """Raw JSON event strings -> flat typed event relation.

    Two-phase parse: the envelope once, then the valueType-specific variant.
    PERMISSIVE mode + fully-nullable schemas reproduce the reference's
    null-on-missing-leaf JSONPath semantics (JsonPathReader.java:15-23).
    Catalyst prunes unread variant fields out of the second from_json.
    """
    env = raw_df.select(
        F.from_json(F.col(value_col), schemas.ENVELOPE_SCHEMA).alias("e")
    )
    pi = F.from_json(F.col("e.value"), schemas.PROCESS_INSTANCE_VALUE_SCHEMA)
    var = F.from_json(F.col("e.value"), schemas.VARIABLE_VALUE_SCHEMA)
    job = F.from_json(F.col("e.value"), schemas.JOB_VALUE_SCHEMA)
    vt = F.col("e.valueType")
    return env.select(
        F.col("e.partitionId").alias("partition_id"),
        F.col("e.position").alias("position"),
        F.col("e.key").alias("key"),
        F.col("e.timestamp").alias("timestamp"),
        F.col("e.recordType").alias("record_type"),
        vt.alias("value_type"),
        F.col("e.intent").alias("intent"),
        F.coalesce(pi["bpmnProcessId"], var["bpmnProcessId"], job["bpmnProcessId"]).alias(
            "bpmn_process_id"
        ),
        F.coalesce(
            pi["processInstanceKey"], var["processInstanceKey"], job["processInstanceKey"]
        ).alias("process_instance_key"),
        F.coalesce(
            pi["processDefinitionKey"],
            var["processDefinitionKey"],
            job["processDefinitionKey"],
        ).alias("process_definition_key"),
        pi["parentProcessInstanceKey"].alias("parent_process_instance_key"),
        pi["bpmnElementType"].alias("bpmn_element_type"),
        F.coalesce(pi["elementId"], job["elementId"]).alias("element_id"),
        var["name"].alias("name"),
        var["value"].alias("value"),
        job["type"].alias("job_type"),
    )


def with_routing(
    events: DataFrame,
    registry: DataFrame | None = None,
    resolve_definitions: bool = True,
) -> DataFrame:
    """F1-F3 + C5 + F5 + F6 over a flat event relation.

    Adds: ``tenant``, ``process_id`` (tenant-less), ``process_type``,
    ``process_direction``. Unroutable rows are dropped, mirroring the
    reference's early returns.

    ``resolve_definitions=False`` skips the batch-mode C5 join — used by the
    streaming pipeline, where resolution already happened in keyed state
    (an unwatermarked aggregation is illegal mid-stream anyway).
    """
    spark = events.sparkSession
    registry = registry if registry is not None else cfg.registry_df(spark)

    ev = events.filter(~F.col("value_type").isin(*DROPPED_VALUE_TYPES))

    empty_bpmn = F.col("bpmn_process_id").isNull() | (F.col("bpmn_process_id") == "")

    if resolve_definitions:
        # C5 (batch form): resolve a missing bpmnProcessId from the latest
        # record sharing the same processDefinitionKey that carries one. The
        # reference replays buffered records once the mapping is learned
        # (NatsConsumer.java:60-70,82-87); over a bounded batch the fixed
        # point of that replay is exactly this per-definition-key maximum.
        #
        # Cost is proportional to the ANOMALY, not the corpus: the
        # definition->id dimension is a map-side-combined aggregate, cut by
        # semi-join to only the definitions some empty-bpmn row actually
        # needs (bounded by deployed process definitions — broadcastable by
        # construction), then broadcast-joined back. The main event pass
        # stays map-only: no corpus shuffle, no sort. `max` over a
        # (timestamp, position, bpmn) struct is the deterministic form of
        # max_by(bpmn, (ts, pos)) — positions are unique, and struct-max
        # ignores null candidates.
        has_def = F.col("process_definition_key").isNotNull()
        needs = empty_bpmn & has_def
        # ONE corpus pass builds both "which definitions have a gap" and
        # "what each definition resolves to"; keeping only gapped rows with
        # a known resolution leaves the broadcastable repair dimension.
        dim = (
            ev.filter(has_def)
            .groupBy("process_definition_key")
            .agg(
                F.max(
                    F.when(
                        ~empty_bpmn,
                        F.struct(
                            F.col("timestamp"),
                            F.col("position"),
                            F.col("bpmn_process_id"),
                        ),
                    )
                )["bpmn_process_id"].alias("_c5_resolved"),
                F.max(empty_bpmn).alias("_c5_needed"),
            )
            .filter(F.col("_c5_needed") & F.col("_c5_resolved").isNotNull())
            .drop("_c5_needed")
        )
        ev = (
            ev.join(F.broadcast(dim), on="process_definition_key", how="left")
            .withColumn(
                "bpmn_process_id",
                F.when(needs, F.col("_c5_resolved")).otherwise(
                    F.col("bpmn_process_id")
                ),
            )
            .drop("_c5_resolved")
        )

    # F3: still unroutable after resolution -> drop.
    ev = ev.filter(
        F.col("bpmn_process_id").isNotNull() & (F.col("bpmn_process_id") != "")
    )

    # F5: split "<processId>-<tenant>" on the FIRST dash.
    ev = ev.withColumn("process_id", first_dash_prefix("bpmn_process_id")).withColumn(
        "tenant", first_dash_suffix("bpmn_process_id")
    )

    # F6: broadcast registry join with UNKNOWN fallback.
    ev = (
        ev.join(F.broadcast(registry), on="process_id", how="left")
        .withColumn(
            "process_type", F.coalesce("process_type", F.lit(cfg.UNKNOWN_TYPE))
        )
        .withColumn(
            "process_direction",
            F.coalesce("process_direction", F.lit(cfg.UNKNOWN_DIRECTION)),
        )
    )
    return ev
