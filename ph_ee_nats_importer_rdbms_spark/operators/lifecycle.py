"""Stateful correlation, batch form (SURVEY §2.4 C1-C5).

The reference keeps per-instance mutable entities in in-JVM maps
(InflightTransferManager.java:19 et al.) and mutates them per event. Batch
replay expresses the same fixed point declaratively:

- C4 parent links: a PROCESS ELEMENT_ACTIVATING row with
  parentProcessInstanceKey > 0 registers child->parent
  (RecordParser.java:184-194); the child's later VARIABLE events and its
  ELEMENT_COMPLETED are re-keyed to the parent (:87-91, :198-204).
  Batch form: derive the link dimension once, left-join + coalesce. The join
  key is the same ``process_instance_key`` every downstream aggregation
  groups on, so the exchange is reused across stages.

- C2/C3 lifecycle: started_at = first ELEMENT_ACTIVATING (first-wins — D3,
  InflightTransferManager.java:26-34), completed_at = first
  ELEMENT_COMPLETED (idempotent end — D4, :37-54). "First" is in
  (timestamp, position) replay order. A child activation starts the PARENT
  with direction OUTGOING (RecordParser.java:190); an own activation uses
  the registry direction (:193).

Only PROCESS_INSTANCE records whose bpmnElementType == 'PROCESS' participate
(NatsConsumer.java:102).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ph_ee_nats_importer_rdbms_spark import config as cfg
from ph_ee_nats_importer_rdbms_spark.functions.scalars import has_parent

def _ord():
    return F.struct(F.col("timestamp"), F.col("position"))


def process_events(routed: DataFrame) -> DataFrame:
    """PROCESS_INSTANCE rows at process scope — the lifecycle event stream."""
    return routed.filter(
        (F.col("value_type") == "PROCESS_INSTANCE")
        & (F.col("bpmn_element_type") == "PROCESS")
    )


def parent_links(proc: DataFrame) -> DataFrame:
    """C4 link dimension: child instance key -> parent instance key.

    The reference keys its map by ``$.key`` of the child's ACTIVATING row
    (RecordParser.java:189); for a process-scope element that key equals the
    child's processInstanceKey, which is what the re-key lookups use
    (:87-88, :198-200).
    """
    return (
        proc.filter(
            (F.col("intent") == "ELEMENT_ACTIVATING")
            & has_parent(F.col("parent_process_instance_key"))
        )
        .groupBy(F.col("process_instance_key").alias("child_key"))
        .agg(
            F.min_by(F.col("parent_process_instance_key"), _ord()).alias("parent_key")
        )
    )


def rekey_to_parent(df: DataFrame, links: DataFrame, key: str = "process_instance_key") -> DataFrame:
    """Re-key call-activity children to their parent instance (C4)."""
    return (
        df.join(links, on=df[key] == links["child_key"], how="left")
        .withColumn(key, F.coalesce(F.col("parent_key"), F.col(key)))
        .drop("child_key", "parent_key")
    )


def lifecycle_table(proc: DataFrame, links: DataFrame) -> DataFrame:
    """Per-instance lifecycle: effective_key, started_at_ms, direction,
    completed_at_ms — after parent re-keying.

    Start candidates (transferStarted / transactionRequestStarted /
    batchStarted):
      * own ACTIVATING without parent -> (instance, registry direction)
      * child ACTIVATING with parent  -> (parent,  OUTGOING)
    End candidates: ELEMENT_COMPLETED re-keyed through the link table.
    First candidate in replay order wins both (D3/D4).
    """
    activating = proc.filter(F.col("intent") == "ELEMENT_ACTIVATING")
    own_start = activating.filter(
        ~has_parent(F.col("parent_process_instance_key"))
    ).select(
        F.col("process_instance_key").alias("instance_key"),
        "timestamp",
        "position",
        F.col("process_direction").alias("direction"),
        "process_type",
    )
    child_start = activating.filter(
        has_parent(F.col("parent_process_instance_key"))
    ).select(
        F.col("parent_process_instance_key").alias("instance_key"),
        "timestamp",
        "position",
        F.lit(cfg.OUTGOING).alias("direction"),
        "process_type",
    )
    starts = (
        own_start.unionByName(child_start)
        .groupBy("instance_key")
        .agg(
            F.min(F.struct("timestamp", "position")).alias("o"),
            F.min_by("direction", _ord()).alias("direction"),
            F.min_by("process_type", _ord()).alias("process_type"),
        )
        .select(
            "instance_key",
            F.col("o.timestamp").alias("started_at_ms"),
            "direction",
            "process_type",
        )
    )

    completed = rekey_to_parent(
        proc.filter(F.col("intent") == "ELEMENT_COMPLETED"), links
    )
    ends = (
        completed.groupBy(F.col("process_instance_key").alias("instance_key"))
        .agg(
            F.min("timestamp").alias("completed_at_ms"),
            F.min_by("position", _ord()).alias("completed_position"),
            F.min_by("process_type", _ord()).alias("end_process_type"),
        )
    )

    return (
        starts.join(ends, on="instance_key", how="full")
        .withColumn(
            "process_type", F.coalesce("process_type", F.col("end_process_type"))
        )
        .drop("end_process_type")
    )
