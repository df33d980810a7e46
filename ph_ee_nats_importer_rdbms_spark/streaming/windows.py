"""Event-time windowed aggregations with watermarks — the streaming
analytics layer over the materialized/event streams.

The reference has no windowing at all (SURVEY §2.7); these are the
standard Structured Streaming shapes a deployment layers on the same
event feed: per-window per-type counts/sums with bounded late-data
acceptance, and a per-tenant transfer-throughput monitor over the change
log. Watermarks bound both state size and late-data wait — the knob the
reference's unbounded maps never had.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_event_stats(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "event_ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Tumbling-window counts per event type with late-data tolerance.

    Works on any streaming DataFrame with an event-time timestamp column.
    Events later than ``watermark`` behind the max seen event time are
    dropped; everything else updates its (closed or open) window. In
    append output mode a window's row emits once the watermark passes its
    end — exactly-once rows into a downstream sink.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window).alias("w"),
            F.col(type_col),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            F.col(type_col),
            "n_events",
        )
    )


def transfer_throughput(
    changes: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Per-tenant transfer-upsert throughput over the entity change log
    (streaming/pipeline.CHANGES_SCHEMA) — the ops dashboard query. Uses the
    processing timestamp carried in the payload's lifecycle fields when
    present, so replays are deterministic."""
    ts = F.coalesce(
        F.timestamp_millis(
            F.get_json_object("payload", "$.completed_at").cast("long")
        ),
        F.timestamp_millis(F.get_json_object("payload", "$.started_at").cast("long")),
    )
    transfers = changes.filter(F.col("kind") == "transfer").withColumn(
        "event_ts", ts
    ).filter(F.col("event_ts").isNotNull())
    return (
        transfers.withWatermark("event_ts", watermark)
        .groupBy(F.window("event_ts", window).alias("w"), "tenant")
        .agg(F.count(F.lit(1)).alias("n_upserts"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("tenant"),
            "n_upserts",
        )
    )
