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


def deduped_task_stream(
    events: DataFrame,
    watermark: str = "1 hour",
) -> DataFrame:
    """D2 task dedup as a pure built-in streaming stage:
    ``dropDuplicatesWithinWatermark`` on the reference's task identity
    (instance, elementId, intent) (RecordParser.java:233-245).

    This is the watermark-bounded alternative to the keyed-state dedup in
    the entity processor: state for a task key is dropped once the
    watermark passes, so memory is bounded by the late-data horizon instead
    of growing with all-time task count (the reference's DB-read dedup is
    effectively unbounded). Use when at-scale retention matters more than
    exact parity for arbitrarily-late duplicates."""
    jobs = events.filter(
        (F.col("value_type") == "JOB") & F.col("job_type").isNotNull()
    ).withColumn("event_ts", F.timestamp_millis(F.col("timestamp")))
    return jobs.withWatermark("event_ts", watermark).dropDuplicatesWithinWatermark(
        ["process_instance_key", "element_id", "intent"]
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


def session_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "event_ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Streaming sessionization with ``session_window``: per-key sessions
    that close after ``gap`` of event-time inactivity — the streaming twin
    of the batch ``user_sessions`` registry query (which needs a full sort
    + running sum per key; here the state store merges windows
    incrementally). In append mode a session's single row emits once the
    watermark passes ``session_end``, so downstream sinks see each session
    exactly once."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("w"),
            F.col(key_col),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            F.col(key_col),
            "n_events",
        )
    )


def windowed_funnel(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "event_ts",
    type_col: str = "event_type",
    key_col: str = "user_id",
) -> DataFrame:
    """Ordered view→click→purchase funnel per tumbling window — the
    streaming twin of the batch ``conversion_funnel`` registry query,
    restricted to conversions that happen inside one window.

    Shape: CHAINED streaming aggregations — per-(window, user)
    min-stage-timestamps, then a per-window fold. Chaining two stateful
    aggregations in append mode is legal because the second groups on the
    first's time-window column, so Spark can propagate the watermark
    through both state stores (the multiple-stateful-operators support
    the multi-hop pipeline otherwise works around). Both aggregations are
    map-side combinable; a window's single funnel row emits once the
    watermark passes its end."""
    ev = events.withWatermark(ts_col, watermark)

    def first_ts(t: str):
        return F.min(F.when(F.col(type_col) == t, F.col(ts_col)))

    per_user = ev.groupBy(
        F.window(F.col(ts_col), window).alias("w"), F.col(key_col)
    ).agg(
        first_ts("view").alias("v"),
        first_ts("click").alias("c"),
        first_ts("purchase").alias("p"),
    )
    one, zero = F.lit(1), F.lit(0)
    return (
        per_user.groupBy("w")
        .agg(
            F.sum(F.when(F.col("v").isNotNull(), one).otherwise(zero)).alias(
                "n_view"
            ),
            F.sum(F.when(F.col("v") < F.col("c"), one).otherwise(zero)).alias(
                "n_view_click"
            ),
            F.sum(
                F.when(
                    (F.col("v") < F.col("c")) & (F.col("c") < F.col("p")), one
                ).otherwise(zero)
            ).alias("n_view_click_purchase"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_view",
            "n_view_click",
            "n_view_click_purchase",
        )
    )


def sliding_spend(
    events: DataFrame,
    window: str = "7 days",
    slide: str = "1 day",
    watermark: str = "1 day",
    ts_col: str = "event_ts",
    type_col: str = "event_type",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Sliding event-time window: per-user purchase spend over the
    trailing ``window``, refreshed every ``slide`` — the streaming twin of
    the batch ``rolling_spend`` rollup.

    Batch computes an exact per-event trailing RANGE frame; streaming
    discretizes the frame to ``slide`` granularity, which is the standard
    trade: each event lands in window/slide overlapping panes, so state
    per key is bounded by that pane count (not by per-event history), and
    watermarking closes panes for exactly-once append emission. Map-side
    combinable like every windowed sum/count here — the overlap factor
    multiplies shuffle rows, not state residency, and both scale with
    window/slide, a config knob, not the data.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .filter(F.col(type_col) == "purchase")
        .groupBy(
            F.window(F.col(ts_col), window, slide).alias("w"),
            F.col(key_col),
        )
        .agg(
            F.round(F.sum(value_col), 2).alias("spend"),
            F.count(F.lit(1)).alias("n_purchases"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            F.col(key_col),
            "spend",
            "n_purchases",
        )
    )


def stream_purchase_attribution(
    clicks: DataFrame,
    purchases: DataFrame,
    max_lag: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream interval join: attribute each click to purchases by
    the same user within ``max_lag`` BEFORE the click (the streaming twin
    of the batch as-of query; emitting all in-window purchase candidates —
    the as-of argmax is a downstream per-click aggregation).

    Both sides carry watermarks, so join state is bounded: a buffered
    purchase can be dropped once the watermark passes purchase_ts +
    max_lag, which Spark derives from the interval condition — the
    mechanism the reference's unbounded in-JVM maps never had. Inner join
    => a click emits only when a qualifying purchase exists (left-outer
    interval joins additionally need the watermark to close the window
    before emitting the null row)."""
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("event_ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("event_ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    ).withWatermark("purchase_ts", watermark)
    return c.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") < F.col("click_ts"))
        & (F.col("purchase_ts") >= F.col("click_ts") - F.expr(f"INTERVAL {max_lag}")),
        "inner",
    ).select("click_id", "user_id", "click_ts", "purchase_id", "purchase_ts", "purchase_value")
