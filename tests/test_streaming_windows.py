"""Watermark/windowed-aggregation tests: run the streaming query over a
rate-limited file feed and verify (a) on-time + tolerably-late events land
in their event-time windows, (b) events later than the watermark are
dropped — the semantics the batch equivalent can't express.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ph_ee_nats_importer_rdbms_spark.streaming.windows import windowed_event_stats

SCHEMA = StructType(
    [
        StructField("event_ts", TimestampType(), True),
        StructField("event_type", StringType(), True),
        StructField("v", LongType(), True),
    ]
)

H = 3_600  # seconds


def _write_drop(path, i, rows):
    with open(os.path.join(path, f"d{i:03d}.jsonl"), "w") as f:
        for ts_s, typ in rows:
            f.write(json.dumps({"event_ts": ts_s * 1000, "event_type": typ, "v": 1}) + "\n")


def test_watermark_drops_too_late_events(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    def run():
        stream = (
            spark.readStream.format("json")
            .schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .load(str(src))
            .withColumn("event_ts", F.timestamp_millis(F.col("event_ts").cast("long")))
        )
        q = (
            windowed_event_stats(stream, window="1 hour", watermark="2 hours")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # run 1: events in hour-0 and hour-3 (advances max event time to 3h;
    # checkpointed watermark after this run = 3h - 2h = 1h)
    _write_drop(str(src), 0, [(10, "a"), (20, "a"), (3 * H + 10, "b")])
    run()
    # run 2 (resumes checkpoint): hour-2 event is late but within the
    # watermark -> accepted; the hour-0 event's window closed at 1h -> dropped
    _write_drop(str(src), 1, [(2 * H + 5, "a"), (30, "a")])
    run()
    # run 3 far in the future closes all remaining windows
    _write_drop(str(src), 2, [(10 * H, "c")])
    run()

    got = {
        (r["window_start"].hour, r["event_type"]): r["n_events"]
        for r in spark.read.parquet(out).collect()
    }
    # hour-0 'a': the two on-time events; the too-late third one is DROPPED
    assert got[(0, "a")] == 2
    # hour-2 'a': late but within watermark -> counted
    assert got[(2, "a")] == 1
    assert got[(3, "b")] == 1


def test_session_windows_split_on_gap_and_close_via_watermark(spark, tmp_path):
    from ph_ee_nats_importer_rdbms_spark.streaming.windows import session_stats

    src = tmp_path / "ssrc"
    src.mkdir()
    out = str(tmp_path / "sout")
    ck = str(tmp_path / "sck")

    def _drop(i, rows):
        with open(os.path.join(str(src), f"s{i:03d}.jsonl"), "w") as f:
            for ts_s, user in rows:
                f.write(json.dumps({"event_ts": ts_s * 1000, "event_type": user, "v": 1}) + "\n")

    def run():
        stream = (
            spark.readStream.format("json")
            .schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .load(str(src))
            .withColumn("event_ts", F.timestamp_millis(F.col("event_ts").cast("long")))
        )
        q = (
            session_stats(stream, gap="30 minutes", watermark="1 hour",
                          key_col="event_type")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # user u1: two events 10 min apart (one session), then one event 2h
    # later (a NEW session: the 30-min gap expired in between)
    _drop(0, [(0, "u1"), (600, "u1"), (2 * H, "u1")])
    run()
    # far-future event pushes the watermark past every session's end
    _drop(1, [(10 * H, "u2")])
    run()

    rows = spark.read.parquet(out).collect()
    sessions = {
        (r["event_type"], r["session_start"].hour * 3600 + r["session_start"].minute * 60): r
        for r in rows
    }
    first = sessions[("u1", 0)]
    assert first["n_events"] == 2
    # session end = last event + gap (00:10 + 30 min)
    assert (first["session_end"].hour, first["session_end"].minute) == (0, 40)
    second = sessions[("u1", 2 * 3600)]
    assert second["n_events"] == 1


def test_stream_stream_interval_join_attribution(spark, tmp_path):
    """Clicks join purchases of the same user within the 1h look-back; a
    purchase outside the interval (too old) or from another user never
    pairs. Runs as a real two-stream checkpointed join."""
    from ph_ee_nats_importer_rdbms_spark.streaming.windows import (
        stream_purchase_attribution,
    )

    src = tmp_path / "jsrc"
    src.mkdir()
    out = str(tmp_path / "jout")
    ck = str(tmp_path / "jck")

    ESCHEMA = StructType(
        [
            StructField("event_id", LongType(), True),
            StructField("event_ts", LongType(), True),
            StructField("user_id", LongType(), True),
            StructField("event_type", StringType(), True),
            StructField("value", LongType(), True),
        ]
    )

    rows = [
        # user 7: purchase at t=600s, click at t=1800s -> attributed
        dict(event_id=1, event_ts=600, user_id=7, event_type="purchase", value=50),
        dict(event_id=2, event_ts=1800, user_id=7, event_type="click", value=0),
        # user 7: ancient purchase 3h before the click -> outside interval
        dict(event_id=3, event_ts=-9000, user_id=7, event_type="purchase", value=99),
        # user 8's purchase must not pair with user 7's click
        dict(event_id=4, event_ts=1700, user_id=8, event_type="purchase", value=1),
        # purchase AFTER the click -> strictly-before condition excludes it
        dict(event_id=5, event_ts=1900, user_id=7, event_type="purchase", value=2),
    ]
    with open(os.path.join(str(src), "j000.jsonl"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    stream = (
        spark.readStream.format("json")
        .schema(ESCHEMA)
        .load(str(src))
        .withColumn("event_ts", F.timestamp_millis(F.col("event_ts") * 1000))
    )
    joined = stream_purchase_attribution(
        stream.filter(F.col("event_type") == "click"),
        stream.filter(F.col("event_type") == "purchase"),
        max_lag="1 hour",
        watermark="1 hour",
    )
    q = (
        joined.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = [
        (r["click_id"], r["purchase_id"], r["purchase_value"])
        for r in spark.read.parquet(out).collect()
    ]
    assert got == [(2, 1, 50)]


def test_windowed_funnel_chained_aggregations(spark, tmp_path):
    """Chained streaming aggregations (per-(window,user) stage minima →
    per-window fold) in append mode: conversions ordered within the hour
    count, out-of-order stages don't, and each window emits exactly one
    funnel row once the watermark closes it."""
    import json as _json

    from pyspark.sql.types import IntegerType
    from ph_ee_nats_importer_rdbms_spark.streaming.windows import windowed_funnel

    schema = StructType(
        [
            StructField("event_ts", LongType(), True),
            StructField("event_type", StringType(), True),
            StructField("user_id", IntegerType(), True),
        ]
    )
    src = tmp_path / "fsrc"
    src.mkdir()
    out = str(tmp_path / "fout")
    ck = str(tmp_path / "fck")

    rows = [
        # user 1: full ordered funnel inside hour 0
        (100, "view", 1), (200, "click", 1), (300, "purchase", 1),
        # user 2: click BEFORE view -> counts as view only
        (150, "click", 2), (250, "view", 2),
        # user 3: view then click, purchase missing
        (400, "view", 3), (500, "click", 3),
        # hour 3: watermark pusher so hour-0's window closes
        (3 * H + 10, "view", 9),
    ]
    with open(src / "d0.jsonl", "w") as f:
        for ts_s, typ, uid in rows:
            f.write(_json.dumps({"event_ts": ts_s * 1000, "event_type": typ, "user_id": uid}) + "\n")

    stream = (
        spark.readStream.format("json")
        .schema(schema)
        .load(str(src))
        .withColumn("event_ts", F.timestamp_millis(F.col("event_ts")))
    )
    q = (
        windowed_funnel(stream, window="1 hour", watermark="1 hour")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # push watermark far forward so hour 0 (and hour 3) emit
    with open(src / "d1.jsonl", "w") as f:
        f.write(_json.dumps({"event_ts": 10 * H * 1000, "event_type": "view", "user_id": 9}) + "\n")
    q = (
        windowed_funnel(stream, window="1 hour", watermark="1 hour")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        r["window_start"].hour: (
            r["n_view"], r["n_view_click"], r["n_view_click_purchase"]
        )
        for r in spark.read.parquet(out).collect()
    }
    # hour 0: 3 viewers, 2 ordered view->click, 1 full funnel
    assert got[0] == (3, 2, 1)
    assert got[3] == (1, 0, 0)



def test_windowed_funnel_parity_with_batch_and_conversion_funnel(spark, tmp_path):
    """Streaming↔batch funnel parity gate over the real events corpus:

    1. ``windowed_funnel`` run as a checkpointed streaming query (file
       feed, append mode) emits EXACTLY the rows the same operator
       produces applied as a batch plan, once the watermark closes every
       data window.
    2. Summed across windows, its counts equal the global
       ``conversion_funnel`` registry query on the corpus with each
       user relabeled to a (user, hour-window) composite id — the exact
       identity tying the windowed operator to the batch funnel's
       per-user min-timestamp semantics.
    """
    from ph_ee_nats_importer_rdbms_spark.plans.queries import QUERIES
    from ph_ee_nats_importer_rdbms_spark.streaming.windows import windowed_funnel

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")  # NTZ -> LTZ: watermarks need it
    )

    batch_rows = sorted(
        (r["window_start"], r["n_view"], r["n_view_click"], r["n_view_click_purchase"])
        for r in windowed_funnel(
            ev, window="1 hour", watermark="1 hour", ts_col="ts"
        ).collect()
    )

    # streaming run: feed the corpus, then a far-future pusher so every
    # data window closes (the pusher's own window stays open -> no row)
    src = tmp_path / "fpsrc"
    out = str(tmp_path / "fpout")
    ck = str(tmp_path / "fpck")
    ev.write.parquet(str(src), mode="append")

    def run():
        stream = spark.readStream.schema(ev.schema).parquet(str(src))
        q = (
            windowed_funnel(stream, window="1 hour", watermark="1 hour", ts_col="ts")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    pusher = spark.createDataFrame(
        [(10**7, max_ts + __import__("datetime").timedelta(days=365), 10**7, "view", 0.0, "{}")],
        schema=ev.schema,
    )
    pusher.write.parquet(str(src), mode="append")
    run()

    stream_rows = sorted(
        (r["window_start"], r["n_view"], r["n_view_click"], r["n_view_click_purchase"])
        for r in spark.read.parquet(out).collect()
    )
    assert stream_rows == batch_rows

    # (user, window)-relabeled corpus in registry layout: the global
    # funnel over composite users IS the window-summed windowed funnel
    rdir = tmp_path / "relabel"
    rdir.mkdir()
    wid = F.floor(F.unix_timestamp("ts") / 3600).cast("long")
    ev.withColumn(
        "user_id", F.col("user_id") * F.lit(1_000_000) + wid % F.lit(1_000_000)
    ).coalesce(1).write.parquet(str(rdir / "events.parquet"))
    funnel = QUERIES["conversion_funnel"][0](spark, str(rdir)).collect()[0]
    sums = [sum(r[i] for r in batch_rows) for i in (1, 2, 3)]
    assert sums == [
        funnel["n_view"], funnel["n_view_click"], funnel["n_view_click_purchase"]
    ]


def test_sliding_spend_panes_match_bruteforce(spark, tmp_path):
    """Sliding panes (2h window / 1h slide) emit once closed by the
    watermark and every pane equals the brute-force sum of its user's
    purchases inside [start, end)."""
    from pyspark.sql.types import DoubleType

    from ph_ee_nats_importer_rdbms_spark.streaming.windows import sliding_spend

    schema = StructType(
        [
            StructField("event_ts", TimestampType(), True),
            StructField("event_type", StringType(), True),
            StructField("user_id", LongType(), True),
            StructField("value", DoubleType(), True),
        ]
    )
    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    def drop(i, rows):
        with open(os.path.join(str(src), f"d{i:03d}.jsonl"), "w") as f:
            for ts_s, typ, uid, val in rows:
                f.write(
                    json.dumps(
                        {
                            "event_ts": ts_s * 1000,
                            "event_type": typ,
                            "user_id": uid,
                            "value": val,
                        }
                    )
                    + "\n"
                )

    def run():
        stream = (
            spark.readStream.format("json")
            .schema(schema)
            .option("maxFilesPerTrigger", 1)
            .load(str(src))
            .withColumn(
                "event_ts", F.timestamp_millis(F.col("event_ts").cast("long"))
            )
        )
        q = (
            sliding_spend(
                stream, window="2 hours", slide="1 hour", watermark="1 hour"
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    rows = [
        (10, "purchase", 1, 10.0),
        (30, "view", 1, 99.0),  # non-purchase: excluded
        (H + 20, "purchase", 1, 5.0),
        (H + 30, "purchase", 2, 7.0),
    ]
    drop(0, rows)
    run()
    # advance watermark past every pane end with PURCHASE events — the
    # type filter is pushed below the watermark operator, so only rows
    # surviving it advance event time; emission lags one run because the
    # checkpointed watermark applies at batch START (same 3-run shape as
    # the tumbling-window test above)
    drop(1, [(24 * H, "purchase", 9, 1.0)])
    run()
    drop(2, [(25 * H, "purchase", 9, 1.0)])
    run()

    got = spark.read.parquet(out).collect()
    assert got
    # user 9's flush purchases live in panes the final watermark (23h at
    # run-3 batch start) has not closed -> absent from `got` by design
    assert all(r["user_id"] in (1, 2) for r in got)
    purchases = [(ts, u, v) for ts, typ, u, v in rows if typ == "purchase"]
    for r in got:
        start = r["window_start"].timestamp()
        end = r["window_end"].timestamp()
        assert end - start == 2 * H  # window length
        frame = [
            v for ts, u, v in purchases if u == r["user_id"] and start <= ts < end
        ]
        assert frame, r
        assert r["n_purchases"] == len(frame)
        assert abs(r["spend"] - round(sum(frame), 2)) < 1e-9
    # every purchase lands in exactly window/slide = 2 panes
    panes_per_user = {}
    for r in got:
        panes_per_user[r["user_id"]] = panes_per_user.get(r["user_id"], 0) + 1
    # user 1: events at 0h and 1h -> panes starting -1h,0h,1h = 3 panes
    assert panes_per_user[1] == 3
    # user 2: one event -> 2 panes
    assert panes_per_user[2] == 2


def test_sliding_spend_degenerate_tumbling_matches_batch(spark, tmp_path):
    """Streaming-batch agreement gate: with slide == window the sliding
    rollup degenerates to tumbling panes, which batch expresses as a
    plain groupBy(window(...)) — the two engines' pane contents must be
    identical row-for-row."""
    from pyspark.sql.types import DoubleType

    from ph_ee_nats_importer_rdbms_spark.streaming.windows import sliding_spend

    schema = StructType(
        [
            StructField("event_ts", TimestampType(), True),
            StructField("event_type", StringType(), True),
            StructField("user_id", LongType(), True),
            StructField("value", DoubleType(), True),
        ]
    )
    src = tmp_path / "tsrc"
    src.mkdir()
    out = str(tmp_path / "tout")
    ck = str(tmp_path / "tck")

    rows = [
        (10, "purchase", 1, 10.0),
        (600, "purchase", 1, 2.5),
        (H + 20, "purchase", 1, 5.0),
        (H + 30, "purchase", 2, 7.0),
        (2 * H + 5, "purchase", 2, 1.0),
        (40, "view", 1, 99.0),
    ]

    def drop(i, rs):
        with open(os.path.join(str(src), f"t{i:03d}.jsonl"), "w") as f:
            for ts_s, typ, uid, val in rs:
                f.write(
                    json.dumps(
                        {
                            "event_ts": ts_s * 1000,
                            "event_type": typ,
                            "user_id": uid,
                            "value": val,
                        }
                    )
                    + "\n"
                )

    def run():
        stream = (
            spark.readStream.format("json")
            .schema(schema)
            .option("maxFilesPerTrigger", 1)
            .load(str(src))
            .withColumn(
                "event_ts", F.timestamp_millis(F.col("event_ts").cast("long"))
            )
        )
        q = (
            sliding_spend(
                stream, window="1 hour", slide="1 hour", watermark="1 hour"
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drop(0, rows)
    run()
    drop(1, [(24 * H, "purchase", 9, 1.0)])
    run()
    drop(2, [(25 * H, "purchase", 9, 1.0)])
    run()

    streamed = {
        (r["window_start"], r["user_id"]): (r["spend"], r["n_purchases"])
        for r in spark.read.parquet(out).collect()
        if r["user_id"] in (1, 2)  # flush user's panes aren't closed yet
    }

    batch_df = spark.createDataFrame(
        [(ts, typ, uid, val) for ts, typ, uid, val in rows], 
        "ts_s long, event_type string, user_id long, value double",
    ).withColumn("event_ts", F.timestamp_millis(F.col("ts_s") * 1000))
    batch = {
        (r["w"]["start"], r["user_id"]): (r["spend"], r["n_purchases"])
        for r in (
            batch_df.filter(F.col("event_type") == "purchase")
            .groupBy(F.window("event_ts", "1 hour").alias("w"), "user_id")
            .agg(
                F.round(F.sum("value"), 2).alias("spend"),
                F.count(F.lit(1)).alias("n_purchases"),
            )
            .collect()
        )
    }
    assert streamed == batch and len(streamed) == 4
