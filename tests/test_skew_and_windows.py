"""Salted two-phase aggregation (operators/skew.py) and the
watermark-bounded streaming task dedup (streaming/windows.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ph_ee_nats_importer_rdbms_spark.operators.skew import salted_agg
from tests import zeebe_fixtures as zf


def test_salted_agg_matches_plain_groupby(spark):
    # one hot key (90% of rows) + a uniform tail — the shape salting fixes
    df = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 7).cast("string")))
        .alias("k"),
        (F.col("id") % 101).cast("double").alias("v"),
    )
    got = salted_agg(
        df,
        ["k"],
        [("v", "count", "n"), ("v", "sum", "s"), ("v", "min", "lo"), ("v", "max", "hi")],
        buckets=8,
    )
    want = df.groupBy("k").agg(
        F.count("v").alias("n"), F.sum("v").alias("s"),
        F.min("v").alias("lo"), F.max("v").alias("hi"),
    )
    g = {r["k"]: (r["n"], r["s"], r["lo"], r["hi"]) for r in got.collect()}
    w = {r["k"]: (r["n"], r["s"], r["lo"], r["hi"]) for r in want.collect()}
    assert g == w
    # two-phase plan: aggregation happens on (k, _salt) before the final k
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan

    import pytest

    with pytest.raises(ValueError):
        salted_agg(df, ["k"], [("v", "avg", "a")])


def test_streaming_dedup_within_watermark(spark, tmp_path):
    from ph_ee_nats_importer_rdbms_spark.streaming.windows import (
        deduped_task_stream,
    )

    rows = [
        zf.job_event(100, "svc", "T1", "CREATED", ts=1_000),
        zf.job_event(100, "svc", "T1", "CREATED", ts=2_000),  # dup identity
        zf.job_event(100, "svc", "T1", "COMPLETED", ts=3_000),
        zf.job_event(200, "svc", "T1", "CREATED", ts=3_500),
        # non-JOB and null-type rows are filtered out
        zf.process_event(300, "ELEMENT_ACTIVATING", ts=4_000),
        zf.flat_event(key=9, timestamp=4_100, value_type="JOB", intent="X",
                      process_instance_key=9, element_id="e", job_type=None),
    ]
    src = tmp_path / "in"
    src.mkdir()
    zf.to_df(spark, rows).coalesce(1).write.parquet(str(src / "drop"))

    stream = spark.readStream.schema(
        zf.to_df(spark, rows).schema
    ).parquet(str(src / "*"))
    q = (
        deduped_task_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_tasks")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql(
        "SELECT process_instance_key, element_id, intent FROM dedup_tasks"
    ).collect()
    got = sorted((r[0], r[1], r[2]) for r in out)
    assert got == [(100, "T1", "COMPLETED"), (100, "T1", "CREATED"), (200, "T1", "CREATED")]
