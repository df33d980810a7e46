"""Native NATS streaming source (sources/nats_source.py): offset math unit
tests + an end-to-end readStream drive over the file transport."""

from __future__ import annotations

import json

import pytest

from ph_ee_nats_importer_rdbms_spark.sources.nats_source import (
    NatsStreamReader,
    SeqRange,
    register_nats_source,
)


def _write_stream(tmp_path, n: int) -> str:
    path = tmp_path / "captured.jsonl"
    lines = [
        json.dumps({"position": i, "valueType": "VARIABLE", "value": {"name": f"v{i}"}})
        for i in range(1, n + 1)
    ]
    path.write_text("\n".join(lines) + "\n")
    return str(path)


def _reader(path: str, **opts) -> NatsStreamReader:
    return NatsStreamReader({"transport": "file", "path": path, **opts})


def test_partitions_slice_range_into_target_rows(tmp_path):
    r = _reader(_write_stream(tmp_path, 10), partition_target_rows=3)
    parts = r.partitions({"seq": 0}, {"seq": 10})
    assert [(p.start, p.end) for p in parts] == [(0, 3), (3, 6), (6, 9), (9, 10)]
    # empty batch still yields one (empty) partition
    empty = r.partitions({"seq": 5}, {"seq": 5})
    assert [(p.start, p.end) for p in empty] == [(5, 5)]


def test_latest_offset_and_read_are_replayable(tmp_path):
    path = _write_stream(tmp_path, 7)
    r = _reader(path)
    assert r.initialOffset() == {"seq": 0}
    assert r.latestOffset() == {"seq": 7}
    rows = list(r.read(SeqRange(2, 5)))
    assert [seq for _, _, seq in rows] == [3, 4, 5]
    # replay of the same range returns identical rows (exactly-once basis)
    assert list(r.read(SeqRange(2, 5))) == rows
    assert json.loads(rows[0][0])["position"] == 3


def test_max_rows_per_trigger_bounds_batches(tmp_path):
    r = _reader(_write_stream(tmp_path, 10), max_rows_per_trigger=4)
    assert r.latestOffset() == {"seq": 4}
    assert r.latestOffset() == {"seq": 8}
    assert r.latestOffset() == {"seq": 10}


def test_jetstream_transport_needs_client(tmp_path):
    with pytest.raises(NotImplementedError):
        NatsStreamReader({"transport": "jetstream"})


def test_readstream_end_to_end(spark, tmp_path):
    path = _write_stream(tmp_path, 25)
    register_nats_source(spark)
    df = (
        spark.readStream.format("nats")
        .option("transport", "file")
        .option("path", path)
        .option("partition_target_rows", 10)
        .load()
    )
    q = (
        df.writeStream.format("memory")
        .queryName("nats_e2e")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM nats_e2e ORDER BY seq").collect()
    assert len(out) == 25
    assert [r.seq for r in out] == list(range(1, 26))
    assert out[0].subject == "zeebe-export"
    assert json.loads(out[24].value)["position"] == 25
