"""Opt-in live-broker integration test for the native NATS JetStream source.

The CI container has neither a NATS server nor the ``nats-py`` client, so
the source's JetStream transport (sources/nats_source.py:92-140) is
otherwise exercised only through the file transport, which shares all the
offset/partition/read/commit machinery but not the broker I/O
(NatsConsumer.java:34-35 parity). This module closes that gap wherever a
broker IS available:

    SPARK_GRAFT_NATS_LIVE=1 SPARK_GRAFT_NATS_SERVERS=nats://host:4222 \
        pytest tests/test_nats_live.py

Skipped (with the reason visible in the pytest summary) unless the env gate
is set, ``nats-py`` imports, and the broker answers within 2 s.
"""

from __future__ import annotations

import json
import os
import uuid

import pytest

_GATE = os.environ.get("SPARK_GRAFT_NATS_LIVE", "") == "1"
_SERVERS = os.environ.get("SPARK_GRAFT_NATS_SERVERS", "nats://localhost:4222")

pytestmark = pytest.mark.skipif(
    not _GATE,
    reason="live NATS test is opt-in: set SPARK_GRAFT_NATS_LIVE=1 with a "
    "reachable JetStream broker (no broker in the default container)",
)


def _connect_or_skip():
    nats = pytest.importorskip(
        "nats", reason="nats-py client not installed in this environment"
    )
    import asyncio

    async def ping():
        nc = await asyncio.wait_for(nats.connect(_SERVERS), timeout=2.0)
        await nc.close()

    try:
        asyncio.new_event_loop().run_until_complete(ping())
    except Exception as e:  # pragma: no cover - environment probe
        pytest.skip(f"no reachable NATS broker at {_SERVERS}: {e}")
    return nats


def _publish(nats_mod, stream: str, subject: str, payloads: list[str]) -> None:
    import asyncio

    async def go():
        nc = await nats_mod.connect(_SERVERS)
        try:
            js = nc.jetstream()
            await js.add_stream(name=stream, subjects=[subject])
            for p in payloads:
                await js.publish(subject, p.encode("utf-8"))
        finally:
            await nc.close()

    asyncio.new_event_loop().run_until_complete(go())


def test_jetstream_offsets_and_restart_replay(spark, tmp_path):
    """Sequences drive micro-batch offsets; a restart from the checkpoint
    resumes at the committed sequence and re-delivers nothing."""
    nats_mod = _connect_or_skip()
    from ph_ee_nats_importer_rdbms_spark.sources.nats_source import (
        register_nats_source,
    )

    stream = f"phee_test_{uuid.uuid4().hex[:8]}"
    subject = f"{stream}.export"
    first = [json.dumps({"n": i}) for i in range(100)]
    _publish(nats_mod, stream, subject, first)

    register_nats_source(spark)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_batch():
        q = (
            spark.readStream.format("nats")
            .option("transport", "jetstream")
            .option("servers", _SERVERS)
            .option("stream", stream)
            .option("subject", subject)
            .option("partition_target_rows", 16)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_batch()
    got = spark.read.parquet(out)
    assert got.count() == 100
    assert sorted(r.seq for r in got.select("seq").collect()) == list(
        range(1, 101)
    )

    # second tranche + restart: only the new sequences arrive
    second = [json.dumps({"n": i}) for i in range(100, 130)]
    _publish(nats_mod, stream, subject, second)
    run_batch()
    got2 = spark.read.parquet(out)
    assert got2.count() == 130  # exactly-once across the restart
    assert sorted(r.seq for r in got2.select("seq").collect()) == list(
        range(1, 131)
    )


def test_wire_transport_direct_get_against_live_broker(spark, tmp_path):
    """The dependency-free wire transport against a REAL server: the
    batched direct-get path (stream created with allow_direct) and the
    per-sequence MSG.GET path must serve identical rows, and a stream
    WITHOUT allow_direct must trigger the auto fallback via the real
    503 no-responders reply (the semantics the protocol double mirrors
    in tests/test_nats_wire.py)."""
    nats_mod = _connect_or_skip()
    import asyncio

    from ph_ee_nats_importer_rdbms_spark.sources.nats_source import (
        _WireTransport,
    )

    payloads = [json.dumps({"n": i}) for i in range(50)]

    async def make(stream: str, subject: str, allow_direct: bool) -> None:
        nc = await nats_mod.connect(_SERVERS)
        try:
            js = nc.jetstream()
            await js.add_stream(
                name=stream, subjects=[subject], allow_direct=allow_direct
            )
            for p in payloads:
                await js.publish(subject, p.encode("utf-8"))
        finally:
            await nc.close()

    loop = asyncio.new_event_loop()

    direct_stream = f"phee_wire_{uuid.uuid4().hex[:8]}"
    loop.run_until_complete(make(direct_stream, f"{direct_stream}.x", True))
    got_direct = list(
        _WireTransport(_SERVERS, direct_stream, "fail", window=16).fetch(0, 50)
    )
    got_msg = list(
        _WireTransport(_SERVERS, direct_stream, "fail", ranged_get="msg").fetch(
            0, 50
        )
    )
    assert got_direct == got_msg and len(got_direct) == 50
    assert [seq for _, _, seq in got_direct] == list(range(1, 51))

    nodirect_stream = f"phee_wire_{uuid.uuid4().hex[:8]}"
    loop.run_until_complete(
        make(nodirect_stream, f"{nodirect_stream}.x", False)
    )
    # auto: real 503 no-responders -> silent fallback to MSG.GET
    got_fb = list(
        _WireTransport(_SERVERS, nodirect_stream, "fail").fetch(0, 50)
    )
    assert [seq for _, _, seq in got_fb] == list(range(1, 51))
