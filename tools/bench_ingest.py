"""Streaming ingest THROUGHPUT bench (VERDICT r10 task #4).

The reference is an importer — its whole job is NATS envelope →
RDBMS row (NatsConsumer.java:34-35 in the reference repo) — so the
import side needs throughput evidence the way the query side got the
decade table. This tool measures the 3-hop streaming topology as
envelopes/second with per-hop attribution:

  source   file: ordered chunk write (prep, reported separately)
           wire: TCP publish into the in-repo JetStream double
  resolve  hop 1 — F1-F3 envelope filters + C5 definition buffering
  rekey    hop 2 — F5/F6 routing + C4 call-activity re-key
  entity   hop 3 — D1-D4/C1-C3 keyed entity fold
  sink     change-log → five typed tables, parquet commit

Knobs: ``--partitions`` (spark.sql.shuffle.partitions — the state-store
shard count of the three stateful hops; comma list sweeps it),
``--transport file|wire``, ``--engine applyinpandas|tws``. Each run
uses a fresh work dir (state shards are fixed at first checkpoint, so
a sweep must not reuse checkpoints).

Prints one JSON line per run:
  {"metric": "ingest_env_per_sec", "transport": ..., "partitions": N,
   "engine": ..., "envelopes": N, "pipeline_sec": s, "eps": N,
   "hops": {"source": s, "resolve": s, "rekey": s, "entity": s,
            "sink": s}, "sf": ...}
``pipeline_sec``/``eps`` cover resolve+rekey+entity+sink (the engine's
steady-state work); the source column shows the feed cost separately
(file prep is a bench artifact; the wire publish is a real deployment
hop but paced by the single-socket publisher, not the engine).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from ph_ee_nats_importer_rdbms_spark.plans import staging  # noqa: E402
from ph_ee_nats_importer_rdbms_spark.plans.queries import (  # noqa: E402
    flat_events_staged,
)
from ph_ee_nats_importer_rdbms_spark.session import build_session  # noqa: E402
from ph_ee_nats_importer_rdbms_spark.streaming import (  # noqa: E402
    pipeline as sp,
    replay,
)


def _flat_corpus(spark, sf_dir):
    flat = flat_events_staged(spark, sf_dir)
    return flat, flat.count()


def _sink(spark, changes_path: str, out_root: str) -> float:
    t0 = time.perf_counter()
    tables = sp.materialize_tables(spark, changes_path)
    for name in replay.TABLES:
        df = tables[name]
        if name in replay._ENTITY_SCHEMAS:
            df = replay._typed_entity(df, replay._ENTITY_SCHEMAS[name])
        df.write.mode("overwrite").parquet(os.path.join(out_root, name))
    return time.perf_counter() - t0


def run_file(spark, sf_dir, work, partitions, engine, chunks) -> dict:
    flat, n = _flat_corpus(spark, sf_dir)
    src = os.path.join(work, "source")
    t0 = time.perf_counter()
    replay.write_ordered_chunks(flat, src, chunks=chunks)
    source_sec = time.perf_counter() - t0
    hops: dict = {}
    spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
    paths = sp.run_multi_hop(
        spark,
        src,
        os.path.join(work, "work"),
        available_now=True,
        max_files_per_trigger=1,
        engine=engine,
        hop_timings=hops,
    )
    hops["sink"] = _sink(spark, paths["changes"], os.path.join(work, "tables"))
    hops["source"] = source_sec
    return {"envelopes": n, "hops": hops}


def run_wire(spark, sf_dir, work, partitions, engine, waves) -> dict:
    from tests.nats_mini_server import MiniNatsServer

    flat, n = _flat_corpus(spark, sf_dir)
    src = os.path.join(work, "source")
    replay.write_ordered_chunks(flat, src, chunks=waves, sort_within=True)
    chunk_files = sorted(
        os.path.join(src, f) for f in os.listdir(src) if f.startswith("chunk-")
    )
    hops: dict = {"source": 0.0}
    waves_sec: list[float] = []
    spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
    with MiniNatsServer() as s:
        for path in chunk_files:
            t0 = time.perf_counter()
            replay._publish_file(s.url, s.js.subject, path)
            hops["source"] += time.perf_counter() - t0
            events = sp.read_raw_nats_stream(
                spark, transport="wire", servers=s.url, stream=s.js.stream
            )
            t0 = time.perf_counter()
            paths = sp.run_multi_hop(
                spark,
                "",
                os.path.join(work, "work"),
                available_now=True,
                events=events,
                engine=engine,
                hop_timings=hops,
            )
            # per-wave drain time: wave 1 is a cold topology, wave 2+ a
            # checkpointed RESTART against the broker's new tail — the
            # wave-over-wave delta on equal-size waves is the resume
            # overhead (query restarts + state-store reload)
            waves_sec.append(round(time.perf_counter() - t0, 2))
    hops["sink"] = _sink(spark, paths["changes"], os.path.join(work, "tables"))
    return {"envelopes": n, "hops": hops, "waves_sec": waves_sec}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--transport", default="file", choices=["file", "wire"])
    ap.add_argument("--partitions", default="32")
    ap.add_argument("--engine", default="applyinpandas")
    ap.add_argument("--chunks", type=int, default=replay.REPLAY_CHUNKS)
    ap.add_argument("--waves", type=int, default=replay.WIRE_WAVES)
    args = ap.parse_args()

    if args.engine == "tws":
        # transformWithStateInPandas workers speak protobuf to the JVM
        # state server; on this container that runtime comes from the
        # test shim, which must reach PYTHONPATH before the JVM launches
        try:
            from tests.protobuf_compat import ensure_protobuf

            ensure_protobuf()
        except ImportError:
            pass  # real protobuf install (or the run fails loudly below)

    spark = build_session(
        app_name="ph-ee-spark-ingest-bench",
        extra_conf={"spark.driver.extraJavaOptions": "-Xlog:disable"},
    )
    sf = args.sf.rstrip("/").rsplit("sf", 1)[-1]
    for p in [int(x) for x in str(args.partitions).split(",")]:
        work = tempfile.mkdtemp(prefix=f"ingest_{args.transport}_{p}_")
        try:
            if args.transport == "file":
                r = run_file(spark, args.sf, work, p, args.engine, args.chunks)
            else:
                r = run_wire(spark, args.sf, work, p, args.engine, args.waves)
        finally:
            shutil.rmtree(work, ignore_errors=True)
        hops = {k: round(v, 2) for k, v in r["hops"].items()}
        pipeline_sec = round(
            sum(v for k, v in r["hops"].items() if k != "source"), 2
        )
        print(
            json.dumps(
                {
                    "metric": "ingest_env_per_sec",
                    "transport": args.transport,
                    "partitions": p,
                    "engine": args.engine,
                    "envelopes": r["envelopes"],
                    "pipeline_sec": pipeline_sec,
                    "eps": round(r["envelopes"] / pipeline_sec),
                    "hops": hops,
                    **(
                        {"waves_sec": r["waves_sec"]}
                        if "waves_sec" in r
                        else {}
                    ),
                    "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                }
            )
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
