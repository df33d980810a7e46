"""Same-window A/B of the r13 streaming-wrapper optimization.

Runs the 3-hop replay topology twice per round in ONE session — once
with the pre-r13 wrapper internals (dict-per-event replay via
resolve_step/rekey_step, row-wise _records) monkeypatched back in, once
with the current vectorized wrappers — alternating so host speed swings
hit both sides. Verifies the five output tables hash-identical between
the two implementations on the first round.

Usage: python tools/ab_replay.py [sf_dir] [rounds]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from ph_ee_nats_importer_rdbms_spark.operators.classify import (  # noqa: E402
    DROPPED_VALUE_TYPES,
)
from ph_ee_nats_importer_rdbms_spark.plans.queries import (  # noqa: E402
    flat_events_staged,
)
from ph_ee_nats_importer_rdbms_spark.session import build_session  # noqa: E402
from ph_ee_nats_importer_rdbms_spark.streaming import (  # noqa: E402
    pipeline as sp,
    replay,
    state as sm,
)


# --- pre-r13 wrapper internals (verbatim from git b91f3a1..3c74216) ---------


def _old_records(pdf: pd.DataFrame) -> list[dict]:
    out = []
    for rec in pdf.to_dict("records"):
        clean = {}
        for k, v in rec.items():
            if v is None or (isinstance(v, float) and pd.isna(v)) or v is pd.NaT:
                clean[k] = None
            elif hasattr(v, "item"):
                clean[k] = v.item()
            else:
                clean[k] = v
        out.append(clean)
    return out


def _old_sorted_events(pdf_iter) -> list[dict]:
    pdf = pd.concat(list(pdf_iter), ignore_index=True)
    pdf = pdf.sort_values(["timestamp", "position"], kind="mergesort")
    return _old_records(pdf)


def old_resolve_stage(events, state_ttl_minutes=None):
    cols = sp._columns(sp.FLAT_SCHEMA)
    ttl_ms, timeout = sp._ttl(state_ttl_minutes)

    def fn(key, pdf_iter, state):
        if ttl_ms is not None and state.hasTimedOut:
            state.remove()
            yield pd.DataFrame([], columns=cols)
            return
        st = (
            sm.ResolveState(**json.loads(state.get[0]))
            if state.exists
            else sm.ResolveState()
        )
        st, out = sm.resolve_step(st, _old_sorted_events(pdf_iter))
        state.update(
            (
                json.dumps(
                    {"resolved_bpmn": st.resolved_bpmn, "buffered": st.buffered}
                ),
            )
        )
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(out, columns=cols)

    filtered = events.filter(
        ~F.col("value_type").isin(*DROPPED_VALUE_TYPES)
    ).filter(
        ~(
            (F.col("bpmn_process_id").isNull() | (F.col("bpmn_process_id") == ""))
            & F.col("process_definition_key").isNull()
        )
    )
    return filtered.groupBy("process_definition_key").applyInPandasWithState(
        fn, sp.FLAT_SCHEMA, sp._STATE_SCHEMA, "append", timeout
    )


def old_rekey_stage(routed, state_ttl_minutes=None):
    cols = sp._columns(sp.REKEYED_SCHEMA)
    ttl_ms, timeout = sp._ttl(state_ttl_minutes)

    def fn(key, pdf_iter, state):
        if ttl_ms is not None and state.hasTimedOut:
            state.remove()
            yield pd.DataFrame([], columns=cols)
            return
        st = (
            sm.RekeyState(parent_key=json.loads(state.get[0])["parent_key"])
            if state.exists
            else sm.RekeyState()
        )
        st, out = sm.rekey_step(st, _old_sorted_events(pdf_iter))
        state.update((json.dumps({"parent_key": st.parent_key}),))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(out, columns=cols)

    return routed.groupBy("process_instance_key").applyInPandasWithState(
        fn, sp.REKEYED_SCHEMA, sp._STATE_SCHEMA, "append", timeout
    )


def _run(spark, src, engine_patch: bool, work: str) -> dict:
    hops: dict = {}
    saved = (sp.resolve_stage, sp.rekey_stage, sp._sorted_events, sp._records)
    try:
        if engine_patch:
            sp.resolve_stage = old_resolve_stage
            sp.rekey_stage = old_rekey_stage
            sp._sorted_events = _old_sorted_events
            sp._records = _old_records
        sp.run_multi_hop(
            spark,
            src,
            work,
            available_now=True,
            max_files_per_trigger=1,
            hop_timings=hops,
        )
    finally:
        (
            sp.resolve_stage,
            sp.rekey_stage,
            sp._sorted_events,
            sp._records,
        ) = saved
    return hops


def _table_hashes(spark, changes_path: str) -> dict:
    tables = sp.materialize_tables(spark, changes_path)
    out = {}
    for name, df in tables.items():
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64(*[F.col(c) for c in df.columns]).cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        out[name] = (row["n"], row["h"])
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = build_session(app_name="ab-replay")
    spark.range(10_000_000).selectExpr("sum(id)").collect()
    flat = flat_events_staged(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="ab_replay_")
    src = os.path.join(root, "source")
    replay.write_ordered_chunks(flat, src)
    print(f"envelopes: {flat.count()}", flush=True)
    try:
        books: dict[str, list] = {"old": [], "new": []}
        hashes: dict[str, dict] = {}
        for r in range(rounds):
            for impl in ("old", "new"):
                work = os.path.join(root, f"work_{impl}_{r}")
                t0 = time.perf_counter()
                hops = _run(spark, src, impl == "old", work)
                wall = time.perf_counter() - t0
                books[impl].append((wall, hops))
                if r == 0:
                    hashes[impl] = _table_hashes(
                        spark, os.path.join(work, "changes")
                    )
                shutil.rmtree(work, ignore_errors=True)
                print(
                    f"{impl} r{r}: wall={wall:.1f}s "
                    + " ".join(f"{k}={v:.1f}" for k, v in hops.items()),
                    flush=True,
                )
        print("tables identical:", hashes["old"] == hashes["new"], hashes["old"])
        for impl, runs in books.items():
            walls = [w for w, _ in runs]
            print(f"{impl}: min={min(walls):.1f} walls={[round(w,1) for w in walls]}")
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
