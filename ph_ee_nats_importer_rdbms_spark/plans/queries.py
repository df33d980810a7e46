"""Query registry backing ``__spark_entry__.py``.

Each entry: name -> (spark callable (spark, sf_dir) -> DataFrame,
DuckDB oracle SQL or None). Column names/aliases are identical on both
sides — the driver's comparator sorts columns by name before hashing.

Two families:

1. ``zeebe_*`` — the import-pipeline semantics, hash-checked end-to-end:
   both engines derive the same synthetic Zeebe event log from ``orders``
   (plans/synthetic.py), Spark runs the real operator pipeline, DuckDB runs
   a portable SQL re-computation of the reference semantics.

2. Read-path / analytics — SURVEY §2.6 predicates and the north-star
   analytics over the TPC-H-ish tables. Aggregate doubles are rounded to 2
   decimals on both sides so the hash is insensitive to float summation
   order; sets produced with LIMIT carry a total deterministic ORDER BY.
"""

from __future__ import annotations

import os as _os

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from ph_ee_nats_importer_rdbms_spark.plans import staging, synthetic
from ph_ee_nats_importer_rdbms_spark.sources.files import load_table, spread

QueryFn = Callable[[SparkSession, str], DataFrame]

_MS = ("started_at", "completed_at", "result_generated_at")

_PIPELINE_TABLES = (
    "variables",
    "tasks",
    "transfers",
    "transaction_requests",
    "batches",
)


def _session_key(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Memo key: applicationId is unique per live session, so a GC'd and
    recreated session can never collide (unlike ``id(spark)``)."""
    return (spark.sparkContext.applicationId, sf_dir)


def zeebe_events_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic corpus with the shared ``base`` projection staged once —
    the 14 union branches then scan ~10 narrow columns from memory instead
    of re-running the parquet scan + casts + string builds per branch."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    # orders at bench SF is one small parquet file -> a 1-partition scan;
    # without the repartition every union branch (and everything downstream
    # of the staged base) runs single-threaded.
    par = spark.sparkContext.defaultParallelism
    base = (
        spark.sql(synthetic.spark_base_sql())
        .repartition(par)
        .localCheckpoint(eager=True)
    )
    base.createOrReplaceTempView("base")
    return spark.sql(synthetic.spark_events_from_base_sql())


def flat_events_staged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flat event union, staged ONCE per dataset with a sane file
    layout (r13, guide §6): the 14-branch union arrives with ~480
    partitions (14 × the base's 32) and used to stage as ~480 ≈80 KB
    files — every downstream scan (the routing build, the streaming
    replay's chunk writer) then paid ~480 task launches + file opens for
    38 MB of data. One round-robin repartition at BUILD time writes
    par-sized files instead. The stage name carries the layout version
    ("_c" = compacted) because load_or_build keys data+semantics, not
    layout; the superseded name is dropped so the stage never doubles."""
    par = spark.sparkContext.defaultParallelism
    staging.drop_stage(sf_dir, "flat_events")
    return staging.load_or_build(
        spark,
        sf_dir,
        "flat_events_c",
        lambda: zeebe_events_df(spark, sf_dir).repartition(par),
    )


_ROUTED_CACHE: dict[tuple[str, str], DataFrame] = {}


def _routed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The routed event stream, staged once per DATASET (parquet stage,
    plans/staging.py) and memoized per session — shared by the
    routing/tenant queries so they don't re-derive the corpus.

    The flat event union is itself staged first: ``with_routing``
    references its input twice (the C5 definition-dimension aggregate and
    the main pass), so routing straight off the derivation would compute
    the 14-branch union twice; off the flat parquet both references are
    column-pruned scans (the dim agg reads 3 of 16 columns)."""
    from ph_ee_nats_importer_rdbms_spark.operators.classify import with_routing

    key = _session_key(spark, sf_dir)
    if key not in _ROUTED_CACHE:

        def build() -> DataFrame:
            # routed output is repartitioned BY TENANT before the
            # hive-partitioned write: each tenant directory then holds
            # one ~corpus/ntenants file instead of one file per input
            # partition (~31 × ~350 KB observed) — a tenant-pruned read
            # (Q6) opens 1 file, and the write-side shuffle is paid once
            # at staging (guide §6 partitioning-on-write).
            flat = flat_events_staged(spark, sf_dir)
            return with_routing(flat).repartition(F.col("tenant"))

        # hive-partitioned BY TENANT (round 8): the storage analog of the
        # reference's per-tenant database routing — tenant-equality reads
        # (Q6 tenant_lookup; at scale, any per-tenant serving query)
        # become partition-pruned scans instead of full corpus scans.
        # Tenant cardinality is config-sized by construction (the
        # registry dimension), so the partition count stays bounded. The
        # stage name carries the layout version (see load_or_build);
        # the superseded unpartitioned stage is dropped so a rename
        # never doubles the largest staged relation's disk.
        staging.drop_stage(sf_dir, "routed_events")
        staging.drop_stage(sf_dir, "routed_events_by_tenant")
        _ROUTED_CACHE[key] = staging.load_or_build(
            spark,
            sf_dir,
            "routed_events_by_tenant_c",
            build,
            partition_by=["tenant"],
        )
    return _ROUTED_CACHE[key]


_PIPELINE_CACHE: dict[tuple[str, str], dict[str, DataFrame]] = {}


def _pipeline(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """One pipeline materialization per dataset: the engine's operating
    model is 'materialize the business tables once, query them many times'
    — the first query against a fresh dataset pays the import and persists
    the five tables to the parquet stage (exactly what the JDBC/parquet
    sink gives a real deployment); every later query — same session or a
    fresh one — reads the stored relations."""
    key = _session_key(spark, sf_dir)
    if key in _PIPELINE_CACHE:
        return _PIPELINE_CACHE[key]

    if all(staging.is_staged(sf_dir, n) for n in _PIPELINE_TABLES):
        _PIPELINE_CACHE[key] = {
            n: staging.read_staged(spark, sf_dir, n) for n in _PIPELINE_TABLES
        }
        return _PIPELINE_CACHE[key]

    from ph_ee_nats_importer_rdbms_spark.operators.pipeline import (
        run_import_pipeline_routed,
    )

    tables = run_import_pipeline_routed(_routed(spark, sf_dir))
    # Materialize all five outputs as concurrent jobs: the first zeebe
    # query pays the whole import once (exactly like the deployed importer
    # writing its table store), and the scheduler overlaps the five table
    # writes instead of paying each tail serially.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(len(tables)) as ex:
        futures = {
            name: ex.submit(staging.load_or_build, spark, sf_dir, name, (lambda df=df: df))
            for name, df in tables.items()
        }
        _PIPELINE_CACHE[key] = {n: f.result() for n, f in futures.items()}
    return _PIPELINE_CACHE[key]


def _table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """A pipeline output table — ``_pipeline`` materializes all five on
    first touch (the batch analogue of the deployed system's JDBC/parquet
    table store: the importer writes each business table once, every
    read-path query scans the stored relation instead of re-running the
    import)."""
    return _pipeline(spark, sf_dir)[name]


def _ms_cols(df: DataFrame) -> DataFrame:
    """Timestamps -> epoch-ms bigints named *_ms (portable value compare)."""
    for c in _MS:
        if c in df.columns:
            df = df.withColumn(f"{c}_ms", F.unix_millis(F.col(c))).drop(c)
    # keep original column order with _ms substituted in place
    return df


def _project_transfers(df: DataFrame) -> DataFrame:
    return df.select(
        "workflow_instance_key",
        "transaction_id",
        F.unix_millis("started_at").alias("started_at_ms"),
        F.unix_millis("completed_at").alias("completed_at_ms"),
        "status",
        "status_detail",
        "payee_dfsp_id",
        "payee_party_id",
        "payee_party_id_type",
        F.col("payee_fee").cast("double").alias("payee_fee"),
        "payee_fee_currency",
        "payee_quote_code",
        "payer_dfsp_id",
        "payer_party_id",
        "payer_party_id_type",
        F.col("payer_fee").cast("double").alias("payer_fee"),
        "payer_fee_currency",
        "payer_quote_code",
        F.col("amount").cast("double").alias("amount"),
        "currency",
        "direction",
        "error_information",
        "batch_id",
    )


def _q_transfers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _project_transfers(_table(spark, sf_dir, "transfers"))


def _project_transaction_requests(df: DataFrame) -> DataFrame:
    return df.select(
        "workflow_instance_key",
        "transaction_id",
        F.unix_millis("started_at").alias("started_at_ms"),
        F.unix_millis("completed_at").alias("completed_at_ms"),
        "state",
        "payee_dfsp_id",
        "payee_party_id",
        "payee_party_id_type",
        F.col("payee_fee").cast("double").alias("payee_fee"),
        "payee_quote_code",
        "payer_dfsp_id",
        "payer_party_id",
        "payer_party_id_type",
        F.col("payer_fee").cast("double").alias("payer_fee"),
        "payer_quote_code",
        F.col("amount").cast("double").alias("amount"),
        "currency",
        "direction",
        "auth_type",
        "initiator_type",
        "scenario",
    )


def _q_transaction_requests(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _project_transaction_requests(
        _table(spark, sf_dir, "transaction_requests")
    )


def _project_batches(df: DataFrame) -> DataFrame:
    return df.select(
        "workflow_instance_key",
        "workflow_key",
        "batch_id",
        "request_id",
        "request_file",
        "note",
        "result_file",
        "total_transactions",
        "ongoing",
        "failed",
        "completed",
        F.unix_millis("result_generated_at").alias("result_generated_at_ms"),
        F.unix_millis("started_at").alias("started_at_ms"),
        F.unix_millis("completed_at").alias("completed_at_ms"),
    )


def _q_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _project_batches(_table(spark, sf_dir, "batches"))


# --- streaming-engine twins (streaming/replay.py): the SAME projections
# and the SAME oracles as the batch entries, but the table store was
# materialized by the 3-hop Structured Streaming topology replaying the
# raw envelope corpus (availableNow, one file per trigger). A green
# driver row here certifies the streaming engine end-to-end — envelope
# parse, C5 buffering, C4 re-key, D1-D4 keyed state, C6 mappers, and
# the change-log upsert fold — not just its batch twin.


def _streaming_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from ph_ee_nats_importer_rdbms_spark.streaming import replay

    return replay.streaming_table(spark, sf_dir, name)


def _q_transfers_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _project_transfers(_streaming_table(spark, sf_dir, "transfers"))


def _q_transaction_requests_streaming(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _project_transaction_requests(
        _streaming_table(spark, sf_dir, "transaction_requests")
    )


def _q_batches_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _project_batches(_streaming_table(spark, sf_dir, "batches"))


def _q_variables_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _streaming_table(spark, sf_dir, "variables")


def _q_tasks_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _streaming_table(spark, sf_dir, "tasks")


def _q_transfers_streaming_wire(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The transfers table materialized by the streaming engine fed
    through the NATS WIRE SOURCE (format("nats") / transport=wire over
    real TCP against the in-repo protocol double) — extends the oracle
    gate over the source adapter itself (VERDICT r9 task #7); the file
    bridge is pinned untouched by tests/test_streaming_replay.py."""
    from ph_ee_nats_importer_rdbms_spark.streaming import replay

    return _project_transfers(
        replay.streaming_table_wire(spark, sf_dir, "transfers")
    )


def _wire_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from ph_ee_nats_importer_rdbms_spark.streaming import replay

    return replay.streaming_table_wire(spark, sf_dir, name)


def _q_transaction_requests_streaming_wire(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _project_transaction_requests(
        _wire_table(spark, sf_dir, "transaction_requests")
    )


def _q_batches_streaming_wire(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _project_batches(_wire_table(spark, sf_dir, "batches"))


def _q_variables_streaming_wire(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _wire_table(spark, sf_dir, "variables")


def _q_tasks_streaming_wire(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _wire_table(spark, sf_dir, "tasks")


def _q_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _table(spark, sf_dir, "variables")


def _q_tasks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _table(spark, sf_dir, "tasks")


def _q_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _routed(spark, sf_dir).groupBy("tenant", "process_type").agg(
        F.count(F.lit(1)).alias("n_events")
    )


# ---------------------------------------------------------------------------
# Read-path predicates (SURVEY §2.6 Q1-Q7) over the derived transfers table —
# TransferSpecs.java:10-29 semantics driven through the real pipeline.
# ---------------------------------------------------------------------------


def _q_transfers_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1/Q2/Q3: BETWEEN + >= + equality (TransferSpecs.java:10-29)."""
    t = _table(spark, sf_dir, "transfers")
    return t.filter(
        F.col("amount").between(50_000, 200_000)
        & (F.col("status") == "COMPLETED")
        & (F.col("direction") == "INCOMING")
    ).select(
        "workflow_instance_key",
        "transaction_id",
        F.col("amount").cast("double").alias("amount"),
        "currency",
        F.unix_millis("started_at").alias("started_at_ms"),
    )


_TRANSFERS_RANGE_ORACLE = (
    "WITH t AS (" + synthetic.TRANSFERS_ORACLE + ") "
    + """
SELECT workflow_instance_key, transaction_id, amount, currency, started_at_ms
FROM t
WHERE amount BETWEEN 50000 AND 200000
  AND status = 'COMPLETED' AND direction = 'INCOMING'
"""
)


def _q_transfer_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 TransferDetail: transfer ⋈ tasks ⋈ variables on the instance key
    (entity/transfer/TransferDetail.java:9-12), aggregated to one row per
    transfer so the result is order-insensitive.

    r13 (guide §2.4): reads the SAME co-bucketed table store as
    ``transfer_detail_rows`` (CLUSTERED+SORTED BY workflow_instance_key),
    so the two per-instance count aggregates satisfy their required
    distribution straight off the scan — the plan drops both aggregation
    Exchanges (measured 0.34 s each at sf0.1), and at 100 TB the counts
    never shuffle the event logs at all. Row content is identical: the
    bucketed tables are the staged pipeline tables re-laid-out (the
    shuffle was paid once at save time)."""
    prefix = _ensure_detail_tables(spark, sf_dir)
    t = spark.table(f"{prefix}transfers").select(
        "workflow_instance_key", "transaction_id", "status"
    )
    tasks = spark.table(f"{prefix}tasks").groupBy("workflow_instance_key").agg(
        F.count(F.lit(1)).alias("n_tasks")
    )
    vars_ = spark.table(f"{prefix}variables").groupBy(
        "workflow_instance_key"
    ).agg(F.count(F.lit(1)).alias("n_variables"))
    return (
        t.join(tasks, "workflow_instance_key", "left")
        .join(vars_, "workflow_instance_key", "left")
        .select(
            "workflow_instance_key",
            "transaction_id",
            "status",
            F.coalesce("n_tasks", F.lit(0)).alias("n_tasks"),
            F.coalesce("n_variables", F.lit(0)).alias("n_variables"),
        )
    )


_DETAIL_TABLES_SAVED: set[tuple[str, str]] = set()


def _ensure_detail_tables(spark: SparkSession, sf_dir: str) -> str:
    """Register (or build once) the Q7 co-bucketed tables for this
    (session, dataset); returns the catalog prefix. Shared by
    ``transfer_detail_join`` and ``transfer_detail_rows`` — one store,
    two readers."""
    from ph_ee_nats_importer_rdbms_spark.sinks import storage

    # Catalog names are dataset-scoped (fingerprint in the prefix): querying
    # dataset A, then B, then A again must not serve B's rows from A's call,
    # and an in-place data/code refresh (new fingerprint) re-registers.
    prefix = f"q7_{staging.fingerprint(sf_dir)}_"
    key = (spark.sparkContext.applicationId, prefix)
    if key not in _DETAIL_TABLES_SAVED:
        names = ("transfers", "tasks", "variables")
        broot = staging.bucketed_dir(sf_dir)
        # bucketed files persist with the dataset stage: a fresh session
        # re-attaches them with catalog DDL instead of rewriting the data
        if broot is None or not storage.register_bucketed_tables(
            spark, names, broot, prefix=prefix
        ):
            tables = _pipeline(spark, sf_dir)
            storage.save_bucketed_tables(
                {n: tables[n] for n in names}, prefix=prefix, path_root=broot
            )
        _DETAIL_TABLES_SAVED.add(key)
    return prefix


def _q_transfer_detail_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 at its TRUE row grain (TransferDetail.java:9-12: the transfer,
    its task rows, its variable rows) served through the bucketed table
    store (sinks/storage.py): the pipeline tables are saved CLUSTERED BY
    workflow_instance_key once, then the 3-way join plans with zero
    Exchange — the shuffle was paid at write time, which is the 100 TB
    shape (all three tables too big to broadcast). The driver's comparator
    is row-order-insensitive, so the row multiset is the contract."""
    from ph_ee_nats_importer_rdbms_spark.sinks import storage

    prefix = _ensure_detail_tables(spark, sf_dir)
    detail = storage.transfer_detail(spark, prefix=prefix)
    return detail.select(
        "workflow_instance_key",
        "transaction_id",
        "status",
        "element_id",
        "intent",
        "task_type",
        "name",
        "value",
    )


_TRANSFER_DETAIL_ROWS_ORACLE = (
    "WITH t AS (" + synthetic.TRANSFERS_ORACLE + "), "
    + "tk AS (" + synthetic.TASKS_ORACLE + "), "
    + "vr AS (" + synthetic.VARIABLES_ORACLE + ") "
    + """
SELECT t.workflow_instance_key, t.transaction_id, t.status,
       tk.element_id, tk.intent, tk.type AS task_type,
       vr.name, vr.value
FROM t
LEFT JOIN tk ON t.workflow_instance_key = tk.workflow_instance_key
LEFT JOIN vr ON t.workflow_instance_key = vr.workflow_instance_key
"""
)


def _q_instance_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 key lookups (findByWorkflowInstanceKey across the five repos,
    TransferRepository.java:8 et al.): point-reads by the natural key. At
    scale this is a partition-pruned / min-max-skipped parquet read — the
    predicate reaches the scan (PushedFilters)."""
    keys = [2040, 4690, 10000]
    v = _table(spark, sf_dir, "variables").filter(
        F.col("workflow_instance_key").isin(keys)
    )
    return v.groupBy("workflow_instance_key").agg(
        F.count(F.lit(1)).alias("n_variables"),
        F.min("timestamp").alias("first_ts"),
        F.max("timestamp").alias("last_ts"),
    )


_INSTANCE_LOOKUP_ORACLE = (
    "WITH v AS (" + synthetic.VARIABLES_ORACLE + ") "
    + """
SELECT workflow_instance_key, count(*) AS n_variables,
       min(timestamp) AS first_ts, max(timestamp) AS last_ts
FROM v WHERE workflow_instance_key IN (2040, 4690, 10000)
GROUP BY 1
"""
)


def _businesskeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ph_businesskeys mirror derived from the variable log, staged per
    dataset (zeebe domain) like the five output tables. The derivation
    lives in operators/event_tables.py so the domain fingerprint covers
    its semantics."""
    from ph_ee_nats_importer_rdbms_spark.operators.event_tables import (
        businesskeys_table,
    )

    return staging.load_memoized(
        spark,
        sf_dir,
        "businesskeys",
        lambda: businesskeys_table(_table(spark, sf_dir, "variables")),
    )


def _q_businesskey_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 findByBusinessKeyAndBusinessKeyType (BusinessKeyRepository.java:9).

    The reference defines ph_businesskeys but the importer never writes it
    (SURVEY §1.4) — the ops app populates it from business variables. The
    engine derives the same relation from the variable log (the domain's
    business keys are the transactionId / batchId variables, quote-stripped
    per OperatorUtils.java:7-9) and serves the two-column conjunctive
    lookup over it. At scale: the derived relation is STAGED — ~2 rows per
    instance instead of the full variable log, with ``business_key`` a
    plain column so the equality predicate pushes into the parquet scan
    (at 100 TB you'd additionally bucket/sort it by business_key so the
    lookup is a pruned scan)."""
    bk = _businesskeys(spark, sf_dir)
    return bk.filter(
        (
            (F.col("business_key_type") == "transactionId")
            & (F.col("business_key") == "tx-204")
        )
        | (
            (F.col("business_key_type") == "batchId")
            & (F.col("business_key") == "b-469")
        )
    )


_BUSINESSKEY_LOOKUP_ORACLE = (
    "WITH v AS (" + synthetic.VARIABLES_ORACLE + ") "
    + """
SELECT trim(value, '"') AS business_key, name AS business_key_type,
       workflow_instance_key, timestamp
FROM v
WHERE (name = 'transactionId' AND trim(value, '"') = 'tx-204')
   OR (name = 'batchId' AND trim(value, '"') = 'b-469')
"""
)


def _q_tenant_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 tenant config lookup (findOneBySchemaName,
    TenantServerConnectionRepository.java:27) driven through the routed
    stream: per-tenant instance counts — the query the routing sink runs to
    size per-tenant writes."""
    return (
        _routed(spark, sf_dir).filter(F.col("tenant") == "tn1")
        .groupBy("tenant")
        .agg(
            F.countDistinct("process_instance_key").alias("n_instances"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


_TENANT_LOOKUP_ORACLE = (
    "WITH " + synthetic.oracle_with_clause()
    + """
SELECT tenant, count(DISTINCT process_instance_key) AS n_instances,
       count(*) AS n_events
FROM routed WHERE tenant = 'tn1' GROUP BY 1
"""
)


_TRANSFER_DETAIL_ORACLE = (
    "WITH t AS (" + synthetic.TRANSFERS_ORACLE + "), "
    + "tk AS (" + synthetic.TASKS_ORACLE + "), "
    + "vr AS (" + synthetic.VARIABLES_ORACLE + ") "
    + """
SELECT t.workflow_instance_key, t.transaction_id, t.status,
       COALESCE(tkc.n_tasks, 0) AS n_tasks,
       COALESCE(vrc.n_variables, 0) AS n_variables
FROM t
LEFT JOIN (SELECT workflow_instance_key, count(*) AS n_tasks FROM tk GROUP BY 1) tkc
  ON t.workflow_instance_key = tkc.workflow_instance_key
LEFT JOIN (SELECT workflow_instance_key, count(*) AS n_variables FROM vr GROUP BY 1) vrc
  ON t.workflow_instance_key = vrc.workflow_instance_key
"""
)


# ---------------------------------------------------------------------------
# Analytics over the TPC-H-ish tables (north-star additions, SURVEY §2.7)
# ---------------------------------------------------------------------------


def _q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOT spread (r13, deliberate): parallelizing the single-row-group
    # scan splits each group's double sum into per-partition partials
    # whose merge order is partition-layout-dependent — round(sum, 2)
    # flipped vs the oracle at sf0.1 when tried, and the value would
    # also vary with the driver's core-count sweep. Exact-sum/count
    # aggregates (top_parts, order_priority_late) do take the spread.
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_PRICING_SUMMARY_ORACLE = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def _q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    # NOT spread: revenue is a rounded double sum — see _q_pricing_summary
    li = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


_REVENUE_BY_NATION_ORACLE = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_lineitems
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def _q_top_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOT spread (r13, measured): a keyless repartition first pays a
    # local sort of its input (spark.sql.execution.sortBeforeRepartition,
    # guide §2.5) — at bench scale that sort cost 3-5x the single-core
    # scan it parallelized (0.40 s -> 2.04 s warm when tried). The
    # single-row-group input is a bench-SF artifact; real multi-split
    # layouts parallelize the scan for free.
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return (
        li.groupBy("l_partkey")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .join(F.broadcast(p), F.col("l_partkey") == p["p_partkey"])
        .select("p_partkey", "p_name", "total_qty", "n_orders")
        .orderBy(F.col("total_qty").desc(), F.col("p_partkey"))
        .limit(10)
    )


_TOP_PARTS_ORACLE = """
SELECT p_partkey, p_name, total_qty, n_orders
FROM (
  SELECT l_partkey, round(sum(l_quantity), 2) AS total_qty, count(*) AS n_orders
  FROM lineitem GROUP BY l_partkey
) agg
JOIN part ON l_partkey = p_partkey
ORDER BY total_qty DESC, p_partkey
LIMIT 10
"""


def _q_order_priority_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): orders with at least one late-shipped line,
    counted per priority bucket (TPC-H Q4 shape). The probe side is
    pre-filtered and deduped per key before the semi join, so the shuffle
    carries distinct orderkeys, not all matching lineitems."""
    # NOT spread (r13, measured): same keyless-repartition sort tax as
    # _q_top_parts (0.79 s -> 1.26 s warm when tried) — the single-core
    # scan is a bench-SF single-row-group artifact, not a plan defect.
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = li.filter(F.col("l_shipdate") > "1997-06-30").select("l_orderkey")
    return (
        o.join(late, o["o_orderkey"] == late["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


_ORDER_PRIORITY_LATE_ORACLE = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey
    AND l_shipdate > TIMESTAMP '1997-06-30 00:00:00'
)
GROUP BY o_orderpriority
"""


def _q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no order since the
    cutoff. The build side is filtered before the join, so the anti-join
    hash table holds only recent orderkeys."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    recent = o.filter(F.col("o_orderdate") >= "1997-06-01").select("o_custkey")
    return (
        c.join(recent, c["c_custkey"] == recent["o_custkey"], "left_anti")
        .select("c_custkey", "c_name", F.round("c_acctbal", 2).alias("acctbal"))
    )


_CUSTOMERS_WITHOUT_ORDERS_ORACLE = """
SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey
    AND o_orderdate >= TIMESTAMP '1997-06-01 00:00:00'
)
"""


def _q_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals with ROLLUP(region, nation): one aggregation
    pass produces leaf rows, per-region subtotals, and the grand total
    (grouped columns NULL on subtotal rows, exactly as in ANSI ROLLUP)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    # NOT spread: revenue is a rounded double sum — see _q_pricing_summary
    li = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
    )
    return joined.rollup("r_name", "n_name").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_lineitems"),
    )


_REVENUE_ROLLUP_ORACLE = """
SELECT r_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_lineitems
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


def _q_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click attributed to the user's most recent STRICTLY
    earlier purchase (DuckDB expresses this as ``ASOF LEFT JOIN``; Spark has
    no as-of operator). Implemented as a single event-time window pass —
    ``max(purchase_ts) over (user, range < current ts)`` — one shuffle on
    user_id, no range-join row explosion: at 100 TB the cost is a sort
    within each user partition, versus an O(clicks × purchases) expansion
    for the naive inequality join."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    both = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_id", "user_id", "event_type", us.alias("ts_us")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(W.unboundedPreceding, -1)
    )
    attributed = both.withColumn(
        "last_purchase_ts_us",
        F.max(
            F.when(F.col("event_type") == "purchase", F.col("ts_us"))
        ).over(w),
    )
    return attributed.filter(F.col("event_type") == "click").select(
        "event_id",
        "user_id",
        F.col("ts_us").alias("click_ts_us"),
        "last_purchase_ts_us",
    )


_PURCHASE_ATTRIBUTION_ORACLE = """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
),
purchases AS (
  SELECT user_id, ts FROM events WHERE event_type = 'purchase'
)
SELECT c.event_id, c.user_id,
       epoch_us(c.ts) AS click_ts_us,
       epoch_us(p.ts) AS last_purchase_ts_us
FROM clicks c
ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND c.ts > p.ts
"""


def _q_events_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.col("event_type"),
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


def _q_rolling_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day rolling spend per purchase event — the time-series
    rollup shape (event-time RANGE frame). One shuffle on user_id then a
    per-partition sort; the frame is evaluated in a single forward pass
    with a sliding aggregate buffer — no self-join, no per-row rescan, so
    cost is the sort, exactly like the as-of join above, and the output
    stays co-partitioned on user_id for any downstream per-user op. Skew
    is bounded by one user's purchase history. The frame keys on epoch
    millis in BOTH engines so tie handling (RANGE includes peers) is
    engine-identical."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    ms = F.unix_millis(F.col("ts"))
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_ms")
        .rangeBetween(-7 * 86400000, 0)
    )
    return ev.select(
        "event_id", "user_id", ms.alias("ts_ms"), "value"
    ).select(
        "event_id",
        "user_id",
        "ts_ms",
        F.round(F.sum("value").over(w), 2).alias("spend_7d"),
        F.count(F.lit(1)).over(w).alias("n_7d"),
    )


_ROLLING_SPEND_ORACLE = """
SELECT event_id, user_id, epoch_ms(ts) AS ts_ms,
       round(sum(value) OVER w, 2) AS spend_7d,
       CAST(count(*) OVER w AS BIGINT) AS n_7d
FROM events
WHERE event_type = 'purchase'
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
             RANGE BETWEEN 604800000 PRECEDING AND CURRENT ROW)
"""


_EVENTS_DAILY_ORACLE = """
SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       count(*) AS n, round(sum(value), 2) AS total_value
FROM events GROUP BY 1, 2
"""


def _q_events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-volume anomaly flags per event type: a day is anomalous when
    its count exceeds mean + 3·stddev of that type's daily counts; the
    full per-day z-score series is returned (the dashboard relation), with
    the 3σ exceedance as the ``is_alert`` flag.

    Engine-stability is the design constraint: mean and variance derive
    from EXACT integer moments (Σn, Σn², day count — all int64, immune to
    aggregation order), so the double arithmetic that follows is
    bit-identical in both engines and the >-threshold cut cannot flip on
    a low-bit difference the way a distributed Welford stddev could. One
    grouped count + one config-sized (event_type) aggregate + a broadcast
    join back — the monitoring query a pipeline runs after every ingest
    day, at any scale."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias(
                "day"
            ),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("days"),
        F.sum("n").alias("s1"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
    )
    # The moments are exact int64; the ARITHMETIC is double (cast before
    # the products, matching the oracle's CAST(... AS DOUBLE) placement):
    # days*s2 / s1*s1 in int64 would silently wrap (non-ANSI) once a
    # type's total count passes ~3e9 — the double products lose low bits
    # identically in both engines instead of flipping sign in one.
    s1d = F.col("s1").cast("double")
    s2d = F.col("s2").cast("double")
    daysd = F.col("days").cast("double")
    mean = s1d / daysd
    var = (daysd * s2d - s1d * s1d) / (daysd * daysd)
    z = F.floor((F.col("n") - mean) / F.sqrt(var) * 100) / 100
    return (
        daily.join(F.broadcast(stats), "event_type")
        .filter((F.col("days") >= 7) & (var > 0))
        .select(
            "event_type",
            "day",
            "n",
            z.alias("z_score"),
            (F.col("n") > mean + 3 * F.sqrt(var)).alias("is_alert"),
        )
    )


_EVENTS_ANOMALY_ORACLE = """
WITH daily AS (
  SELECT event_type,
         strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         count(*) AS n
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type, count(*) AS days,
         CAST(sum(n) AS BIGINT) AS s1,
         CAST(sum(n * n) AS BIGINT) AS s2
  FROM daily GROUP BY event_type
)
SELECT d.event_type, d.day, d.n,
       floor((d.n - CAST(s1 AS DOUBLE) / days)
             / sqrt((days * CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1)
                    / (CAST(days AS DOUBLE) * days)) * 100) / 100 AS z_score,
       d.n > CAST(s1 AS DOUBLE) / days
             + 3 * sqrt((days * CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1)
                        / (CAST(days AS DOUBLE) * days)) AS is_alert
FROM daily d JOIN stats s USING (event_type)
WHERE days >= 7
  AND (days * CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1)
      / (CAST(days AS DOUBLE) * days) > 0
"""


def _q_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view → click → purchase: a user converts
    at stage k when their FIRST event of each stage is strictly ordered
    (min-timestamp semantics, so the result is replay-order-insensitive).
    One hash aggregation per user then one global fold — at 100 TB both
    are map-side-combinable; no window, no self-join, no sequence scan."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))

    def first_ts(t: str):
        return F.min(F.when(F.col("event_type") == t, us))

    per_user = ev.groupBy("user_id").agg(
        first_ts("view").alias("v"),
        first_ts("click").alias("c"),
        first_ts("purchase").alias("p"),
    )
    one = F.lit(1)
    zero = F.lit(0)
    viewed = F.when(F.col("v").isNotNull(), one).otherwise(zero)
    clicked = F.when(F.col("v") < F.col("c"), one).otherwise(zero)
    purchased = F.when(
        (F.col("v") < F.col("c")) & (F.col("c") < F.col("p")), one
    ).otherwise(zero)
    trunc = lambda c: F.floor(c * 10000) / 10000  # noqa: E731
    agg = per_user.agg(
        F.sum(viewed).alias("n_view"),
        F.sum(clicked).alias("n_view_click"),
        F.sum(purchased).alias("n_view_click_purchase"),
    )
    return agg.select(
        "n_view",
        "n_view_click",
        "n_view_click_purchase",
        trunc(F.col("n_view_click") / F.col("n_view")).alias("click_rate"),
        trunc(
            F.col("n_view_click_purchase") / F.col("n_view_click")
        ).alias("purchase_rate"),
    )


_CONVERSION_FUNNEL_ORACLE = """
WITH per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS v,
         min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS c,
         min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS p
  FROM events GROUP BY 1
),
agg AS (
  SELECT CAST(sum(CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
         CAST(sum(CASE WHEN v < c THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click,
         CAST(sum(CASE WHEN v < c AND c < p THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click_purchase
  FROM per_user
)
SELECT n_view, n_view_click, n_view_click_purchase,
       floor(CAST(n_view_click AS DOUBLE) / n_view * 10000) / 10000 AS click_rate,
       floor(CAST(n_view_click_purchase AS DOUBLE) / n_view_click * 10000) / 10000 AS purchase_rate
FROM agg
"""


def _q_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: a new session starts after a >30min gap — classic
    streaming-style correlation done with window functions in batch."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_millis(F.col("ts")) - F.unix_millis(F.lag("ts").over(w))
    with_gap = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 30 * 60 * 1000), F.lit(1)).otherwise(F.lit(0)),
    )
    sessions = with_gap.withColumn(
        "session_seq",
        F.sum("new_session").over(
            W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
                W.unboundedPreceding, W.currentRow
            )
        ),
    )
    sessions = sessions.withColumn("session_seq", F.col("session_seq").cast("long"))
    return sessions.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("session_value"),
    )


_USER_SESSIONS_ORACLE = """
WITH g AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
                OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT *, CAST(sum(new_session) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS BIGINT) AS session_seq
  FROM g
)
SELECT user_id, session_seq, count(*) AS n_events,
       round(sum(value), 2) AS session_value
FROM s GROUP BY 1, 2
"""


def _q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis basics: token count + char count per document."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "lang",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tokens"),
        F.length("text").alias("len_chars"),
    )


_DOC_STATS_ORACLE = r"""
SELECT doc_id, lang,
       length(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
       length(text) AS len_chars
FROM documents
"""


def _q_doc_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash: md5 groups, keeper = min doc_id."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy(F.md5(F.col("text")).alias("content_hash")).agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min("doc_id").alias("keeper_doc_id"),
    )


_DOC_EXACT_DEDUP_ORACLE = """
SELECT md5(text) AS content_hash, count(*) AS n_copies,
       min(doc_id) AS keeper_doc_id
FROM documents GROUP BY 1
"""


from ph_ee_nats_importer_rdbms_spark.analytics import (  # noqa: E402
    bpe as _bpe,
    classifier as _clf,
    dedup as _dd,
    incremental_curation as _icur,
    incremental_embeddings as _ie,
    multimodal as _mm,
    pii as _pii,
    search as _srch,
    similarity as _sim,
    text as _tx,
    training as _tr,
    versioning as _ver,
)

_QUERY_DEFS: dict[str, tuple[QueryFn, str | None]] = {
    "zeebe_transfers": (_q_transfers, synthetic.TRANSFERS_ORACLE),
    "zeebe_transaction_requests": (
        _q_transaction_requests,
        synthetic.TRANSACTION_REQUESTS_ORACLE,
    ),
    "zeebe_batches": (_q_batches, synthetic.BATCHES_ORACLE),
    "zeebe_variables": (_q_variables, synthetic.VARIABLES_ORACLE),
    "zeebe_tasks": (_q_tasks, synthetic.TASKS_ORACLE),
    # the streaming engine under the driver's gate: same oracles, table
    # store produced by the 3-hop streaming replay (streaming/replay.py)
    "zeebe_transfers_streaming": (
        _q_transfers_streaming,
        synthetic.TRANSFERS_ORACLE,
    ),
    "zeebe_transaction_requests_streaming": (
        _q_transaction_requests_streaming,
        synthetic.TRANSACTION_REQUESTS_ORACLE,
    ),
    "zeebe_batches_streaming": (_q_batches_streaming, synthetic.BATCHES_ORACLE),
    "zeebe_variables_streaming": (
        _q_variables_streaming,
        synthetic.VARIABLES_ORACLE,
    ),
    "zeebe_tasks_streaming": (_q_tasks_streaming, synthetic.TASKS_ORACLE),
    # the NATS wire source as the ingestion edge (r10): same oracle,
    # events consumed via format("nats")/transport=wire — no file bridge
    "zeebe_transfers_streaming_wire": (
        _q_transfers_streaming_wire,
        synthetic.TRANSFERS_ORACLE,
    ),
    # r11: the other four business tables off the SAME wire-fed staged
    # tree (_build_wire materializes all five; registration extends the
    # oracle gate over each table's wire-fed twin at near-zero build cost)
    "zeebe_transaction_requests_streaming_wire": (
        _q_transaction_requests_streaming_wire,
        synthetic.TRANSACTION_REQUESTS_ORACLE,
    ),
    "zeebe_batches_streaming_wire": (
        _q_batches_streaming_wire,
        synthetic.BATCHES_ORACLE,
    ),
    "zeebe_variables_streaming_wire": (
        _q_variables_streaming_wire,
        synthetic.VARIABLES_ORACLE,
    ),
    "zeebe_tasks_streaming_wire": (
        _q_tasks_streaming_wire,
        synthetic.TASKS_ORACLE,
    ),
    "zeebe_routing": (_q_routing, synthetic.ROUTING_ORACLE),
    "transfers_range_filter": (_q_transfers_range, _TRANSFERS_RANGE_ORACLE),
    "transfer_detail_join": (_q_transfer_detail, _TRANSFER_DETAIL_ORACLE),
    "transfer_detail_rows": (_q_transfer_detail_rows, _TRANSFER_DETAIL_ROWS_ORACLE),
    "instance_lookup": (_q_instance_lookup, _INSTANCE_LOOKUP_ORACLE),
    "businesskey_lookup": (_q_businesskey_lookup, _BUSINESSKEY_LOOKUP_ORACLE),
    "tenant_lookup": (_q_tenant_lookup, _TENANT_LOOKUP_ORACLE),
    "pricing_summary": (_q_pricing_summary, _PRICING_SUMMARY_ORACLE),
    "revenue_by_nation": (_q_revenue_by_nation, _REVENUE_BY_NATION_ORACLE),
    "top_parts": (_q_top_parts, _TOP_PARTS_ORACLE),
    "order_priority_late": (_q_order_priority_late, _ORDER_PRIORITY_LATE_ORACLE),
    "customers_without_orders": (
        _q_customers_without_orders,
        _CUSTOMERS_WITHOUT_ORDERS_ORACLE,
    ),
    "revenue_rollup": (_q_revenue_rollup, _REVENUE_ROLLUP_ORACLE),
    "purchase_attribution": (
        _q_purchase_attribution,
        _PURCHASE_ATTRIBUTION_ORACLE,
    ),
    "events_daily": (_q_events_daily, _EVENTS_DAILY_ORACLE),
    "rolling_spend": (_q_rolling_spend, _ROLLING_SPEND_ORACLE),
    "user_sessions": (_q_user_sessions, _USER_SESSIONS_ORACLE),
    "conversion_funnel": (_q_conversion_funnel, _CONVERSION_FUNNEL_ORACLE),
    "doc_stats": (_q_doc_stats, _DOC_STATS_ORACLE),
    "doc_exact_dedup": (_q_doc_exact_dedup, _DOC_EXACT_DEDUP_ORACLE),
    # --- text analysis (analytics/text.py) ---
    "token_counts": (_tx.q_token_counts, _tx.TOKEN_COUNTS_ORACLE),
    "lang_id": (_tx.q_lang_id, _tx.LANG_ID_ORACLE),
    "doc_quality": (_tx.q_quality, _tx.QUALITY_ORACLE),
    "doc_fingerprints": (_tx.q_fingerprints, _tx.FINGERPRINTS_ORACLE),
    "doc_repetition": (_tx.q_repetition, _tx.REPETITION_ORACLE),
    "dup_ngram_frac": (_tx.q_dup_ngram_frac, _tx.DUP_NGRAM_FRAC_ORACLE),
    # --- dedup (analytics/dedup.py) ---
    "minhash_signatures": (_dd.q_minhash_signatures, _dd.MINHASH_SIGNATURES_ORACLE),
    "minhash_dups": (_dd.q_minhash_dups, _dd.MINHASH_DUPS_ORACLE),
    "dup_clusters": (_dd.q_dup_clusters, _dd.DUP_CLUSTERS_ORACLE),
    # store-backed read-path twins, served from the staged CURATION
    # store (which embeds a complete doc near-dup store — one staged
    # tree, no duplicate shingle/minhash/band build)
    "minhash_dups_store": (
        _icur.q_minhash_dups_store,
        _dd.MINHASH_DUPS_ORACLE,
    ),
    "dup_clusters_store": (
        _icur.q_dup_clusters_store,
        _dd.DUP_CLUSTERS_ORACLE,
    ),
    "simhash": (_dd.q_simhash, _dd.SIMHASH_ORACLE),
    "simhash_dups": (_dd.q_simhash_dups, _dd.SIMHASH_DUPS_ORACLE),
    "ngram_jaccard": (_dd.q_ngram_jaccard, _dd.NGRAM_JACCARD_ORACLE),
    "embedding_dups": (_dd.q_embedding_dups, _dd.EMBEDDING_DUPS_ORACLE),
    "embedding_dup_clusters": (
        _dd.q_embedding_dup_clusters,
        _dd.EMBEDDING_DUP_CLUSTERS_ORACLE,
    ),
    # store-backed read-path twins: the staged INCREMENTAL embedding
    # store's committed pairs/labels, which append-equals-rebuild makes
    # exactly the from-scratch outputs — same oracles gate both paths
    "embedding_dups_store": (
        _ie.q_embedding_dups_store,
        _dd.EMBEDDING_DUPS_ORACLE,
    ),
    "embedding_dup_clusters_store": (
        _ie.q_embedding_dup_clusters_store,
        _dd.EMBEDDING_DUP_CLUSTERS_ORACLE,
    ),
    # --- similarity search (analytics/similarity.py) ---
    "ann_bruteforce": (_sim.q_ann_bruteforce, _sim.ANN_BRUTEFORCE_ORACLE),
    "ann_lsh": (_sim.q_ann_lsh, _sim.ANN_LSH_ORACLE),
    "ann_lsh_multi": (_sim.q_ann_lsh_multi, _sim.ANN_LSH_MULTI_ORACLE),
    "ann_ivf": (_sim.q_ann_ivf, _sim.ANN_IVF_ORACLE),
    "ann_pq": (_sim.q_ann_pq, _sim.ANN_PQ_ORACLE),
    "ann_ivf_pq": (_sim.q_ann_ivf_pq, _sim.ANN_IVF_PQ_ORACLE),
    "ann_search_pq": (_sim.q_ann_search_pq, _sim.ANN_SEARCH_PQ_ORACLE),
    "ann_search_ivf_pq": (
        _sim.q_ann_search_ivf_pq,
        _sim.ANN_SEARCH_IVF_PQ_ORACLE,
    ),
    "ann_search_store": (
        _sim.q_ann_search_store,
        _sim.ANN_SEARCH_STORE_ORACLE,
    ),
    "ann_recall": (_sim.q_ann_recall, _sim.ANN_RECALL_ORACLE),
    "semantic_sample": (_sim.q_semantic_sample, _sim.SEMANTIC_SAMPLE_ORACLE),
    # SemDeDup (cluster-then-dedup over the staged IVF index)
    "semdedup": (_sim.q_semdedup, _sim.SEMDEDUP_ORACLE),
    "embedding_outliers": (
        _sim.q_embedding_outliers,
        _sim.EMBEDDING_OUTLIERS_ORACLE,
    ),
    # --- training-data pipeline (analytics/training.py) ---
    "train_test_split": (_tr.q_train_test_split, _tr.TRAIN_TEST_SPLIT_ORACLE),
    "leakage_safe_split": (
        _tr.q_leakage_safe_split,
        _tr.LEAKAGE_SAFE_SPLIT_ORACLE,
    ),
    # oracle-faithful twin; _capped below is the production default (skew
    # bounded at DECON_MAX_DF² per shuffle key — see training.py docstring)
    "decontamination": (_tr.q_decontamination, _tr.DECONTAMINATION_ORACLE),
    "decontamination_fuzzy": (
        _tr.q_decontamination_fuzzy,
        _tr.DECONTAMINATION_FUZZY_ORACLE,
    ),
    "decontamination_capped": (
        _tr.q_decontamination_capped,
        _tr.DECONTAMINATION_CAPPED_ORACLE,
    ),
    "length_percentiles": (_tr.q_length_percentiles, _tr.LENGTH_PERCENTILES_ORACLE),
    # GK sketch: its VALUES have no DuckDB twin (compaction-order
    # dependent), but its rank GUARANTEE is deterministic — the entry
    # verifies the bound distributed and emits verdict booleans the
    # oracle pins to TRUE, so rows+schema+hash are all checkable
    # (VERDICT r8 task #2; raw values via q_length_percentiles_approx)
    "length_percentiles_approx": (
        _tr.q_length_percentiles_approx_check,
        _tr.LENGTH_PERCENTILES_APPROX_CHECK_ORACLE,
    ),
    "balanced_sample": (_tr.q_balanced_sample, _tr.BALANCED_SAMPLE_ORACLE),
    "pack_sequences": (_tr.q_pack_sequences, _tr.PACK_SEQUENCES_ORACLE),
    "mixture_sample": (_tr.q_mixture_sample, _tr.MIXTURE_SAMPLE_ORACLE),
    "importance_sample": (
        _tr.q_importance_sample,
        _tr.IMPORTANCE_SAMPLE_ORACLE,
    ),
    "unigram_logprob": (_tr.q_unigram_logprob, _tr.UNIGRAM_LOGPROB_ORACLE),
    "corpus_diff": (_ver.q_corpus_diff, _ver.CORPUS_DIFF_ORACLE),
    "chunk_documents": (_tx.q_chunk_documents, _tx.CHUNK_DOCUMENTS_ORACLE),
    "events_anomaly": (_q_events_anomaly, _EVENTS_ANOMALY_ORACLE),
    "pii_redact": (_pii.q_pii_redact, _pii.PII_REDACT_ORACLE),
    "pii_redact_docs": (_pii.q_pii_redact_docs, _pii.PII_REDACT_DOCS_ORACLE),
    "curation": (_tx.q_curation, _tx._curation_oracle()),
    "corpus_report": (_tx.q_corpus_report, _tx._corpus_report_oracle()),
    # store-backed read-path twins (staged incremental curation store):
    # committed per-delivery metrics/partials/labels served through the
    # SAME cascade/aggregate/top-k code as the staged-dataset entries,
    # so the same oracles gate both paths
    "curation_store": (_icur.q_curation_store, _tx._curation_oracle()),
    "corpus_report_store": (
        _icur.q_corpus_report_store,
        _tx._corpus_report_oracle(),
    ),
    "vocabulary_store": (_icur.q_vocabulary_store, _tx.VOCABULARY_ORACLE),
    "dedup_spans": (_tx.q_dedup_spans, _tx.DEDUP_SPANS_ORACLE),
    "vocabulary": (_tx.q_vocabulary, _tx.VOCABULARY_ORACLE),
    "token_ids": (_tx.q_token_ids, _tx.TOKEN_IDS_ORACLE),
    # subword tokenizer: iteration-0 pair statistic + frozen-merge encode
    # (the merge table itself is trained distributed — analytics/bpe.py)
    "bpe_pair_counts": (_bpe.q_bpe_pair_counts, _bpe.BPE_PAIR_COUNTS_ORACLE),
    "bpe_encode": (_bpe.q_bpe_encode, _bpe.BPE_ENCODE_ORACLE),
    # weak-label NB distillation of the heuristic quality score
    # (frozen integer-micro weights — analytics/classifier.py)
    "quality_classifier": (
        _clf.q_quality_classifier,
        _clf.QUALITY_CLASSIFIER_ORACLE,
    ),
    # lexical retrieval (BM25 top-k; the keyword twin of ann_search)
    "bm25_search": (_srch.q_bm25_search, _srch.BM25_SEARCH_ORACLE),
    # store-backed twin: postings/lengths maintained per delivery by the
    # curation store, scored through the SAME _bm25_score at read
    "bm25_search_store": (
        _srch.q_bm25_search_store,
        _srch.BM25_SEARCH_ORACLE,
    ),
    "source_stats": (_tx.q_source_stats, _tx.SOURCE_STATS_ORACLE),
    # --- multimodal (analytics/multimodal.py) ---
    "media_features": (_mm.q_media_features, _mm.MEDIA_FEATURES_ORACLE),
    "media_summary": (_mm.q_media_summary, _mm.MEDIA_SUMMARY_ORACLE),
}

# ---------------------------------------------------------------------------
# Driver-snapshot ROTATION (the standing policy, VERDICT r6 task #2). The
# per-round correctness driver snapshots the registry in insertion order
# with a cap (observed: 50 rows), so with 70+ entries some ship each round
# without a fresh driver CORRECTNESS row. Rounds 3-6 hand-curated a
# promotion list; the policy is now COMPUTED: order the registry by
# STALENESS — entries that have never had a driver row first, then
# ascending round-of-last-driver-row, ties in family (definition) order.
# With cap C >= half the registry, every entry gets a driver row at least
# every 2 rounds (the ones a round misses are the freshest — next round
# they are the stalest and lead the snapshot).
# The staleness input — entry -> latest round whose CORRECTNESS_r{N}.json
# carries it (absent = never) — is DERIVED from the repo's artifacts at
# import time (VERDICT r7 task #1). Rounds 3-7 kept a static copy, which
# was guaranteed stale the moment the driver dropped a fresh artifact
# (post-dating the builder's last commit) — so the suite was red at the
# exact moment it was judged. The artifacts ARE the table now; the tests
# keep asserting the monotone order + cap-coverage invariants.
# The full registry is additionally gated by tests/test_full_registry.py
# (every entry vs its DuckDB oracle at sf0.01 on every pytest run), so
# entries past the driver cap cannot regress silently either way.
# ---------------------------------------------------------------------------

DRIVER_ROW_CAP = 50

_REPO_ROOT = _os.path.dirname(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)


def derive_driver_row_last_round(artifact_dir: str | None = None) -> dict[str, int]:
    """Entry -> latest round N whose ``CORRECTNESS_r{N}.json`` carries it,
    read straight from the driver's artifacts (default: the repo root;
    override for tests simulating future rounds). Unreadable or non-dict
    artifacts are skipped — a half-written driver file must not break
    package import."""
    import glob
    import json
    import os
    import re

    if artifact_dir is None:
        artifact_dir = os.environ.get("SPARK_GRAFT_ARTIFACT_DIR", _REPO_ROOT)
    last: dict[str, int] = {}
    for p in sorted(glob.glob(os.path.join(artifact_dir, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)", os.path.basename(p))
        if m is None:
            continue
        rnd = int(m.group(1))
        try:
            with open(p) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for k in data:
            last[k] = max(last.get(k, -1), rnd)
    return last


_FAMILY_ORDER = {n: i for i, n in enumerate(_QUERY_DEFS)}


# ---------------------------------------------------------------------------
# Registry-wide PLAN memoization (r13, guide §1.2 "per-task work"): a
# registry entry is a pure function of (session, dataset, the staging
# domains' data+code fingerprints), and its DataFrame CONSTRUCTION —
# spark.read schema resolution, py4j expression round trips, probe/LUT
# collects — measured 0.2-1.3 s per call on the mid-table entries, often
# more than their warm EXECUTION. The constructed DataFrame is therefore
# memoized per (applicationId, entry, dataset, cache root, all domain
# fingerprints) — the generalization of analytics/similarity._memo_plan,
# which pioneered the pattern for the ANN entries (VERDICT r12 endorsed
# it and asked for the memo-hit numbers to be the recorded ones). This
# caches PLANS only: every invocation still computes results from the
# parquet inputs — nothing about the data path is cached across runs,
# and any module edit or dataset regeneration re-keys via the
# fingerprints.
# ---------------------------------------------------------------------------

_ENTRY_MEMO: dict[tuple, DataFrame] = {}


def _entry_key(spark: SparkSession, name: str, sf_dir: str) -> tuple:
    from ph_ee_nats_importer_rdbms_spark.plans import staging as _st

    def _fp(domain: str) -> str:
        # Partial dataset dirs are a supported call shape (an entry only
        # reads the tables it names — e.g. a caller hands a dir with just
        # events.parquet to an events query): a domain whose sources are
        # missing keys as a sentinel instead of failing the whole entry,
        # and still re-keys the moment the source appears.
        try:
            return _st.fingerprint(sf_dir, domain)
        except OSError:
            return f"absent:{domain}"

    return (
        spark.sparkContext.applicationId,
        name,
        _os.path.abspath(sf_dir),
        _st.cache_root(),
        tuple(_fp(d) for d in _st._DOMAINS),
    )


def _memo_entry(name: str, fn: QueryFn) -> QueryFn:
    import functools

    @functools.wraps(fn)
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        key = _entry_key(spark, name, sf_dir)
        hit = _ENTRY_MEMO.get(key)
        if hit is not None:
            return hit
        out = fn(spark, sf_dir)
        # purge superseded same-(session, entry, dataset) keys and every
        # foreign-session key (unservable by construction — same
        # discipline as similarity._PLAN_MEMO post r13 fix)
        for k in [
            k
            for k in _ENTRY_MEMO
            if (k[:3] == key[:3] or k[0] != key[0]) and k != key
        ]:
            del _ENTRY_MEMO[k]
        _ENTRY_MEMO[key] = out
        return out

    return wrapped


def order_registry(
    last_round: dict[str, int],
) -> dict[str, tuple[QueryFn, str | None]]:
    """Registry in driver-snapshot order: never-rowed entries first, then
    ascending round-of-last-driver-row, ties in family (definition) order.
    With cap C >= half the registry this bounds any entry's driver-row gap
    at 2 rounds."""
    return {
        n: (_memo_entry(n, _QUERY_DEFS[n][0]), _QUERY_DEFS[n][1])
        for n in sorted(
            _QUERY_DEFS,
            key=lambda n: (last_round.get(n, -1), _FAMILY_ORDER[n]),
        )
    }


_DRIVER_ROW_LAST_ROUND: dict[str, int] = derive_driver_row_last_round()

QUERIES: dict[str, tuple[QueryFn, str | None]] = order_registry(
    _DRIVER_ROW_LAST_ROUND
)
