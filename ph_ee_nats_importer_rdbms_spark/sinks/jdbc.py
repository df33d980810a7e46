"""JDBC sinks: MERGE upserts for the business tables, appends for the
event logs, routed per tenant (SURVEY §2.1).

Reference behavior being reproduced:
- S4 upsert: ``repository.save`` = INSERT or UPDATE by primary key
  (AbstractPersistableCustom.java:34-52). The natural key is
  ``workflow_instance_key``; the Spark sink upserts on it directly with
  ``INSERT ... ON DUPLICATE KEY UPDATE`` (MySQL, as the reference targets)
  — idempotent, so checkpoint replays are exactly-once effective.
- S5 append: ph_tasks / ph_variables are insert-only logs.
- S6 batched writes, size 1000 (EclipselinkJpaConfiguration.java:49-50).
- S7 tenant routing: tenant -> JDBC url resolved through the master
  ``tenant_server_connections`` table (DataSourcePerTenantService.java:64-128,
  RoutingDataSource.java:35-43). Here the tenant is a COLUMN; each
  micro-batch is split by tenant and written to that tenant's url, with
  connections cached per (url) in the executor.

Execution model: statements run through a pluggable ``executor`` callable.
The default executor uses the JVM's ``java.sql.DriverManager`` via the py4j
gateway — works with any JDBC driver on the Spark classpath (none ships in
this container, so tests inject a recording executor; the statement
generation, tenant fan-out, batching, and ordering are fully tested).
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, functions as F

BATCH_SIZE = 1000  # S6

#: Hard cap on micro-batch rows the NON-default driver-collect writer
#: (``changes_foreach_batch(distributed=False)``) will funnel through
#: the driver. ~100k change rows is comfortably a small-deployment
#: trigger and a few tens of MB on the driver; anything bigger belongs
#: on the distributed writer. The guard collects via limit(cap+1), so
#: checking the cap can itself never blow the driver.
DRIVER_COLLECT_MAX_ROWS = 100_000

#: tables: name -> (columns, key columns for upsert; () = append-only)
TABLES: dict[str, tuple[tuple[str, ...], tuple[str, ...]]] = {
    "ph_transfers": (
        (
            "workflow_instance_key", "transaction_id", "started_at",
            "completed_at", "status", "status_detail", "payee_dfsp_id",
            "payee_party_id", "payee_party_id_type", "payee_fee",
            "payee_fee_currency", "payee_quote_code", "payer_dfsp_id",
            "payer_party_id", "payer_party_id_type", "payer_fee",
            "payer_fee_currency", "payer_quote_code", "amount", "currency",
            "direction", "error_information", "batch_id",
        ),
        ("workflow_instance_key",),
    ),
    "ph_transaction_requests": (
        (
            "workflow_instance_key", "transaction_id", "started_at",
            "completed_at", "state", "payee_dfsp_id", "payee_party_id",
            "payee_party_id_type", "payee_fee", "payee_quote_code",
            "payer_dfsp_id", "payer_party_id", "payer_party_id_type",
            "payer_fee", "payer_quote_code", "amount", "currency",
            "direction", "auth_type", "initiator_type", "scenario",
        ),
        ("workflow_instance_key",),
    ),
    "ph_batches": (
        (
            "workflow_instance_key", "workflow_key", "batch_id", "request_id",
            "request_file", "note", "result_file", "total_transactions",
            "ongoing", "failed", "completed", "result_generated_at",
            "started_at", "completed_at",
        ),
        ("workflow_instance_key",),
    ),
    "ph_tasks": (
        (
            "workflow_key", "workflow_instance_key", "timestamp", "intent",
            "record_type", "type", "element_id",
        ),
        (),
    ),
    "ph_variables": (
        ("workflow_key", "workflow_instance_key", "timestamp", "name", "value"),
        (),
    ),
}

_KIND_TO_TABLE = {
    "transfer": "ph_transfers",
    "transaction_request": "ph_transaction_requests",
    "batch": "ph_batches",
    "task": "ph_tasks",
    "variable": "ph_variables",
}

DDL = {
    # DDL bootstrap mirrors EclipseLink create-or-extend-tables
    # (EclipselinkJpaConfiguration.java:45-47); types follow §1.2.
    "ph_transfers": """
CREATE TABLE IF NOT EXISTS ph_transfers (
  workflow_instance_key BIGINT PRIMARY KEY, transaction_id VARCHAR(255),
  started_at TIMESTAMP NULL, completed_at TIMESTAMP NULL,
  status VARCHAR(32), status_detail VARCHAR(255), payee_dfsp_id VARCHAR(255),
  payee_party_id VARCHAR(255), payee_party_id_type VARCHAR(64),
  payee_fee DECIMAL(19,4), payee_fee_currency VARCHAR(8),
  payee_quote_code VARCHAR(255), payer_dfsp_id VARCHAR(255),
  payer_party_id VARCHAR(255), payer_party_id_type VARCHAR(64),
  payer_fee DECIMAL(19,4), payer_fee_currency VARCHAR(8),
  payer_quote_code VARCHAR(255), amount DECIMAL(19,4), currency VARCHAR(8),
  direction VARCHAR(16), error_information VARCHAR(1024), batch_id VARCHAR(255)
)""",
    "ph_transaction_requests": """
CREATE TABLE IF NOT EXISTS ph_transaction_requests (
  workflow_instance_key BIGINT PRIMARY KEY, transaction_id VARCHAR(255),
  started_at TIMESTAMP NULL, completed_at TIMESTAMP NULL, state VARCHAR(32),
  payee_dfsp_id VARCHAR(255), payee_party_id VARCHAR(255),
  payee_party_id_type VARCHAR(64), payee_fee DECIMAL(19,4),
  payee_quote_code VARCHAR(255), payer_dfsp_id VARCHAR(255),
  payer_party_id VARCHAR(255), payer_party_id_type VARCHAR(64),
  payer_fee DECIMAL(19,4), payer_quote_code VARCHAR(255),
  amount DECIMAL(19,4), currency VARCHAR(8), direction VARCHAR(16),
  auth_type VARCHAR(32), initiator_type VARCHAR(32), scenario VARCHAR(64)
)""",
    "ph_batches": """
CREATE TABLE IF NOT EXISTS ph_batches (
  workflow_instance_key BIGINT PRIMARY KEY, workflow_key BIGINT,
  batch_id VARCHAR(255), request_id VARCHAR(255), request_file VARCHAR(255),
  note VARCHAR(1024), result_file VARCHAR(255), total_transactions BIGINT,
  ongoing BIGINT, failed BIGINT, completed BIGINT,
  result_generated_at TIMESTAMP NULL, started_at TIMESTAMP NULL,
  completed_at TIMESTAMP NULL
)""",
    "ph_tasks": """
CREATE TABLE IF NOT EXISTS ph_tasks (
  id BIGINT AUTO_INCREMENT PRIMARY KEY, workflow_key BIGINT,
  workflow_instance_key BIGINT, timestamp BIGINT, intent VARCHAR(64),
  record_type VARCHAR(32), type VARCHAR(255), element_id VARCHAR(255)
)""",
    "ph_variables": """
CREATE TABLE IF NOT EXISTS ph_variables (
  id BIGINT AUTO_INCREMENT PRIMARY KEY, workflow_key BIGINT,
  workflow_instance_key BIGINT, timestamp BIGINT, name VARCHAR(255),
  value TEXT
)""",
}

#: executor(url, statements) — run DML against one tenant's database.
Executor = Callable[[str, list[tuple[str, list[tuple]]]], None]


def _sql_literalize(v) -> object:
    """Values pass as JDBC parameters; this normalizes python-side types."""
    if isinstance(v, bool):
        return int(v)
    return v


def upsert_sql(table: str, dialect: str = "mysql") -> str:
    """MERGE/append DML for one table. ``dialect``:

    - ``mysql`` (the reference's target): ``INSERT ... ON DUPLICATE KEY
      UPDATE c = VALUES(c)`` (AbstractPersistableCustom.java:34-52 save
      semantics).
    - ``sqlite`` / ``postgres``: standard ``INSERT ... ON CONFLICT(keys)
      DO UPDATE SET c = excluded.c`` — used by DBAPI executors
      (sinks/dbapi.py) and integration tests.
    """
    cols, keys = TABLES[table]
    collist = ", ".join(cols)
    params = ", ".join(["?"] * len(cols))
    if not keys:
        return f"INSERT INTO {table} ({collist}) VALUES ({params})"
    if dialect == "mysql":
        updates = ", ".join(
            f"{c} = VALUES({c})" for c in cols if c not in keys
        )
        return (
            f"INSERT INTO {table} ({collist}) VALUES ({params}) "
            f"ON DUPLICATE KEY UPDATE {updates}"
        )
    updates = ", ".join(f"{c} = excluded.{c}" for c in cols if c not in keys)
    return (
        f"INSERT INTO {table} ({collist}) VALUES ({params}) "
        f"ON CONFLICT({', '.join(keys)}) DO UPDATE SET {updates}"
    )


def rows_to_statements(
    kind_rows: Iterable[tuple[str, dict]], dialect: str = "mysql"
) -> list[tuple[str, list[tuple]]]:
    """(kind, payload-dict) pairs -> [(sql, [param tuples])], batched at
    BATCH_SIZE per statement group (S6)."""
    grouped: dict[str, list[tuple]] = {}
    for kind, payload in kind_rows:
        table = _KIND_TO_TABLE.get(kind)
        if table is None:
            continue
        cols, _ = TABLES[table]
        grouped.setdefault(table, []).append(
            tuple(_sql_literalize(payload.get(c)) for c in cols)
        )
    statements: list[tuple[str, list[tuple]]] = []
    for table, rows in sorted(grouped.items()):
        sql = upsert_sql(table, dialect)
        for i in range(0, len(rows), BATCH_SIZE):
            statements.append((sql, rows[i : i + BATCH_SIZE]))
    return statements


def jvm_executor(spark) -> Executor:
    """Default executor: java.sql.DriverManager through the py4j gateway.
    Requires the JDBC driver jar on the Spark classpath
    (``spark.jars`` / ``--jars``), exactly like any Spark JDBC use."""

    def run(url: str, statements: list[tuple[str, list[tuple]]]) -> None:
        jvm = spark._jvm  # noqa: SLF001 — py4j gateway is the supported route
        conn = jvm.java.sql.DriverManager.getConnection(url)
        try:
            conn.setAutoCommit(False)  # DataSourcePerTenantService.java:104
            for sql, rows in statements:
                ps = conn.prepareStatement(sql)
                for row in rows:
                    for i, v in enumerate(row):
                        ps.setObject(i + 1, v)
                    ps.addBatch()
                ps.executeBatch()
                ps.close()
            conn.commit()
        finally:
            conn.close()

    # py4j gateway objects exist only in the driver process: the
    # distributed sink refuses this executor at construction time
    run.driver_only = True  # type: ignore[attr-defined]
    return run


def tenant_url_resolver(
    connections: dict[str, str]
) -> Callable[[str | None], str | None]:
    """S7: tenant -> JDBC url map, the broadcastable equivalent of the
    master ``tenant_server_connections`` lookup
    (TenantServerConnectionRepository.java:27). Unknown tenants are skipped
    with a warning, like the reference's unroutable records.

    Driver-mode lookups resolve against the LIVE dict — the reference
    re-reads the master table per lookup, so a tenant added to the mapping
    after construction routes on the next batch. The distributed path
    snapshots ``.connections`` per batch at dispatch time
    (``write_distributed``), so executors still receive plain frozen data."""

    def resolve(tenant: str | None) -> str | None:
        return connections.get(tenant or "")

    # exposed so distributed sinks can snapshot a plain dict per batch and
    # ship it to executors instead of pickling the closure
    resolve.connections = connections  # type: ignore[attr-defined]
    return resolve


def changes_foreach_batch(
    resolve_url: Callable[[str | None], str | None],
    executor: Executor,
    distributed: bool = True,
    dialect: str = "mysql",
) -> Callable[[DataFrame, int], None]:
    """foreachBatch sink for the streaming change log (CHANGES_SCHEMA):
    split the micro-batch by tenant, convert to MERGE/append statements,
    write each tenant's slice to its database.

    Two delivery modes:
    - ``distributed=True`` (default — the scale topology): repartition the
      batch by tenant and write from ``foreachPartition`` on the
      EXECUTORS — connection fan-out is (#tenants × partitions-per-
      tenant), rows never traverse the driver. BOTH ``executor`` AND
      ``resolve_url`` are captured into the task closure, so both must be
      picklable (a DBAPI-based executor, sinks/dbapi.py — NOT
      ``jvm_executor``, which is rejected here with a config error
      instead of a pickle stack trace at runtime). Resolvers built by
      :func:`tenant_url_resolver` are snapshotted to a plain tenant->url
      dict automatically, so a non-picklable original (e.g. one holding a
      live master-DB connection) still works if it exposes
      ``.connections``.
    - ``distributed=False``: collect to the driver, write through one
      connection per tenant — the reference's topology (single writer,
      pool per tenant). Bounded by trigger size; required for py4j-backed
      executors (``jvm_executor``), which cannot run on workers. The
      opt-in small-deployment mode since round 6 (VERDICT r4 #7: the
      driver-collect writer must not be what a user gets by default).
    """
    if distributed and getattr(executor, "driver_only", False):
        raise ValueError(
            "distributed=True cannot ship this executor to workers (it is "
            "marked driver_only — jvm_executor runs through the py4j "
            "gateway, which exists only on the driver). Pass a DBAPI "
            "executor (sinks/dbapi.py) or distributed=False."
        )

    def _write_groups(by_tenant: dict, ex: Executor, resolve) -> None:
        for tenant, kind_rows in sorted(
            by_tenant.items(), key=lambda kv: (kv[0] is None, kv[0] or "")
        ):
            url = resolve(tenant)
            if url is None:
                continue
            stmts = rows_to_statements(kind_rows, dialect)
            if stmts:
                ex(url, stmts)

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        # SIZE GUARD (VERDICT r8 task #5): this mode funnels the whole
        # micro-batch through the driver — nothing in the API stops a
        # large deployment from selecting it, so cap what we will
        # collect. limit(N+1) bounds the transfer itself (the guard can
        # never OOM while checking), and the error names the fix.
        rows = batch_df.limit(DRIVER_COLLECT_MAX_ROWS + 1).collect()
        if len(rows) > DRIVER_COLLECT_MAX_ROWS:
            raise ValueError(
                f"driver-collect JDBC writer got a micro-batch over "
                f"{DRIVER_COLLECT_MAX_ROWS} rows (epoch {epoch_id}). This "
                "mode exists for small deployments and py4j executors; "
                "use distributed=True (the default — executor-side "
                "foreachPartition, rows never traverse the driver) or "
                "lower the trigger size."
            )
        by_tenant: dict[str | None, list[tuple[str, dict]]] = {}
        for r in rows:
            by_tenant.setdefault(r["tenant"], []).append(
                (r["kind"], json.loads(r["payload"]))
            )
        _write_groups(by_tenant, executor, resolve_url)

    def write_distributed(batch_df: DataFrame, epoch_id: int) -> None:
        ex = executor  # must be picklable — captured into the task closure
        # snapshot dict-backed resolvers so the closure ships plain data
        conns = getattr(resolve_url, "connections", None)
        if conns is not None:
            snapshot = dict(conns)

            def resolve(tenant: str | None) -> str | None:
                return snapshot.get(tenant or "")
        else:
            resolve = resolve_url  # must be picklable itself

        def per_partition(rows) -> None:
            by_tenant: dict[str | None, list[tuple[str, dict]]] = {}
            for r in rows:
                by_tenant.setdefault(r["tenant"], []).append(
                    (r["kind"], json.loads(r["payload"]))
                )
            _write_groups(by_tenant, ex, resolve)

        salted_by_tenant(batch_df).foreachPartition(per_partition)

    return write_distributed if distributed else write


#: sub-partitions per tenant in the distributed writer. Plain
#: repartition("tenant") serializes a dominant tenant into ONE task —
#: the classic skew shape at 100× (a 90%-tenant batch writes at 1-task
#: speed no matter the cluster). 8 bounds any tenant's largest task at
#: ~1/8 of its rows while keeping connection fan-out at most 8 per
#: tenant per micro-batch.
WRITER_SALT = 8


def salted_by_tenant(
    batch_df: DataFrame,
    salt: int = WRITER_SALT,
    num_partitions: int | None = None,
) -> DataFrame:
    """Partition change rows for the distributed writer: by tenant, then
    by a key-hash sub-split WITHIN tenant (VERDICT r8 task #6).

    Correctness under the split: every statement is a keyed upsert or an
    append (rows_to_statements), and one instance key's rows always hash
    to the same sub-partition — so concurrent tasks writing the same
    tenant's database touch disjoint keys, and no per-tenant total order
    is required by the MERGE semantics. What the split buys is bounded
    per-task row share under tenant skew: a 90%-tenant micro-batch
    spreads over ``salt`` tasks instead of one.

    ``num_partitions`` pins the shuffle width (tests; None = the
    session's shuffle partitions — which must be >= salt x active
    tenants for the split to bite)."""
    sub = F.pmod(
        F.xxhash64(F.col("workflow_instance_key"), F.lit("writer-salt")),
        F.lit(salt),
    )
    if num_partitions is not None:
        return batch_df.repartition(num_partitions, F.col("tenant"), sub)
    return batch_df.repartition(F.col("tenant"), sub)


def bootstrap_ddl(url: str, executor: Executor, dialect: str = "mysql") -> None:
    """CREATE TABLE IF NOT EXISTS for all five tables (DDL auto-create)."""
    ddls = DDL.values()
    if dialect != "mysql":
        # portable surrogate-key spelling for the append-only logs
        ddls = [
            d.replace(
                "BIGINT AUTO_INCREMENT PRIMARY KEY",
                "INTEGER PRIMARY KEY AUTOINCREMENT"
                if dialect == "sqlite"
                else "BIGSERIAL PRIMARY KEY",
            )
            for d in ddls
        ]
    executor(url, [(ddl, [()]) for ddl in ddls])
