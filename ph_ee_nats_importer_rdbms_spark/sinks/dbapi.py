"""DBAPI executors for the JDBC-shaped sink (sinks/jdbc.py).

The reference writes through JPA to MySQL (DataSourcePerTenantService.java:
64-128); the Spark sink keeps statement GENERATION separate from EXECUTION
behind the ``Executor`` callable so the execution backend is swappable:

- ``jvm_executor`` (jdbc.py): java.sql.DriverManager via py4j — any JDBC
  driver on the classpath, but driver-side only (py4j can't run on
  workers).
- This module: plain Python DBAPI executors. They are PICKLABLE (module-
  level classes holding only plain data), so they work with
  ``changes_foreach_batch(distributed=True)`` where the executor ships to
  the workers inside the foreachPartition closure — the 100 TB fan-out
  path.

``SqliteExecutor`` doubles as the integration backend for tests: sqlite is
in the standard library, and the ``sqlite`` dialect of ``upsert_sql``
(``INSERT .. ON CONFLICT DO UPDATE``) gives real-database coverage of the
MERGE semantics (AbstractPersistableCustom.java:34-52: save = insert or
update by key) without a MySQL server in the container.
"""

from __future__ import annotations


class SqliteExecutor:
    """Executor writing to sqlite databases; ``url`` is a filesystem path
    (or ``sqlite:///path``). One connection + one transaction per call,
    mirroring jvm_executor's per-batch commit
    (DataSourcePerTenantService.java:104)."""

    @staticmethod
    def _path(url: str) -> str:
        return url[len("sqlite:///"):] if url.startswith("sqlite:///") else url

    def __call__(self, url: str, statements: list[tuple[str, list[tuple]]]) -> None:
        import sqlite3

        conn = sqlite3.connect(self._path(url), timeout=60)
        try:
            cur = conn.cursor()
            for sql, rows in statements:
                if rows and any(len(r) for r in rows):
                    cur.executemany(sql, rows)
                else:
                    cur.execute(sql)
            conn.commit()
        finally:
            conn.close()

    def fetchall(self, url: str, sql: str) -> list[tuple]:
        """Test/verification helper: run one query, return all rows."""
        import sqlite3

        conn = sqlite3.connect(self._path(url), timeout=60)
        try:
            return conn.execute(sql).fetchall()
        finally:
            conn.close()
