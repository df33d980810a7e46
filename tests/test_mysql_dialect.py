"""Statement-level golden tests for the MySQL upsert dialect.

No MySQL server exists in this container (the sqlite integration test,
tests/test_jdbc_sqlite.py, proves MERGE + restart semantics against a
real database), so the exact ``INSERT ... ON DUPLICATE KEY UPDATE`` text
the sink would send to the reference's actual target — MySQL, via
Spring's repository.save() = insert-or-update-by-id
(AbstractPersistableCustom.java:31-52: @GeneratedValue IDENTITY id,
isNew() == id is null) — is locked here verbatim, per table. Any change
to column order, key choice, or dialect spelling fails loudly.
"""

from __future__ import annotations

import pytest

from ph_ee_nats_importer_rdbms_spark.sinks.jdbc import (
    DDL,
    TABLES,
    bootstrap_ddl,
    upsert_sql,
)

# The exact wire text per table. The three business tables MERGE on the
# natural key workflow_instance_key (TempDocumentStore-backed inflight
# entities are saved whole, so every non-key column updates); the two log
# tables are append-only (no ON DUPLICATE clause — their JPA id is
# IDENTITY-generated, isNew() is always true on import).
GOLDEN_MYSQL = {
    "ph_transfers": (
        "INSERT INTO ph_transfers (workflow_instance_key, transaction_id, "
        "started_at, completed_at, status, status_detail, payee_dfsp_id, "
        "payee_party_id, payee_party_id_type, payee_fee, payee_fee_currency, "
        "payee_quote_code, payer_dfsp_id, payer_party_id, payer_party_id_type, "
        "payer_fee, payer_fee_currency, payer_quote_code, amount, currency, "
        "direction, error_information, batch_id) "
        "VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?) "
        "ON DUPLICATE KEY UPDATE transaction_id = VALUES(transaction_id), "
        "started_at = VALUES(started_at), completed_at = VALUES(completed_at), "
        "status = VALUES(status), status_detail = VALUES(status_detail), "
        "payee_dfsp_id = VALUES(payee_dfsp_id), "
        "payee_party_id = VALUES(payee_party_id), "
        "payee_party_id_type = VALUES(payee_party_id_type), "
        "payee_fee = VALUES(payee_fee), "
        "payee_fee_currency = VALUES(payee_fee_currency), "
        "payee_quote_code = VALUES(payee_quote_code), "
        "payer_dfsp_id = VALUES(payer_dfsp_id), "
        "payer_party_id = VALUES(payer_party_id), "
        "payer_party_id_type = VALUES(payer_party_id_type), "
        "payer_fee = VALUES(payer_fee), "
        "payer_fee_currency = VALUES(payer_fee_currency), "
        "payer_quote_code = VALUES(payer_quote_code), "
        "amount = VALUES(amount), currency = VALUES(currency), "
        "direction = VALUES(direction), "
        "error_information = VALUES(error_information), "
        "batch_id = VALUES(batch_id)"
    ),
    "ph_transaction_requests": (
        "INSERT INTO ph_transaction_requests (workflow_instance_key, "
        "transaction_id, started_at, completed_at, state, payee_dfsp_id, "
        "payee_party_id, payee_party_id_type, payee_fee, payee_quote_code, "
        "payer_dfsp_id, payer_party_id, payer_party_id_type, payer_fee, "
        "payer_quote_code, amount, currency, direction, auth_type, "
        "initiator_type, scenario) "
        "VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?) "
        "ON DUPLICATE KEY UPDATE transaction_id = VALUES(transaction_id), "
        "started_at = VALUES(started_at), completed_at = VALUES(completed_at), "
        "state = VALUES(state), payee_dfsp_id = VALUES(payee_dfsp_id), "
        "payee_party_id = VALUES(payee_party_id), "
        "payee_party_id_type = VALUES(payee_party_id_type), "
        "payee_fee = VALUES(payee_fee), "
        "payee_quote_code = VALUES(payee_quote_code), "
        "payer_dfsp_id = VALUES(payer_dfsp_id), "
        "payer_party_id = VALUES(payer_party_id), "
        "payer_party_id_type = VALUES(payer_party_id_type), "
        "payer_fee = VALUES(payer_fee), "
        "payer_quote_code = VALUES(payer_quote_code), "
        "amount = VALUES(amount), currency = VALUES(currency), "
        "direction = VALUES(direction), auth_type = VALUES(auth_type), "
        "initiator_type = VALUES(initiator_type), scenario = VALUES(scenario)"
    ),
    "ph_batches": (
        "INSERT INTO ph_batches (workflow_instance_key, workflow_key, "
        "batch_id, request_id, request_file, note, result_file, "
        "total_transactions, ongoing, failed, completed, result_generated_at, "
        "started_at, completed_at) "
        "VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?) "
        "ON DUPLICATE KEY UPDATE workflow_key = VALUES(workflow_key), "
        "batch_id = VALUES(batch_id), request_id = VALUES(request_id), "
        "request_file = VALUES(request_file), note = VALUES(note), "
        "result_file = VALUES(result_file), "
        "total_transactions = VALUES(total_transactions), "
        "ongoing = VALUES(ongoing), failed = VALUES(failed), "
        "completed = VALUES(completed), "
        "result_generated_at = VALUES(result_generated_at), "
        "started_at = VALUES(started_at), completed_at = VALUES(completed_at)"
    ),
    "ph_tasks": (
        "INSERT INTO ph_tasks (workflow_key, workflow_instance_key, "
        "timestamp, intent, record_type, type, element_id) "
        "VALUES (?, ?, ?, ?, ?, ?, ?)"
    ),
    "ph_variables": (
        "INSERT INTO ph_variables (workflow_key, workflow_instance_key, "
        "timestamp, name, value) VALUES (?, ?, ?, ?, ?)"
    ),
}


@pytest.mark.parametrize("table", list(TABLES))
def test_mysql_statement_text_is_locked(table):
    assert upsert_sql(table, dialect="mysql") == GOLDEN_MYSQL[table]


@pytest.mark.parametrize("table", ["ph_transfers", "ph_transaction_requests", "ph_batches"])
def test_mysql_merge_updates_every_non_key_column(table):
    """repository.save() persists the whole inflight entity — every non-key
    column must appear exactly once in the UPDATE list, the key never."""
    cols, keys = TABLES[table]
    sql = upsert_sql(table, dialect="mysql")
    update_clause = sql.split("ON DUPLICATE KEY UPDATE ", 1)[1]
    for c in cols:
        if c in keys:
            assert f"{c} = VALUES({c})" not in update_clause
        else:
            assert update_clause.count(f"{c} = VALUES({c})") == 1


@pytest.mark.parametrize("table", ["ph_tasks", "ph_variables"])
def test_append_only_logs_have_no_merge_clause(table):
    sql = upsert_sql(table, dialect="mysql")
    assert "ON DUPLICATE" not in sql and "ON CONFLICT" not in sql


def test_sqlite_and_postgres_spellings_agree_on_columns():
    """The portable dialect updates the same non-key columns through the
    standard excluded.* spelling — semantic parity across engines."""
    for table, (cols, keys) in TABLES.items():
        if not keys:
            continue
        for dialect in ("sqlite", "postgres"):
            sql = upsert_sql(table, dialect=dialect)
            assert f"ON CONFLICT({', '.join(keys)}) DO UPDATE SET" in sql
            for c in cols:
                if c not in keys:
                    assert f"{c} = excluded.{c}" in sql


def test_mysql_ddl_uses_auto_increment_identity():
    """GenerationType.IDENTITY (AbstractPersistableCustom.java:34-36) maps
    to AUTO_INCREMENT on MySQL for the two log tables' surrogate ids."""
    for table in ("ph_tasks", "ph_variables"):
        assert "id BIGINT AUTO_INCREMENT PRIMARY KEY" in DDL[table]
    for table in ("ph_transfers", "ph_transaction_requests", "ph_batches"):
        assert "workflow_instance_key BIGINT PRIMARY KEY" in DDL[table]


def test_bootstrap_ddl_rewrites_identity_for_portable_dialects():
    sent: dict[str, list] = {}

    def recorder(url, statements):
        sent[url] = [sql for sql, _ in statements]

    bootstrap_ddl("db://sqlite", recorder, dialect="sqlite")
    bootstrap_ddl("db://pg", recorder, dialect="postgres")
    bootstrap_ddl("db://mysql", recorder, dialect="mysql")
    assert all("AUTO_INCREMENT" not in s for s in sent["db://sqlite"])
    assert any("INTEGER PRIMARY KEY AUTOINCREMENT" in s for s in sent["db://sqlite"])
    assert any("BIGSERIAL PRIMARY KEY" in s for s in sent["db://pg"])
    assert any("BIGINT AUTO_INCREMENT PRIMARY KEY" in s for s in sent["db://mysql"])
