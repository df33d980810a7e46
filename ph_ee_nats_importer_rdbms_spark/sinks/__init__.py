"""Output sinks: JDBC upsert/append with per-tenant routing (SURVEY §2.1
S4-S7), fed by ``foreachBatch`` from the streaming pipeline or called
directly on batch tables."""
