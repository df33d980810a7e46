"""PySpark-native analytics engine with the query and data-processing
capabilities of openMF/ph-ee-nats-importer-rdbms.

The reference (at /root/reference, Java/Spring/EclipseLink) is a stateful
streaming importer: Zeebe workflow-engine JSON events from a NATS topic are
classified, parsed (JSONPath), correlated per workflow instance, and upserted
into per-tenant MySQL business tables. This package re-expresses that
pipeline Spark-first:

- ``schemas``    – typed StructTypes for the Zeebe event envelope and the
                   output tables (reference: entity/*/*.java).
- ``config``     – BPMN process registry (reference: application.yml:38-81).
- ``functions``  – scalar expression helpers (reference: OperatorUtils.java,
                   VariableParser.java) plus text/similarity functions.
- ``operators``  – the dataflow operators (classification, dedup, stateful
                   correlation, variable mapping) as declarative DataFrame
                   transformations, plus large-scale analytics operators
                   (dedup family, ANN, text analysis).
- ``plans``      – read-path query helpers (reference: TransferSpecs.java).
- ``sources``    – batch/stream sources and JDBC sinks with tenant routing.
- ``streaming``  – Structured Streaming wrap with keyed state
                   (applyInPandasWithState) for faithful per-event semantics.
"""

__version__ = "0.1.0"
