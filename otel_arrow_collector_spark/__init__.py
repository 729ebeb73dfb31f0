"""otel_arrow_collector_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of open-telemetry/otel-arrow-collector.

The reference (read-only at /root/reference/) is a streaming telemetry
dataflow engine (receivers -> processors -> exporters over traces / metrics /
logs).  This package re-expresses its data model and operator semantics
Spark-first:

- ``session``    — SparkSession factory with the verified engine config.
- ``sources``    — loaders / codecs (relational tables, OTLP/JSON, Arrow IPC).
- ``operators``  — the relational + LLM-data-pipeline operator surface
                   (SURVEY.md §2.8 declared queries, dedup, similarity, text).
- ``functions``  — scalar/column function registry (OTTL-style attribute ops).
- ``plans``      — YAML pipeline spec -> DAG compiler (graph.go semantics).
- ``streaming``  — Structured Streaming operators (batching, sharding,
                   windows, dedup sinks — batch_processor.go semantics).

Everything is declarative DataFrame / Spark SQL so Catalyst provides
predicate pushdown, column pruning, join planning and whole-stage codegen;
Python UDFs are avoided on hot paths (Arrow-batched pandas UDFs only where
SQL genuinely cannot express the semantics).
"""

__version__ = "0.1.0"
