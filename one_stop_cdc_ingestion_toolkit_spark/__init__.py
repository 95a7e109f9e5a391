"""one_stop_cdc_ingestion_toolkit_spark — a PySpark-native CDC + analytics engine.

A ground-up re-expression of the capabilities of the reference toolkit
``bluishglc/one-stop-cdc-ingestion-toolkit`` (a Bash CLI that provisions a
MySQL → Debezium → Avro → Kafka CDC pipeline; see
``/root/reference/bin/osci.sh:180-269``) as an idiomatic Apache Spark engine:

- **CDC ingestion** (``sources.debezium``, ``streaming.pipeline``,
  ``operators.cdc``): consume Debezium-format change streams, decode
  JSON/Avro envelopes, and continuously materialize queryable tables with
  latest-wins apply and BACKWARD-compatible schema evolution
  (``streaming.schema_store``).
- **Relational query surface** (``operators.relational``): the full declared
  inventory of scans, joins, aggregations, windows, set ops, scalar
  functions and subqueries, expressed with the DataFrame API so Catalyst
  performs pushdown, pruning, join selection and whole-stage codegen.
- **Large-scale data-pipeline operators** (``operators.dedup``,
  ``operators.similarity``, ``operators.text``, ``operators.multimodal``):
  exact/MinHash-LSH/SimHash dedup, embedding similarity search, text
  analysis, and opaque-binary multimodal column plumbing — designed for
  100 TB-scale partitioning.
- **Pipeline registry + CLI** (``registry``, ``cli``): the reference's
  osci-conf.json control plane re-expressed as pipeline specs over
  Structured Streaming queries.
"""

from one_stop_cdc_ingestion_toolkit_spark.session import get_session  # noqa: F401

__version__ = "0.1.0"
