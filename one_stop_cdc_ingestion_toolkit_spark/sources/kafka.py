"""Kafka change-stream reader builder.

The reference consumes per-table topics named ``<prefix>.<db>.<table>``
(`/root/reference/bin/mskc-connector.sh:398`) with SASL/IAM client
properties (`bin/mskc-connector.sh:410-431`, `cnf/kafka-client.properties:1-4`).
The engine maps this to ``readStream.format("kafka")`` with a
``subscribePattern`` over the prefix and a passthrough of ``kafka.*``
client options — the same decode/merge stages as the file source then
apply unchanged (source-agnostic pipeline).

No broker exists in the test container, so this module only BUILDS the
reader (unit-tested for option construction); end-to-end coverage runs on
the file source, which shares every downstream stage.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession


def topic_pattern(prefix: str, db: str | None = None, table: str | None = None) -> str:
    """Subscribe pattern for the reference's topic naming scheme."""
    parts = [re.escape(prefix), re.escape(db) if db else "[^.]+", re.escape(table) if table else "[^.]+"]
    return r"\.".join(parts)


def normalize_client_options(client_options: dict[str, str] | None) -> dict[str, str]:
    """Resolve secret placeholders and apply the ``kafka.``-prefix rule the
    Spark Kafka source expects (the reference's auth/config block A25,
    `bin/mskc-connector.sh:410-431`, becomes these passthrough options)."""
    from one_stop_cdc_ingestion_toolkit_spark.config import resolve_options

    out = {}
    for k, v in resolve_options(client_options or {}).items():
        out[k if k.startswith("kafka.") else f"kafka.{k}"] = v
    return out


def kafka_available(spark: SparkSession) -> bool:
    """True when the spark-sql-kafka data source is on the classpath.

    Same availability-probe pattern as ``debezium.avro_available`` /
    ``sinks.lakehouse_format_available``: callers branch to the file
    source where the connector is absent instead of failing at start().
    """
    try:
        jvm = spark._jvm
        # Utils.classForName resolves with Spark's session classloader —
        # java.lang.Class.forName used py4j's caller loader and returned
        # False for connectors added via --packages/spark.jars even
        # though format("kafka") worked (review r7)
        jvm.org.apache.spark.util.Utils.classForName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider", True, False
        )
        return True
    except Exception:  # noqa: BLE001
        try:
            spark._jvm.java.lang.Class.forName(
                "org.apache.spark.sql.kafka010.KafkaSourceProvider"
            )
            return True
        except Exception:  # noqa: BLE001
            return False


def kafka_reader(
    spark: SparkSession,
    bootstrap_servers: str,
    prefix: str,
    *,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    client_options: dict[str, str] | None = None,
):
    """Configured (not started) Kafka stream reader.

    ``client_options`` passes SASL/TLS settings through as ``kafka.*``
    options, e.g. ``{"security.protocol": "SASL_SSL",
    "sasl.mechanism": "AWS_MSK_IAM"}`` — the engine analogue of the
    reference's IAM auth block (A25). ``max_offsets_per_trigger`` is the
    capacity knob (A14) bounding micro-batch size at scale.
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribePattern", topic_pattern(prefix))
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", "false")
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    for key, v in normalize_client_options(client_options).items():
        reader = reader.option(key, v)
    return reader


def kafka_writer(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_dir: str,
    client_options: dict[str, str] | None = None,
):
    """Configured (not started) Kafka re-publish sink (SURVEY §2.4): a
    streaming DataFrame with string ``key``/``value`` columns written back
    to a topic — the engine's analogue of the pipeline's topic outputs.
    Same gating as the reader: no broker/jar in the test container."""
    writer = (
        df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
    )
    for key, v in normalize_client_options(client_options).items():
        writer = writer.option(key, v)
    return writer


def raw_records(df: DataFrame) -> DataFrame:
    """Kafka frame → the engine's raw (key,value) change-record shape
    (string key per the reference's StringConverter, A9)."""
    from pyspark.sql import functions as F

    return df.select(
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
        F.col("topic"),
    )
