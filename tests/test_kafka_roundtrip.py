"""Kafka end-to-end round trip, gated on a real broker + connector jar.

The container ships neither a Kafka broker nor spark-sql-kafka, so this
module's e2e test SKIPS cleanly here — but it is the complete recipe: on
any host with a broker at ``$OSCI_KAFKA_BOOTSTRAP`` (default
localhost:9092) and the connector on the classpath, it produces Debezium
envelopes into a topic named by the reference's ``<prefix>.<db>.<table>``
scheme, runs ``kafka_reader → decode_json → flatten → apply_changes``
exactly as the pipeline does, and asserts the merged state equals the
golden state the file-source tests establish.

What CAN run here (and does): broker reachability probing, the
classpath probe, and the reader's failure mode when the connector is
absent (a clear AnalysisException, not a hang)."""

from __future__ import annotations

import os
import socket

import pytest

from one_stop_cdc_ingestion_toolkit_spark.sources.kafka import (
    kafka_available,
    kafka_reader,
    topic_pattern,
)

BOOTSTRAP = os.environ.get("OSCI_KAFKA_BOOTSTRAP", "localhost:9092")


def broker_reachable(bootstrap: str = BOOTSTRAP, timeout: float = 0.5) -> bool:
    host, _, port = bootstrap.partition(":")
    try:
        with socket.create_connection((host, int(port or 9092)), timeout=timeout):
            return True
    except OSError:
        return False


def test_probe_is_honest(spark):
    """kafka_available must agree with an actual classpath lookup — and
    when False, building a reader must fail fast with a load error."""
    avail = kafka_available(spark)
    if avail:
        reader = kafka_reader(spark, BOOTSTRAP, "osci")
        assert reader is not None
    else:
        with pytest.raises(Exception) as ei:
            kafka_reader(spark, BOOTSTRAP, "osci").load()
        assert "kafka" in str(ei.value).lower()


@pytest.mark.skipif(
    not broker_reachable(), reason=f"no Kafka broker at {BOOTSTRAP}"
)
def test_kafka_roundtrip_merge(spark, tmp_path):  # pragma: no cover - env-gated
    if not kafka_available(spark):
        pytest.skip("spark-sql-kafka not on classpath")
    import json

    from kafka import KafkaProducer  # kafka-python, host-provided

    from one_stop_cdc_ingestion_toolkit_spark.operators.cdc import (
        apply_changes,
        snapshot,
    )
    from one_stop_cdc_ingestion_toolkit_spark.sources.debezium import (
        decode_json,
        flatten_changes,
    )
    from tests.cdc_fixtures import CANONICAL_EVENTS, GOLDEN_STATE, PERSON_SCHEMA

    topic = "osci.cdc_test_db.person"
    assert topic_pattern("osci", "cdc_test_db", "person") == r"osci\.cdc_test_db\.person"
    producer = KafkaProducer(bootstrap_servers=BOOTSTRAP)
    for e in CANONICAL_EVENTS:
        producer.send(topic, key=e["key"].encode(), value=e["value"].encode())
    producer.flush()

    raw = (
        kafka_reader(spark, BOOTSTRAP, "osci")
        .load()
        .selectExpr("CAST(key AS STRING) AS key", "CAST(value AS STRING) AS value")
    )
    out = str(tmp_path / "rows")
    q = (
        raw.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    decoded = decode_json(spark.read.parquet(out), PERSON_SCHEMA)
    state = apply_changes(None, flatten_changes(decoded, ["firstName"]), ["firstName"])
    got = {
        r.firstName: (r.lastName, r.age) for r in snapshot(state).collect()
    }
    assert got == GOLDEN_STATE
