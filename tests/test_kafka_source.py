"""Kafka reader construction (no broker in the container — option-level
tests only; decode/merge stages are covered via the file source)."""

from __future__ import annotations

import re

from one_stop_cdc_ingestion_toolkit_spark.sources.kafka import topic_pattern


def test_topic_pattern_matches_reference_naming():
    pat = topic_pattern("osci.db.mysql-server-1")
    assert re.fullmatch(pat, "osci.db.mysql-server-1.cdc_test_db.person")
    assert not re.fullmatch(pat, "other.cdc_test_db.person")
    assert not re.fullmatch(pat, "osci.db.mysql-server-1.only_db")


def test_topic_pattern_pinned_table():
    pat = topic_pattern("p", db="d", table="t")
    assert re.fullmatch(pat, "p.d.t")
    assert not re.fullmatch(pat, "p.d.x")


def test_normalize_client_options_prefix_and_secrets(monkeypatch):
    """A25 auth passthrough: kafka.-prefix applied once, secrets resolved
    via the ${env:} indirection (A12) — never plaintext in the spec."""
    from one_stop_cdc_ingestion_toolkit_spark.sources.kafka import (
        normalize_client_options,
    )

    monkeypatch.setenv("OSCI_SASL_PW", "s3cret")
    out = normalize_client_options(
        {
            "security.protocol": "SASL_SSL",
            "kafka.sasl.mechanism": "AWS_MSK_IAM",
            "sasl.jaas.config": "pw=${env:OSCI_SASL_PW}",
        }
    )
    assert out == {
        "kafka.security.protocol": "SASL_SSL",
        "kafka.sasl.mechanism": "AWS_MSK_IAM",
        "kafka.sasl.jaas.config": "pw=s3cret",
    }
    assert normalize_client_options(None) == {}


def test_raw_records_casts_binary_kafka_shape(spark):
    """A9 key serde: Kafka's binary key/value become the engine's string
    (key, value, topic) record shape."""
    from one_stop_cdc_ingestion_toolkit_spark.sources.kafka import raw_records

    df = spark.createDataFrame(
        [(b"alice", b'{"op":"c"}', "osci.db.s1.cdc_test_db.person")],
        "key binary, value binary, topic string",
    )
    row = raw_records(df).collect()[0]
    assert (row.key, row.value, row.topic) == (
        "alice",
        '{"op":"c"}',
        "osci.db.s1.cdc_test_db.person",
    )


def test_kafka_availability_probe(spark):
    """No spark-sql-kafka jar in this container: the probe must return
    False (not raise) so pipelines branch to the file source."""
    from one_stop_cdc_ingestion_toolkit_spark.sources.kafka import kafka_available

    assert kafka_available(spark) is False


def test_kafka_shaped_records_to_merge(spark):
    """Kafka-frame-shaped records (binary key/value + topic/partition/
    offset, exactly what readStream.format('kafka') yields) through
    raw_records → decode_json → flatten_changes → apply_changes. Proves
    the reader output contract composes with the merge; only the broker
    hop itself needs the jar (probed test below)."""
    from one_stop_cdc_ingestion_toolkit_spark.operators.cdc import apply_changes, snapshot
    from one_stop_cdc_ingestion_toolkit_spark.sources.debezium import (
        decode_json,
        flatten_changes,
    )
    from one_stop_cdc_ingestion_toolkit_spark.sources.kafka import raw_records
    from tests.cdc_fixtures import CANONICAL_EVENTS, GOLDEN_STATE, PERSON_SCHEMA

    topic = "osci.db.s1.cdc_test_db.person"
    rows = [
        (e["key"].encode(), e["value"].encode(), topic, 0, i)
        for i, e in enumerate(CANONICAL_EVENTS)
    ]
    kafka_frame = spark.createDataFrame(
        rows, "key binary, value binary, topic string, partition int, offset long"
    )
    raw = raw_records(kafka_frame)
    changes = flatten_changes(decode_json(raw, PERSON_SCHEMA), ["firstName"])
    state = apply_changes(None, changes, ["firstName"])
    got = {
        r["firstName"]: (r["firstName"], r["lastName"], r["age"])
        for r in snapshot(state).collect()
    }
    assert got == GOLDEN_STATE


def test_kafka_broker_roundtrip(spark, tmp_path):
    """Real-broker round-trip: publish envelopes, read back via
    kafka_reader, merge, compare to golden. Runs only where the Kafka
    connector is on the classpath AND $OSCI_KAFKA_BOOTSTRAP points at a
    broker; skips cleanly everywhere else."""
    import os

    import pytest

    from one_stop_cdc_ingestion_toolkit_spark.sources.kafka import (
        kafka_available,
        kafka_reader,
        raw_records,
    )

    bootstrap = os.environ.get("OSCI_KAFKA_BOOTSTRAP")
    if not kafka_available(spark) or not bootstrap:
        pytest.skip("no Kafka connector/broker in this environment")

    from one_stop_cdc_ingestion_toolkit_spark.operators.cdc import apply_changes, snapshot
    from one_stop_cdc_ingestion_toolkit_spark.sources.debezium import (
        decode_json,
        flatten_changes,
    )
    from tests.cdc_fixtures import CANONICAL_EVENTS, GOLDEN_STATE, PERSON_SCHEMA

    topic = "osci.db.s1.cdc_test_db.person"
    src = spark.createDataFrame(
        [(e["key"], e["value"]) for e in CANONICAL_EVENTS], "key string, value string"
    )
    (
        src.write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .save()
    )
    reader = kafka_reader(spark, bootstrap, "osci.db.s1")
    q = (
        reader.load()
        .transform(raw_records)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    raw = spark.read.parquet(str(tmp_path / "out"))
    changes = flatten_changes(decode_json(raw, PERSON_SCHEMA), ["firstName"])
    state = apply_changes(None, changes, ["firstName"])
    got = {
        r["firstName"]: (r["firstName"], r["lastName"], r["age"])
        for r in snapshot(state).collect()
    }
    assert got == GOLDEN_STATE
