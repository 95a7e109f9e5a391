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
