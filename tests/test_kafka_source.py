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
