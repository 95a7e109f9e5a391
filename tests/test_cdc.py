"""Golden replay tests for the CDC decode + latest-wins apply
(SURVEY §5.2.3): c/r/u/d, out-of-order pos, duplicate delivery,
idempotent re-apply."""

from __future__ import annotations

from pyspark.sql import functions as F

from one_stop_cdc_ingestion_toolkit_spark.operators.cdc import (
    apply_changes,
    expire_tombstones,
    snapshot,
)
from one_stop_cdc_ingestion_toolkit_spark.sources.debezium import (
    decode_json,
    flatten_changes,
    strip_confluent_header,
)
from tests.cdc_fixtures import CANONICAL_EVENTS, GOLDEN_STATE, PERSON_SCHEMA


def _raw_df(spark, events):
    return spark.createDataFrame(
        [(e["key"], e["value"]) for e in events], "key string, value string"
    )


def _state(df) -> dict:
    return {
        r["firstName"]: (r["firstName"], r["lastName"], r["age"])
        for r in snapshot(df).collect()
    }


def test_decode_json_envelope(spark):
    decoded = decode_json(_raw_df(spark, CANONICAL_EVENTS), PERSON_SCHEMA)
    assert set(decoded.columns) == {"key", "before", "after", "op", "ts_ms", "source"}
    ops = [r["op"] for r in decoded.select("op").collect()]
    assert sorted(ops) == sorted(["r", "r", "c", "u", "u", "d", "c", "c"])
    first = decoded.filter(F.col("op") == "d").select("before.firstName").first()
    assert first[0] == "bob"


def test_apply_changes_golden(spark):
    decoded = decode_json(_raw_df(spark, CANONICAL_EVENTS), PERSON_SCHEMA)
    changes = flatten_changes(decoded, ["firstName"])
    snap = apply_changes(None, changes, ["firstName"])
    assert _state(snap) == GOLDEN_STATE


def test_apply_is_idempotent_and_incremental(spark):
    decoded = decode_json(_raw_df(spark, CANONICAL_EVENTS), PERSON_SCHEMA)
    changes = flatten_changes(decoded, ["firstName"])
    snap1 = apply_changes(None, changes, ["firstName"])
    # replay the same batch on top of the result (at-least-once redelivery)
    snap2 = apply_changes(snap1, changes, ["firstName"])
    assert _state(snap2) == GOLDEN_STATE
    # split replay: first half then second half equals one-shot replay
    half = len(CANONICAL_EVENTS) // 2
    d1 = decode_json(_raw_df(spark, CANONICAL_EVENTS[:half]), PERSON_SCHEMA)
    d2 = decode_json(_raw_df(spark, CANONICAL_EVENTS[half:]), PERSON_SCHEMA)
    s = apply_changes(None, flatten_changes(d1, ["firstName"]), ["firstName"])
    s = apply_changes(s, flatten_changes(d2, ["firstName"]), ["firstName"])
    assert _state(s) == GOLDEN_STATE


def test_stale_update_and_resurrection_rejected(spark):
    """A later batch delivering only STALE events (old update for alice,
    old insert for deleted bob) must not change converged state."""
    decoded = decode_json(_raw_df(spark, CANONICAL_EVENTS), PERSON_SCHEMA)
    s = apply_changes(None, flatten_changes(decoded, ["firstName"]), ["firstName"])
    from tests.cdc_fixtures import envelope, person

    stale = [
        envelope("u", 4, before=person("alice", "smith", 30), after=person("alice", "green", 30)),
        envelope("r", 2, after=person("bob", "jones", 40)),  # resurrection attempt
    ]
    d = decode_json(_raw_df(spark, stale), PERSON_SCHEMA)
    s2 = apply_changes(s, flatten_changes(d, ["firstName"]), ["firstName"])
    assert _state(s2) == GOLDEN_STATE
    # tombstone GC: bob's tombstone survives below the horizon, not above
    assert _state(expire_tombstones(s2, min_pos=7)) == GOLDEN_STATE
    assert expire_tombstones(s2, 7).filter("__deleted").count() == 0
    assert expire_tombstones(s2, 5).filter("__deleted").count() == 1


def test_confluent_header_strip(spark):
    payload = b"\x00\x00\x00\x04\xd2avro-body-bytes"
    df = spark.createDataFrame([(payload,)], "value binary")
    sid, body = strip_confluent_header(F.col("value"))
    row = df.select(sid, body).first()
    assert row["schema_id"] == 1234
    assert bytes(row["avro_payload"]) == b"avro-body-bytes"
