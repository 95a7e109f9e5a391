"""Property test for the CDC merge: ANY delivery order, duplication and
batch split of a change sequence must converge to the state a sequential
by-position replay produces (the reference's tasks.max=1 total order,
re-derived rather than assumed)."""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from one_stop_cdc_ingestion_toolkit_spark.operators.cdc import apply_changes, snapshot
from one_stop_cdc_ingestion_toolkit_spark.sources.debezium import (
    decode_json,
    flatten_changes,
)
from tests.cdc_fixtures import PERSON_SCHEMA, envelope, person

KEYS = ["k0", "k1", "k2"]


@st.composite
def event_log(draw):
    """A totally-ordered op log + a shuffled, duplicated delivery of it."""
    n = draw(st.integers(2, 10))
    ops = []
    for pos in range(1, n + 1):
        key = draw(st.sampled_from(KEYS))
        kind = draw(st.sampled_from(["c", "u", "d", "r"]))
        age = draw(st.integers(0, 99))
        ops.append((pos, key, kind, age))
    order = draw(st.permutations(range(n)))
    dup = draw(st.lists(st.sampled_from(range(n)), max_size=3))
    delivery = [ops[i] for i in order] + [ops[i] for i in dup]
    n_batches = draw(st.integers(1, 3))
    return ops, delivery, n_batches


def sequential_oracle(ops) -> dict:
    """Replay in pos order with latest-wins/delete semantics."""
    state: dict = {}
    for pos, key, kind, age in sorted(ops):
        if kind == "d":
            state.pop(key, None)
        else:
            state[key] = age
    return state


def to_envelope(pos, key, kind, age):
    row = person(key, None, age)
    if kind == "d":
        return envelope("d", pos, before=row)
    return envelope(kind, pos, after=row)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=event_log())
def test_any_delivery_converges(spark, data):
    ops, delivery, n_batches = data
    events = [to_envelope(*op) for op in delivery]
    per = max(1, len(events) // n_batches)
    state = None
    for i in range(0, len(events), per):
        chunk = events[i : i + per]
        raw = spark.createDataFrame(
            [(e["key"], e["value"]) for e in chunk], "key string, value string"
        )
        changes = flatten_changes(decode_json(raw, PERSON_SCHEMA), ["firstName"])
        state = apply_changes(state, changes, ["firstName"])
    got = {r["firstName"]: r["age"] for r in snapshot(state).collect()}
    assert got == sequential_oracle(ops)
