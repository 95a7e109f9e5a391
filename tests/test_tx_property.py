"""Property test for the transaction gate (streaming/tx_gate.py): under
ANY interleaving of tx data rows, END boundaries (with or without
event_count), plain records, duplicate deliveries and batch splits, the
gate must emit exactly what the documented contract says — plain rows in
their arrival batch (multiplicity preserved), each committed
transaction's DISTINCT rows exactly once in the batch it becomes
provably committed, post-release stragglers passed straight through —
and never emit an uncommitted transaction's rows.

The fixed-scenario tests (test_tx_atomic.py) pin the known-tricky
orders; this hunts the rest. The oracle below implements the CONTRACT
(module docstring of tx_gate), not the implementation."""

from __future__ import annotations

import json
import pathlib
import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from one_stop_cdc_ingestion_toolkit_spark.streaming.tx_gate import TxGate

TXS = ["tx-a", "tx-b", "tx-c"]


def data_rec(key, tx=None):
    v = {"op": "c", "after": {"k": key}}
    if tx is not None:
        v["transaction"] = {"id": tx}
    return {"key": key, "value": json.dumps(v)}


def end_rec(tx, event_count=None):
    v = {"status": "END", "id": tx}
    if event_count is not None:
        v["event_count"] = event_count
    return {"key": None, "value": json.dumps(v)}


@st.composite
def tx_stream(draw):
    """(events, batch cuts): randomized transactional delivery."""
    events = []
    seq = 0
    n_tx = draw(st.integers(1, 3))
    for t in range(n_tx):
        tx = TXS[t]
        size = draw(st.integers(1, 3))
        rows = []
        for i in range(size):
            seq += 1
            rows.append(data_rec(f"{tx}-r{i}", tx))
        with_count = draw(st.booleans())
        # an occasionally-wrong (too-high) count models a torn capture:
        # the tx must then stay held forever, not release partially
        count = (
            size + draw(st.integers(0, 1)) if with_count else None
        )
        rows.append(end_rec(tx, count))
        # END may arrive anywhere relative to this tx's data
        order = draw(st.permutations(rows))
        events.extend(order)
        # sprinkle plain records
        for _ in range(draw(st.integers(0, 2))):
            seq += 1
            events.append(data_rec(f"plain-{seq}"))
    # duplicate a few deliveries (at-least-once source)
    for _ in range(draw(st.integers(0, 2))):
        if events:
            events.append(events[draw(st.integers(0, len(events) - 1))])
    # global shuffle of the whole delivery, then batch cuts
    events = list(draw(st.permutations(events)))
    n_batches = draw(st.integers(1, 4))
    cuts = sorted(
        draw(
            st.lists(
                st.integers(1, max(1, len(events) - 1)),
                min_size=min(n_batches - 1, max(0, len(events) - 1)),
                max_size=min(n_batches - 1, max(0, len(events) - 1)),
                unique=True,
            )
        )
    )
    return events, cuts


def contract_oracle(batches):
    """Per-batch expected emissions under the documented contract.
    Returns (list of multisets of keys, set of released txs)."""
    buffered: dict[str, set] = {}
    ended: dict[str, int | None] = {}
    closed: set[str] = set()
    out_batches = []
    for batch in batches:
        out: list[str] = []
        # 1. consume END boundaries (ignored for closed txs)
        for e in batch:
            v = json.loads(e["value"])
            if "status" in v and "op" not in v:
                if v["status"] == "END" and v["id"] not in closed:
                    ended[v["id"]] = v.get("event_count")
        # 2. route data rows
        for e in batch:
            v = json.loads(e["value"])
            if "status" in v and "op" not in v:
                continue
            tx = (v.get("transaction") or {}).get("id")
            if tx is None or tx in closed:
                out.append(e["key"])  # plain / straggler passthrough
            else:
                buffered.setdefault(tx, set()).add((e["key"], e["value"]))
        # 3. release provably-committed transactions
        for tx in list(ended):
            rows = buffered.get(tx)
            need = ended[tx]
            if rows and (need is None or len(rows) >= need):
                out.extend(k for k, _ in rows)
                closed.add(tx)
                del ended[tx]
                del buffered[tx]
        out_batches.append(sorted(out))
    return out_batches, closed


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(stream=tx_stream())
def test_gate_matches_contract_under_random_interleaving(spark, stream):
    events, cuts = stream
    bounds = [0, *cuts, len(events)]
    batches = [
        events[bounds[i] : bounds[i + 1]] for i in range(len(bounds) - 1)
    ]
    batches = [b for b in batches if b]
    base = pathlib.Path(tempfile.mkdtemp(prefix="txprop-"))
    try:
        gate = TxGate(spark, str(base))
        expected, closed = contract_oracle(batches)
        for i, batch in enumerate(batches):
            raw = spark.createDataFrame(
                [(e["key"], e["value"]) for e in batch],
                "key string, value string",
            )
            got = sorted(
                r["key"] for r in gate.filter_batch(raw, batch_id=i + 1).collect()
            )
            assert got == expected[i], (i, got, expected[i])
        # nothing uncommitted ever leaked, and pending() shows exactly
        # the still-open transactions with buffered rows
        pending = gate.pending()
        assert set(pending) == {
            t for t in TXS
            if t not in closed
            and any(
                (json.loads(e["value"]).get("transaction") or {}).get("id") == t
                for b in batches
                for e in b
            )
        }
    finally:
        shutil.rmtree(base, ignore_errors=True)
