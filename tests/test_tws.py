"""transformWithStateInPandas (Spark 4): multi-variable state processor —
cross-batch accumulation, per-type MapState, batch-equivalence."""

from __future__ import annotations

import json
import pathlib

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from one_stop_cdc_ingestion_toolkit_spark.streaming.stateful import (
    enable_tws,
    tws_available,
    user_profile_tws,
)

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)

BATCH1 = [
    (1, "click", 1.0),
    (1, "view", 2.0),
    (2, "click", 3.0),
    (1, "click", 4.0),
]
BATCH2 = [
    (1, "click", 5.0),
    (2, "buy", 6.0),
    (3, "view", 7.0),
]


def _write(path: pathlib.Path, name: str, rows) -> None:
    path.mkdir(parents=True, exist_ok=True)
    with open(path / name, "w") as f:
        for u, e, v in rows:
            f.write(json.dumps({"user_id": u, "event_type": e, "value": v}) + "\n")


@pytest.fixture()
def rocksdb(spark):
    if not tws_available():
        pytest.skip("transformWithState needs google.protobuf (absent here)")
    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    assert enable_tws(spark)
    yield
    if old is None:
        spark.conf.unset(key)
    else:
        spark.conf.set(key, old)


def test_tws_gate_is_honest(spark):
    """The probe's verdict must agree with reality: if it says available,
    enable_tws succeeds; if not, enable_tws refuses (no half-configured
    session that crashes at query start)."""
    assert enable_tws(spark) == tws_available()


def _run(spark, src, ckpt, emitted):
    stream = spark.readStream.schema(EVENT_SCHEMA).format("json").load(str(src))
    out = user_profile_tws(stream)

    def on_batch(df, epoch_id):
        emitted.append([tuple(r) for r in df.collect()])

    q = (
        out.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", str(ckpt))
        .start()
    )
    q.processAllAvailable()
    q.stop()


def test_profile_accumulates_across_batches(spark, tmp_path, rocksdb):
    src = tmp_path / "ev"
    ckpt = tmp_path / "ckpt"
    emitted: list[list[tuple]] = []

    _write(src, "b1.json", BATCH1)
    _run(spark, src, ckpt, emitted)
    _write(src, "b2.json", BATCH2)
    _run(spark, src, ckpt, emitted)

    # final profile per (user, type) = last emission wins
    final: dict[tuple, tuple] = {}
    for batch in emitted:
        for u, etype, n_type, n_events, total in batch:
            final[(u, etype)] = (n_type, n_events, total)

    # batch twin over ALL events
    allrows = BATCH1 + BATCH2
    df = spark.createDataFrame(allrows, EVENT_SCHEMA)
    per_type = {
        (r["user_id"], r["event_type"]): r["n"]
        for r in df.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    per_user = {
        r["user_id"]: (r["n"], r["total"])
        for r in df.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert set(final) == set(per_type)
    for (u, etype), (n_type, n_events, total) in final.items():
        assert n_type == per_type[(u, etype)]
        assert n_events == per_user[u][0]
        assert total == pytest.approx(per_user[u][1])


def test_untouched_user_not_reemitted(spark, tmp_path, rocksdb):
    """Update mode emits only users present in the micro-batch — user 2's
    profile is not re-emitted by a batch that only touches user 3."""
    src = tmp_path / "ev"
    ckpt = tmp_path / "ckpt"
    emitted: list[list[tuple]] = []

    _write(src, "b1.json", BATCH1)
    _run(spark, src, ckpt, emitted)
    n_first = len(emitted)
    _write(src, "b2.json", [(3, "view", 9.0)])
    _run(spark, src, ckpt, emitted)

    later_users = {row[0] for batch in emitted[n_first:] for row in batch}
    assert later_users <= {3}
    assert (3, "view", 1) in {
        (r[0], r[1], r[2]) for batch in emitted[n_first:] for r in batch
    }
