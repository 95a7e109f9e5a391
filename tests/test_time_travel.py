"""Time travel over the table store's pointer history: snapshot and
bucketed layouts, retention-driven pruning, and the CLI surface."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from one_stop_cdc_ingestion_toolkit_spark.streaming.table_store import (
    BucketedTableStore,
    TableStore,
)


def _df(spark, vals):
    return spark.createDataFrame([(i, v) for i, v in vals], "id long, v string")


def test_snapshot_history_and_read_as_of(spark, tmp_path):
    store = TableStore(tmp_path / "lake", retain=2)
    store.write(_df(spark, [(1, "a")]), "t")
    store.write(_df(spark, [(1, "b"), (2, "b")]), "t")
    store.write(_df(spark, [(3, "c")]), "t")
    hist = store.history("t")
    assert [r["seq"] for r in hist] == [0, 1, 2]
    assert all(r["live"] for r in hist)
    assert store.read_as_of(spark, "t", 0).count() == 1
    assert store.read_as_of(spark, "t", 1).count() == 2
    got = {r["v"] for r in store.read_as_of(spark, "t", 2).collect()}
    assert got == {"c"}
    # current read unchanged
    assert store.read(spark, "t").count() == 1


def test_retention_prunes_beyond_depth(spark, tmp_path):
    store = TableStore(tmp_path / "lake", retain=1)
    for i in range(4):
        store.write(_df(spark, [(i, f"g{i}")]), "t")
    hist = store.history("t")
    assert [r["live"] for r in hist] == [False, False, True, True]
    with pytest.raises(ValueError, match="pruned"):
        store.read_as_of(spark, "t", 0)
    assert store.read_as_of(spark, "t", 2).collect()[0]["v"] == "g2"


def test_default_retain_prunes_immediately(spark, tmp_path):
    """retain=0 keeps today's behavior: one generation on disk."""
    store = TableStore(tmp_path / "lake")
    store.write(_df(spark, [(1, "a")]), "t")
    store.write(_df(spark, [(2, "b")]), "t")
    gens = list((tmp_path / "lake" / "t").glob("gen-*"))
    assert len(gens) == 1
    assert [r["live"] for r in store.history("t")] == [False, True]


def test_bucketed_read_as_of(spark, tmp_path):
    store = BucketedTableStore(tmp_path / "lake", retain=2)
    d1 = _df(spark, [(1, "a"), (2, "a")]).withColumn(
        "__bucket", (F.col("id") % 2).cast("int")
    )
    store.write_buckets(d1, "t", buckets=[0, 1])
    d2 = _df(spark, [(2, "b")]).withColumn("__bucket", F.lit(0).cast("int"))
    store.write_buckets(d2, "t", buckets=[0])
    hist = store.history("t")
    assert [r["kind"] for r in hist] == ["bucketed", "bucketed"]
    # state 0: both rows original; state 1: bucket 0 rewritten
    v0 = {r["id"]: r["v"] for r in store.read_as_of(spark, "t", 0).collect()}
    assert v0 == {1: "a", 2: "a"}
    v1 = {r["id"]: r["v"] for r in store.read_as_of(spark, "t", 1).collect()}
    assert v1 == {1: "a", 2: "b"}


def test_cli_history_and_as_of(spark, tmp_path, capsys):
    from one_stop_cdc_ingestion_toolkit_spark.cli import main

    store = TableStore(tmp_path / "lake", retain=2)
    store.write(_df(spark, [(1, "a")]), "t")
    store.write(_df(spark, [(2, "b")]), "t")
    rc = main(["history", str(tmp_path / "lake"), "t"])
    out = capsys.readouterr().out
    assert rc == 0 and '"seq": 0' in out and '"seq": 1' in out
    rc = main(["show-table", str(tmp_path / "lake"), "t", "--raw", "--as-of", "0"])
    out = capsys.readouterr().out
    assert rc == 0 and "a" in out


def test_migration_keeps_retained_snapshot_history(spark, tmp_path):
    """Layout migration must honor retain: the first bucketed write's
    prune used to keep only DICT (bucketed) history states, deleting the
    retained snapshot generation and breaking read_as_of across the
    migration (review r7)."""
    store = BucketedTableStore(tmp_path / "lake", retain=2)
    store.write(_df(spark, [(1, "a"), (2, "a")]), "t")  # seq 0, snapshot
    d = _df(spark, [(1, "b"), (2, "b")]).withColumn(
        "__bucket", (F.col("id") % 2).cast("int")
    )
    store.write_buckets(d, "t", buckets=[0, 1])  # seq 1, migration
    hist = store.history("t")
    assert [r["kind"] for r in hist] == ["snapshot", "bucketed"]
    assert all(r["live"] for r in hist), hist
    v0 = {r["id"]: r["v"] for r in store.read_as_of(spark, "t", 0).collect()}
    assert v0 == {1: "a", 2: "a"}
    v1 = {r["id"]: r["v"] for r in store.read_as_of(spark, "t", 1).collect()}
    assert v1 == {1: "b", 2: "b"}


def test_read_as_of_empty_bucket_state_returns_none(spark, tmp_path):
    """A batch that deletes every remaining row logs an EMPTY bucketed
    state; read_as_of must mirror read_buckets' None contract instead of
    handing spark.read.parquet() zero paths (review r7)."""
    store = BucketedTableStore(tmp_path / "lake", retain=2)
    d = _df(spark, [(1, "a")]).withColumn("__bucket", F.lit(0).cast("int"))
    store.write_buckets(d, "t", buckets=[0])
    # rewrite bucket 0 with no rows for it => bucket leaves the map
    empty = _df(spark, []).withColumn("__bucket", F.lit(0).cast("int"))
    store.write_buckets(empty, "t", buckets=[0])
    assert store.bucket_map("t") == {}
    assert store.read_as_of(spark, "t", 1) is None
    # seq 0 (pre-delete) still reads within retain
    assert store.read_as_of(spark, "t", 0).count() == 1
