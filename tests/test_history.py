"""SCD2 history + snapshot diff (operators.history): version compression,
validity stitching, I/U/D classification, and the time-travel CDF path
(diff of two TableStore generations)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from one_stop_cdc_ingestion_toolkit_spark.operators.history import (
    scd2_from_changelog,
    snapshot_diff,
)
from one_stop_cdc_ingestion_toolkit_spark.streaming.table_store import TableStore


def _ts(day):
    return dt.datetime(2024, 1, day)


def test_scd2_compresses_consecutive_equal_values(spark):
    rows = [
        (1, "a", _ts(1), 1),
        (1, "a", _ts(2), 2),  # same status → same version
        (1, "b", _ts(3), 3),  # change → v2
        (1, "a", _ts(4), 4),  # back to a → v3 (NOT merged with v1)
        (2, "x", _ts(1), 5),
    ]
    df = spark.createDataFrame(rows, ["k", "status", "ts", "seq"])
    hist = scd2_from_changelog(
        df, key_cols=["k"], attr_col="status", order_cols=["ts", "seq"], ts_col="ts"
    )
    got = {
        (r.k, r.version): (r.status, r.valid_from, r.valid_to, r.is_current)
        for r in hist.collect()
    }
    assert got == {
        (1, 1): ("a", _ts(1), _ts(3), False),
        (1, 2): ("b", _ts(3), _ts(4), False),
        (1, 3): ("a", _ts(4), None, True),
        (2, 1): ("x", _ts(1), None, True),
    }


def test_scd2_single_shuffle_plan(spark):
    """The whole SCD2 construction must reuse ONE key partitioning — no
    second exchange between the change detection, versioning, collapse
    and validity stitch."""
    df = spark.createDataFrame(
        [(1, "a", _ts(1), 1)], ["k", "status", "ts", "seq"]
    )
    hist = scd2_from_changelog(
        df, key_cols=["k"], attr_col="status", order_cols=["ts", "seq"], ts_col="ts"
    )
    plan = hist._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_snapshot_diff_classifies_ops(spark):
    old = spark.createDataFrame(
        [(1, 10, "x"), (2, 20, "y"), (3, 30, "z")], ["k", "v", "s"]
    )
    new = spark.createDataFrame(
        [(2, 20, "y"), (3, 31, "z"), (4, 40, "w")], ["k", "v", "s"]
    )
    diff = snapshot_diff(old, new, key_cols=["k"], compare_cols=["v", "s"])
    got = {r.k: (r.op, r.old_v, r.new_v) for r in diff.collect()}
    # k=2 unchanged → absent; k=1 deleted; k=3 updated; k=4 inserted
    assert got == {
        1: ("delete", 10, None),
        3: ("update", 30, 31),
        4: ("insert", None, 40),
    }


def test_snapshot_diff_over_time_travel_generations(spark, tmp_path):
    """CDF between two materialized-table generations via read_as_of —
    the Delta-CDF equivalent over the engine's own store."""
    store = TableStore(tmp_path / "lake", retain=2)
    g1 = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "val"])
    store.write(g1, "t")
    g2 = spark.createDataFrame([(2, "B"), (3, "c")], ["k", "val"])
    store.write(g2, "t")
    h = store.history("t")
    v_old = store.read_as_of(spark, "t", h[0]["seq"])
    v_new = store.read_as_of(spark, "t", h[1]["seq"])
    diff = snapshot_diff(v_old, v_new, key_cols=["k"], compare_cols=["val"])
    got = {r.k: (r.op, r.old_val, r.new_val) for r in diff.collect()}
    assert got == {
        1: ("delete", "a", None),
        2: ("update", "b", "B"),
        3: ("insert", None, "c"),
    }


def test_scd2_null_attr_transitions(spark):
    """NULL→value and value→NULL are version changes; NULL→NULL is not."""
    rows = [
        (1, None, _ts(1), 1),
        (1, None, _ts(2), 2),
        (1, "a", _ts(3), 3),
        (1, None, _ts(4), 4),
    ]
    df = spark.createDataFrame(rows, "k int, status string, ts timestamp, seq int")
    hist = scd2_from_changelog(
        df, key_cols=["k"], attr_col="status", order_cols=["ts", "seq"], ts_col="ts"
    )
    assert [
        (r.version, r.status) for r in hist.orderBy("version").collect()
    ] == [(1, None), (2, "a"), (3, None)]
