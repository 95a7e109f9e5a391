"""Co-located bucketed joins: the fact-fact join plans with ZERO
shuffle once both sides are bucketed on the join key."""

from __future__ import annotations

from pyspark.sql import functions as F

from one_stop_cdc_ingestion_toolkit_spark.bucketing import cobucket_tables
from tests.conftest import SF_DIR


def test_bucketed_join_has_no_exchange(spark):
    """With broadcast disabled (simulating two large fact tables), the
    co-bucketed join must be a SortMergeJoin with NO Exchange feeding it."""
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    cobucket_tables(
        spark,
        {
            "li_bkt": (li, ["l_orderkey"]),
            "o_bkt": (o, ["o_orderkey"]),
        },
        n_buckets=8,
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("li_bkt").join(
            spark.table("o_bkt"), F.col("l_orderkey") == F.col("o_orderkey")
        )
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan[:500]
        assert "Exchange" not in plan, plan[:800]
        # the same join over the raw (unbucketed) parquet MUST shuffle
        plain = li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        plain.collect()
        assert "Exchange" in plain._jdf.queryExecution().executedPlan().toString()
        # result parity
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
