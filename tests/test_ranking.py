"""behavior.exact_ntile / exact_row_number must equal the built-in
window functions on ANY input — including n < k, heavy ties, and empty
frames — while never planning a zero-partition window themselves."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from one_stop_cdc_ingestion_toolkit_spark.operators import release_caches
from one_stop_cdc_ingestion_toolkit_spark.operators.behavior import (
    exact_ntile,
    exact_row_number,
)


@pytest.mark.parametrize("n,k", [(1, 4), (3, 4), (4, 4), (17, 4), (40, 10), (100, 7)])
def test_exact_ntile_matches_window_ntile(spark, n, k):
    # values with heavy ties (v = i % 5); id is the tie-break
    df = spark.range(n).select(
        F.col("id"), (F.col("id") % 5).alias("v")
    )
    got = {
        r["id"]: r["b"]
        for r in exact_ntile(df, [F.col("v"), F.col("id")], k, "b").collect()
    }
    want = {
        r["id"]: r["b"]
        for r in df.select(
            "id", F.ntile(k).over(W.orderBy("v", "id")).alias("b")
        ).collect()
    }
    release_caches()
    assert got == want


def test_exact_row_number_matches_window(spark):
    df = spark.range(57).select(F.col("id"), (F.col("id") % 3).alias("v"))
    got = {
        r["id"]: r["rn"]
        for r in exact_row_number(
            df, [F.col("v").desc(), F.col("id")], "rn"
        ).collect()
    }
    want = {
        r["id"]: r["rn"]
        for r in df.select(
            "id",
            F.row_number().over(W.orderBy(F.col("v").desc(), "id")).alias("rn"),
        ).collect()
    }
    release_caches()
    assert got == want
