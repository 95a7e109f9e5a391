"""Plan-shape assertions: the properties that keep these operators fast at
100 TB (SURVEY §4.2/§4.4) — pushdown, pruning, broadcast, top-k plans."""

from __future__ import annotations

from one_stop_cdc_ingestion_toolkit_spark.operators.relational import (
    q02_project_filter,
    q05_star_join,
    q27_topk,
    q36_correlated_scalar,
    q42_revenue_join,
)
from one_stop_cdc_ingestion_toolkit_spark.plans import (
    codegen_stage_count,
    has_pushed_filter,
    scan_read_schema,
    uses_broadcast_join,
    uses_take_ordered,
)
from tests.conftest import SF_DIR


def test_filter_and_projection_pushdown(spark):
    df = q02_project_filter(spark, SF_DIR)
    assert has_pushed_filter(df, "l_quantity"), "filter must reach the parquet scan"
    cols = scan_read_schema(df)
    assert set(cols) == {"l_orderkey", "l_linenumber", "l_quantity"}, (
        f"scan must read only projected columns, got {cols}"
    )


def test_star_join_broadcasts_dims(spark):
    df = q05_star_join(spark, SF_DIR)
    assert uses_broadcast_join(df), "nation/region must broadcast"


def test_topk_uses_take_ordered(spark):
    assert uses_take_ordered(q27_topk(spark, SF_DIR))
    assert uses_take_ordered(q42_revenue_join(spark, SF_DIR))


def test_decorrelated_subquery_broadcasts(spark):
    assert uses_broadcast_join(q36_correlated_scalar(spark, SF_DIR))


def test_whole_stage_codegen_present(spark):
    assert codegen_stage_count(q42_revenue_join(spark, SF_DIR)) >= 2
