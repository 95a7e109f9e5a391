"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` exposes every registered engine operator;
``oracle_sql()`` gives the DuckDB-runnable oracle per query (omitted for
non-SQL-expressible ops → rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from one_stop_cdc_ingestion_toolkit_spark.operators import load_all


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q3-ish revenue join) on /root/testdata/sf0.001."""
    from one_stop_cdc_ingestion_toolkit_spark.operators.relational import (
        q42_revenue_join,
    )

    return q42_revenue_join(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in sorted(load_all().items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each SQL-expressible query."""
    return {
        name: spec.oracle
        for name, spec in sorted(load_all().items())
        if spec.oracle is not None
    }
