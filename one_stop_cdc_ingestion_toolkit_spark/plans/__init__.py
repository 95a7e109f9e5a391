"""Physical-plan inspection helpers.

The engine's scale posture is enforced, not hoped for: tests assert that
filters/projections reach the parquet scan, small dims broadcast, and
top-k plans use TakeOrderedAndProject — the properties that keep the same
code fast at 100 TB (SURVEY §4.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True when the parquet scan's PushedFilters mention ``fragment``."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and fragment in line:
            return True
    return False


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column names in the (first) parquet scan's ReadSchema — the pruning
    check: a 2-column projection must not read 16 columns."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "ReadSchema" in line:
            inner = line.split("struct<", 1)[-1].rsplit(">", 1)[0]
            return [p.split(":")[0].strip() for p in inner.split(",") if ":" in p]
    return []


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df) or "BroadcastNestedLoopJoin" in physical_plan(df)


def uses_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in physical_plan(df)


def codegen_stage_count(df: DataFrame, execute: bool = True) -> int:
    """WholeStageCodegen spans in the plan. Under AQE the final plan only
    exists after execution, so this triggers the query by default."""
    import re

    if execute:
        df.collect()  # count() would finalize a DIFFERENT (derived) plan
    ids = re.findall(r"codegen id : (\d+)", formatted_plan(df))
    return len(set(ids))
