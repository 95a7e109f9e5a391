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


def _shuffle_exchange_lines(df: DataFrame, kinds: str) -> int:
    """Count physical-plan LINES whose operator is a shuffle Exchange of
    the given kinds. Line-based on purpose (review r8): a
    ``ReusedExchange [...], Exchange hashpartitioning(...)`` line embeds
    its child's Exchange text, so a substring count would report a
    REUSED shuffle (strictly cheaper — the files are read, not
    re-shuffled) as a second physical one."""
    import re

    rx = re.compile(rf"^[\s+\-:*()\d]*Exchange (?:{kinds})")
    return sum(
        1
        for line in physical_plan(df).splitlines()
        if "ReusedExchange" not in line and rx.match(line)
    )


def exchange_count(df: DataFrame) -> int:
    """SHUFFLE Exchange nodes in the physical plan — the number the
    single-shuffle claims in SURVEY §2.5 are about. BroadcastExchange is
    excluded (broadcasting a small side is the cheap path those claims
    recommend) and ReusedExchange is excluded (it re-reads an existing
    shuffle's files — no second shuffle happens). RoundRobin
    (repartition(n)) counts (review r8 — it is a full shuffle). Counted
    on the initial plan, pre-AQE: AQE can only COALESCE these exchanges
    at runtime, never add one, so the initial count is the worst case a
    plan edit must not silently grow."""
    return _shuffle_exchange_lines(df, "hash|range|Single|RoundRobin")


def hash_exchange_count(df: DataFrame) -> int:
    """Only the ``Exchange hashpartitioning`` nodes — the key shuffles the
    "one key shuffle end-to-end" claims are about (the final presentation
    ``orderBy`` adds one rangepartitioning that those claims exclude)."""
    return _shuffle_exchange_lines(df, "hash")


def codegen_stage_count(df: DataFrame, execute: bool = True) -> int:
    """WholeStageCodegen spans in the plan. Under AQE the final plan only
    exists after execution, so this triggers the query by default."""
    import re

    if execute:
        df.collect()  # count() would finalize a DIFFERENT (derived) plan
    ids = re.findall(r"codegen id : (\d+)", formatted_plan(df))
    return len(set(ids))
