"""Operator registry: every engine operator registers a named query spec.

A :class:`QuerySpec` bundles the DataFrame-API implementation with the
dialect-portable (or DuckDB-dialect) oracle SQL that the correctness
harness replays. Operators whose semantics are not SQL-expressible set
``oracle=None`` and get a weaker rows-only check (driver contract,
``/root/repo/__spark_entry__.py``).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB-runnable SQL, or None for rows-only check


#: Global registry, populated by operator modules at import time.
REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name, fn, oracle)
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module so REGISTRY is fully populated."""
    from one_stop_cdc_ingestion_toolkit_spark.operators import (  # noqa: F401
        dedup,
        extras,
        multimodal,
        relational,
        relational2,
        similarity,
        text,
    )

    return REGISTRY
