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

#: DataFrames persisted by operators during query construction. Operators
#: that cache an intermediate (LSH bands, inverted indexes, signatures)
#: register it here so long-lived sessions (bench loops, the driver's
#: 79-query sweep) can release storage memory between queries instead of
#: accumulating cached blocks until executor eviction.
_LIVE_CACHES: list[DataFrame] = []


def track_cache(df: DataFrame) -> DataFrame:
    """``df.persist()`` with session-scoped bookkeeping (see release_caches)."""
    df = df.persist()
    _LIVE_CACHES.append(df)
    return df


def release_caches() -> int:
    """Unpersist every tracked cache; returns how many were released.

    Call between queries in sweep/bench loops. Blocking=False: eviction
    proceeds asynchronously, the next query does not wait on it.
    """
    n = 0
    while _LIVE_CACHES:
        _LIVE_CACHES.pop().unpersist(blocking=False)
        n += 1
    return n


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
        pipeline_ops,
        relational,
        relational2,
        similarity,
        text,
    )

    return REGISTRY
