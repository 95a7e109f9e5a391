"""SQL-callable engine functions.

The reference's extensibility surface is the ``osci exec`` escape hatch
(`/root/reference/bin/osci.sh:184-187`); the engine's is real SQL UDFs.
These are **SQL-language UDFs** (Spark 4 ``CREATE FUNCTION ... RETURN
expr``) — pure Catalyst expressions, JVM-side, codegen'd; no Python
round-trip, so they are safe on 100 TB hot paths, unlike ``spark.udf
.register`` Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "CAST(0 AS DOUBLE), (s, x) -> s + x)"
)

SQL_FUNCTIONS: dict[str, str] = {
    "dot_product": (
        "CREATE OR REPLACE TEMPORARY FUNCTION dot_product(a ARRAY<FLOAT>, b ARRAY<FLOAT>) "
        "RETURNS DOUBLE RETURN " + _DOT.format(a="a", b="b")
    ),
    "cosine_sim": (
        "CREATE OR REPLACE TEMPORARY FUNCTION cosine_sim(a ARRAY<FLOAT>, b ARRAY<FLOAT>) "
        "RETURNS DOUBLE RETURN "
        + _DOT.format(a="a", b="b")
        + " / (sqrt(" + _DOT.format(a="a", b="a") + ") * sqrt(" + _DOT.format(a="b", b="b") + "))"
    ),
    # NOTE: token_count('') = 1 (split of an empty string yields ['']) —
    # a deliberate convention shared with operators/text.py and the
    # DuckDB oracles so engine/oracle hashes agree; callers needing
    # zero-for-empty should guard with length(trim(t)) > 0.
    "token_count": (
        "CREATE OR REPLACE TEMPORARY FUNCTION token_count(t STRING) "
        r"RETURNS INT RETURN size(split(trim(t), '\\s+'))"
    ),
    "text_fingerprint": (
        "CREATE OR REPLACE TEMPORARY FUNCTION text_fingerprint(t STRING) "
        r"RETURNS STRING RETURN md5(regexp_replace(lower(trim(t)), '\\s+', ' '))"
    ),
}


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Register every engine SQL function; returns the registered names."""
    for ddl in SQL_FUNCTIONS.values():
        spark.sql(ddl)
    return sorted(SQL_FUNCTIONS)
