"""Recursive-CTE operators (`e182`–`e183`): Spark 4's ``WITH RECURSIVE``
surface (SPARK-24497, public as of Spark 4.0) exercised on hierarchy
rollup and date-spine gap filling — the two canonical recursive-SQL
workloads. DuckDB speaks the same ANSI recursive dialect, so the oracle
is near-verbatim.

Scale notes: recursive CTE execution in Spark materializes one
DataFrame per iteration (like the engine's own `connected_components`
loop) — fine when depth is LOGARITHMIC in data (hierarchies) or bounded
by a calendar, pathological on high-branching graph closures where path
counts explode; for those the engine's pointer-jumping CC
(`advanced.connected_components`, O(log n) rounds with lineage
truncation) is the right tool and the docstrings say so.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from one_stop_cdc_ingestion_toolkit_spark.catalog import tables
from one_stop_cdc_ingestion_toolkit_spark.operators import register

#: decimal-digit hierarchy: parent(c) = c DIV 10 — a deterministic
#: synthetic forest over custkeys (roots are custkeys 0–9; the step's
#: ``>= 10`` guard cuts node 0's would-be self-loop), depth ≈
#: log10(|customers|). Stands in for org/category hierarchies.
_HIER_SQL = """
WITH RECURSIVE chain(custkey, depth) AS (
  SELECT c_custkey, 0 FROM customer WHERE c_custkey < 10
  UNION ALL
  SELECT c.c_custkey, chain.depth + 1
  FROM customer c JOIN chain ON c.c_custkey {div} 10 = chain.custkey
  WHERE c.c_custkey >= 10
)
SELECT CAST(depth AS INT) AS depth,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(MIN(custkey) AS BIGINT) AS min_custkey,
       CAST(MAX(custkey) AS BIGINT) AS max_custkey
FROM chain GROUP BY depth ORDER BY depth
"""


@register("a036_hierarchy_rollup", _HIER_SQL.format(div="//"))
def a036_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-depth census of a customer hierarchy computed with Spark 4's
    ``WITH RECURSIVE`` — roots (custkey < 10) seed the walk and each
    round joins the next decimal-digit generation, so iteration count
    is log10(N), not N.

    Every node has exactly ONE parent, so the recursion's working set
    shrinks geometrically and path count stays linear — the safe shape
    for recursive CTEs. (Transitive closure over the near-dup graph
    would NOT be: template cliques explode path counts; use
    `advanced.connected_components`' pointer jumping there.)"""
    tables(spark, sf_dir)["customer"].createOrReplaceTempView("customer")
    return spark.sql(_HIER_SQL.format(div="DIV"))


_SPINE_SQL = """
WITH RECURSIVE
bounds AS (
  SELECT CAST(MIN(ts) AS DATE) AS d0,
         CAST(MAX(ts) AS DATE) AS d1
  FROM events),
spine(day) AS (
  SELECT d0 FROM bounds
  UNION ALL
  SELECT day + INTERVAL 1 DAY FROM spine
  WHERE day < (SELECT d1 FROM bounds)
),
daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY day)
SELECT CAST(s.day AS DATE) AS day,
       COALESCE(d.n_events, 0) AS n_events,
       CAST(CASE WHEN d.n_events IS NULL THEN 1 ELSE 0 END AS INT) AS is_gap
FROM spine s LEFT JOIN daily d ON d.day = s.day
ORDER BY day
"""


@register("a037_date_spine_gaps", _SPINE_SQL)
def a037_date_spine_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled event calendar: a recursive date spine from min to max
    event date, left-joined to daily event counts so ZERO-activity days
    become visible rows (``is_gap=1``) — the audit that catches a stuck
    ingestion day, which a plain GROUP BY silently omits.

    Recursion depth = calendar days (the events window, well under
    Spark's default 100-level cap); the production
    alternative is ``explode(sequence(d0, d1))`` (one codegen step, no
    iteration) — e172/e181 use that form; this one exists to keep the
    ANSI-recursive surface covered and oracle-checked."""
    ev = tables(spark, sf_dir)["events"]
    ev.createOrReplaceTempView("events")
    # Inline the date bounds as literals (one bounded 1-row agg): the
    # recursive step otherwise re-evaluates the `(SELECT d1 ...)` bounds
    # subquery — a full events scan — on EVERY level, 30x the work.
    from pyspark.sql import functions as F

    b = ev.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    ).first()
    sql = (
        _SPINE_SQL.replace("INTERVAL 1 DAY", "INTERVAL '1' DAY")
        .replace("SELECT d0 FROM bounds", f"SELECT DATE '{b['d0']}'")
        .replace("(SELECT d1 FROM bounds)", f"DATE '{b['d1']}'")
    )
    return spark.sql(sql)
