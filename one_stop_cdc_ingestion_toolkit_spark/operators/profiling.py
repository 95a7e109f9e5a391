"""Data-profiling / audit operators (`e177`–`e180`): temporal
autocorrelation, fact-vs-detail amount reconciliation, per-column null
and cardinality profile, and a Benford first-digit audit.

These are the "is the data healthy" queries run against freshly
materialized CDC tables before anything downstream trusts them. All are
single-pass or single-join DataFrame plans with exact-integer cores;
float outputs are ROUNDed at stable precision on both engines.

No reference parity (provisioning CLI — SURVEY §0); engine extensions
per SURVEY §2.5.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from one_stop_cdc_ingestion_toolkit_spark.catalog import tables
from one_stop_cdc_ingestion_toolkit_spark.operators import register

#: e177: autocorrelation lags (days) of the daily event-count series.
ACF_MAX_LAG = 7

#: e178: reconciliation tolerance in cents.
RECON_TOL_CENTS = 1

#: e179: columns profiled (the customer dimension).
PROFILE_COLS = ("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")


@register(
    "a031_autocorrelation",
    f"""WITH daily AS (
         SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
         FROM events GROUP BY day),
       lags AS (SELECT unnest(generate_series(1, {ACF_MAX_LAG})) AS lag),
       paired AS (
         SELECT l.lag, a.n AS x, b.n AS y
         FROM lags l
         JOIN daily a ON TRUE
         JOIN daily b ON b.day = a.day + CAST(l.lag AS INT))
       SELECT CAST(lag AS INT) AS lag,
              CAST(COUNT(*) AS BIGINT) AS n_pairs,
              ROUND(corr(x, y), 4) AS acf
       FROM paired GROUP BY lag ORDER BY lag""",
)
def a031_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily event-count series at lags 1–7: the
    signal that tells a capacity planner whether traffic has a weekly
    rhythm (peak at lag 7) or is trend-dominated (slow decay).

    Shape: one agg to ~30 daily rows, then a broadcast lag-table join
    pairs each day with day+k, one corr() per lag. Pearson corr on
    counts ~10^3 over ≤30 pairs is far inside double precision, so
    ROUND(·, 4) is representation-stable across engines."""
    ev = tables(spark, sf_dir)["events"]
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    lags = spark.range(1, ACF_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    a = daily.alias("a").crossJoin(F.broadcast(lags))
    b = daily.select(
        F.col("day").alias("b_day"), F.col("n").alias("y")
    ).alias("b")
    paired = a.join(
        b, F.col("b_day") == F.expr("date_add(a.day, lag)")
    ).select("lag", F.col("a.n").alias("x"), "y")
    return (
        paired.groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.corr("x", "y"), 4).alias("acf"),
        )
        .orderBy("lag")
    )


@register(
    "a032_amount_reconciliation",
    f"""WITH detail AS (
         SELECT l_orderkey,
                SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                               * (1 + l_tax) * 100) AS BIGINT)) AS calc_cents
         FROM lineitem GROUP BY l_orderkey),
       joined AS (
         SELECT o.o_orderstatus,
                CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS book_cents,
                d.calc_cents
         FROM orders o JOIN detail d ON o.o_orderkey = d.l_orderkey)
       SELECT o_orderstatus,
              CAST(COUNT(*) AS BIGINT) AS n_orders,
              CAST(SUM(CASE WHEN abs(book_cents - calc_cents)
                                > {RECON_TOL_CENTS} THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_mismatched,
              CAST(MAX(abs(book_cents - calc_cents)) AS BIGINT)
                AS max_abs_diff_cents,
              CAST(SUM(book_cents - calc_cents) AS BIGINT) AS net_diff_cents
       FROM joined GROUP BY o_orderstatus ORDER BY o_orderstatus""",
)
def a032_amount_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-vs-detail amount reconciliation: recompute each order's total
    from its lineitems (price × (1−discount) × (1+tax)) and compare to
    the booked ``o_totalprice`` — the first audit an ingestion pipeline
    runs after a backfill, because partial applies and lost updates show
    up here as per-order cent drift long before anyone reads a report.

    Exactness: the per-line product is one fixed IEEE expression tree
    (identical in both engines), rounded to cents BEFORE summation, so
    per-order sums are exact BIGINTs — order-independent. One shuffle on
    orderkey (partial aggs collapse lineitems map-side), one
    orderkey-equi-join against orders, tiny status-keyed final agg."""
    li = tables(spark, sf_dir)["lineitem"]
    o = tables(spark, sf_dir)["orders"]
    detail = li.groupBy("l_orderkey").agg(
        F.sum(
            F.round(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
                * 100
            ).cast("long")
        ).alias("calc_cents")
    )
    joined = o.select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("book_cents"),
    ).join(detail, F.col("o_orderkey") == F.col("l_orderkey"))
    diff = F.col("book_cents") - F.col("calc_cents")
    return (
        joined.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.when(F.abs(diff) > RECON_TOL_CENTS, 1).otherwise(0)
            ).alias("n_mismatched"),
            F.max(F.abs(diff)).alias("max_abs_diff_cents"),
            F.sum(diff).alias("net_diff_cents"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "a033_null_profile",
    " UNION ALL ".join(
        f"""SELECT '{c}' AS col_name,
               CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct
            FROM customer"""
        for c in PROFILE_COLS
    )
    + " ORDER BY col_name",
)
def a033_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column null count + distinct cardinality of the customer
    dimension — the schema-health profile emitted after every snapshot
    load (a column whose null count jumps or whose cardinality collapses
    is the classic symptom of a broken upstream extract).

    The engine computes ALL columns in ONE scan (a single agg row of
    2×N exprs, then an explode to long format) — not N scans like the
    naive per-column UNION the oracle runs; count(DISTINCT) for several
    columns in one agg expands via Catalyst's expand-and-partial-agg,
    still one pass over the data."""
    c = tables(spark, sf_dir)["customer"]
    wide = c.agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)), F.lit(0)
            ).alias(f"null_{col}")
            for col in PROFILE_COLS
        ],
        *[
            F.countDistinct(F.col(col)).alias(f"dist_{col}")
            for col in PROFILE_COLS
        ],
    )
    stack_expr = ", ".join(
        f"'{col}', null_{col}, dist_{col}" for col in PROFILE_COLS
    )
    return (
        wide.select(
            F.expr(
                f"stack({len(PROFILE_COLS)}, {stack_expr}) "
                "AS (col_name, n_null, n_distinct)"
            )
        )
        .select(
            "col_name",
            F.col("n_null").cast("long").alias("n_null"),
            F.col("n_distinct").cast("long").alias("n_distinct"),
        )
        .orderBy("col_name")
    )


_BENFORD = {d: math.log10(1 + 1 / d) for d in range(1, 10)}

@register(
    "a034_benford_audit",
    f"""WITH digits AS (
         SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                                 AS VARCHAR), 1, 1) AS INT) AS digit
         FROM orders WHERE o_totalprice >= 1),
       counts AS (
         SELECT digit, CAST(COUNT(*) AS BIGINT) AS n
         FROM digits GROUP BY digit),
       tot AS (SELECT SUM(n) AS total FROM counts),
       exp_t AS (
         SELECT digit, CAST(b AS DOUBLE) AS benford_pct FROM (VALUES
           {", ".join(f"({d}, {_BENFORD[d]:.10f})" for d in range(1, 10))})
           AS t(digit, b))
       SELECT c.digit, c.n,
              ROUND(CAST(c.n AS DOUBLE) / tot.total, 4) AS pct,
              ROUND(e.benford_pct, 4) AS benford_pct,
              ROUND(ABS(CAST(c.n AS DOUBLE) / tot.total - e.benford_pct), 4)
                AS abs_dev
       FROM counts c JOIN exp_t e ON c.digit = e.digit, tot
       ORDER BY c.digit""",
)
def a034_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of order totals: empirical leading-digit
    shares vs Benford's law (P(d) = log10(1+1/d)) — the standard
    screen for fabricated or truncated monetary data; synthetic uniform
    prices fail it loudly, which is itself a useful data-provenance
    signal. One scan, 9-group agg, broadcast expectation literals."""
    o = tables(spark, sf_dir)["orders"]
    digits = o.filter(F.col("o_totalprice") >= 1).select(
        F.substring(
            F.floor("o_totalprice").cast("long").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    counts = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    # expectation as an element_at over literal constants (same
    # 10-decimal literals as the oracle's VALUES table) and the total
    # as a window over the 9-row aggregate — ONE job, no driver-side
    # table, no broadcast round-trips. The lit(1) partition is bounded
    # by construction (digits 1-9).
    exp_arr = F.array(
        *[F.lit(float(f"{_BENFORD[d]:.10f}")) for d in range(1, 10)]
    )
    benford = F.element_at(exp_arr, F.col("digit"))
    total = F.sum("n").over(W.partitionBy(F.lit(1)))
    pct = F.col("n").cast("double") / total
    return (
        counts.select(
            "digit",
            "n",
            F.round(pct, 4).alias("pct"),
            F.round(benford, 4).alias("benford_pct"),
            F.round(F.abs(pct - benford), 4).alias("abs_dev"),
        )
        .orderBy("digit")
    )
