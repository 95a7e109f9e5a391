"""Additional query-surface operators: pivot, date arithmetic, grouped-map
Pandas UDF, approximate aggregates.

These round out the downstream-query capabilities a reference user gets
from Spark/Hudi atop the CDC lake (SURVEY §2.3): the pivot and date
queries are oracle-checked; the approx sketches are engine-native
(sketch values differ across engines by design) and are bounds-tested
against exact counts instead.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from one_stop_cdc_ingestion_toolkit_spark.catalog import tables
from one_stop_cdc_ingestion_toolkit_spark.operators import register


@register(
    "b56_pivot",
    """SELECT l_returnflag,
              COUNT(*) FILTER (WHERE l_linestatus = 'F') AS f_cnt,
              COUNT(*) FILTER (WHERE l_linestatus = 'O') AS o_cnt,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS f_qty,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS o_qty
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
)
def b56_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot on l_linestatus. Spark's pivot with an explicit value list is
    a single-pass conditional aggregation — same plan the FILTER-clause
    oracle describes; no extra shuffle versus a plain groupBy."""
    li = tables(spark, sf_dir)["lineitem"]
    piv = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"),
        )
    )
    return piv.select(
        "l_returnflag",
        F.col("F_cnt").alias("f_cnt"),
        F.col("O_cnt").alias("o_cnt"),
        F.col("F_qty").cast("double").alias("f_qty"),
        F.col("O_qty").cast("double").alias("o_qty"),
    ).orderBy("l_returnflag")


@register(
    "b57_date_arith",
    """SELECT o_orderkey,
              CAST(o_orderdate AS DATE) + 30 AS due,
              CAST(o_orderdate AS DATE) - INTERVAL 7 DAY AS reminded,
              EXTRACT(DOW FROM o_orderdate) AS dow
       FROM orders WHERE o_orderkey <= 1000 ORDER BY o_orderkey""",
)
def b57_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic. DOW normalized: Spark dayofweek is 1=Sunday,
    DuckDB EXTRACT(DOW) is 0=Sunday — subtract 1 on the Spark side."""
    o = tables(spark, sf_dir)["orders"]
    return (
        o.filter(F.col("o_orderkey") <= 1000)
        .select(
            "o_orderkey",
            F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due"),
            F.date_sub(F.col("o_orderdate").cast("date"), 7).cast("timestamp").alias(
                "reminded"
            ),
            (F.dayofweek("o_orderdate") - 1).alias("dow"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "b58_zscore_pandas",
    """SELECT doc_id,
              ROUND((n_chars - AVG(n_chars) OVER (PARTITION BY lang))
                    / STDDEV_SAMP(n_chars) OVER (PARTITION BY lang), 4) AS z
       FROM documents ORDER BY doc_id""",
)
def b58_zscore_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language doc-length z-scores via applyInPandas (grouped-map
    Pandas UDF — the Arrow batch path for per-group logic Spark lacks;
    here checkable because z-scores are SQL-expressible too).

    Scale shape: one shuffle on lang; each group processed as a pandas
    frame inside the executor. Groups must fit in executor memory — for
    skewed/huge groups prefer the window-function form (the oracle SQL).
    """
    d = tables(spark, sf_dir)["documents"]

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        mu = pdf["n_chars"].mean()
        sd = pdf["n_chars"].std(ddof=1)
        if pd.isna(sd) or sd == 0:
            # SQL: STDDEV_SAMP over 1 row is NULL (and x/0 is NULL) —
            # mirror as None, not pandas NaN
            z = pd.Series([None] * len(pdf), dtype="float64")
        else:
            v = (pdf["n_chars"] - mu) / sd
            # SQL ROUND is half-away-from-zero; pandas .round is half-even
            z = np.sign(v) * np.floor(np.abs(v) * 1e4 + 0.5) / 1e4
        return pd.DataFrame({"doc_id": pdf["doc_id"], "z": z})

    return (
        d.select("doc_id", "lang", "n_chars")
        .groupBy("lang")
        .applyInPandas(zscore, "doc_id long, z double")
        .orderBy("doc_id")
    )


def approx_distinct_stats(df: DataFrame, col: str, rsd: float = 0.05) -> DataFrame:
    """approx_count_distinct (HLL sketch) next to the exact count — the
    constant-memory path for 100 TB cardinality estimation."""
    return df.agg(
        F.approx_count_distinct(col, rsd).alias("approx"),
        F.countDistinct(col).alias("exact"),
    )


def approx_quantiles(df: DataFrame, col: str, probs: list[float]) -> list[float]:
    """Greenwald-Khanna approximate quantiles (single pass, mergeable)."""
    return df.approxQuantile(col, probs, 0.01)


@register(
    "b66_unpivot",
    """SELECT p_partkey, metric, val FROM (
         SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS val
         FROM part
         UNION ALL
         SELECT p_partkey, 'retail', CAST(p_retailprice AS DOUBLE) FROM part
       ) t
       WHERE p_partkey <= 300 ORDER BY p_partkey, metric""",
)
def b66_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide → long) via the native melt/unpivot operator — one
    Expand node, a single scan, no self-union."""
    p = tables(spark, sf_dir)["part"]
    return (
        p.filter(F.col("p_partkey") <= 300)
        .select(
            "p_partkey",
            F.col("p_size").cast("double").alias("size"),
            F.col("p_retailprice").cast("double").alias("retail"),
        )
        .unpivot("p_partkey", ["size", "retail"], "metric", "val")
        .orderBy("p_partkey", "metric")
    )


@register(
    "a67_cohort_retention",
    """WITH firsts AS (
         SELECT user_id, CAST(MIN(date_trunc('day', ts)) AS DATE) AS cohort
         FROM events GROUP BY user_id
       ),
       activity AS (
         SELECT DISTINCT e.user_id, f.cohort,
                datediff('day', f.cohort, CAST(date_trunc('day', e.ts) AS DATE)) AS day_n
         FROM events e JOIN firsts f ON e.user_id = f.user_id
       )
       SELECT cohort, day_n, COUNT(*) AS n_users
       FROM activity WHERE day_n <= 7
       GROUP BY cohort, day_n ORDER BY cohort, day_n""",
)
def a67_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen day, distinct active
    users per day-offset. Two keyed shuffles (first-seen agg + the
    distinct); the join broadcasts the cohort dim when small."""
    ev = tables(spark, sf_dir)["events"]
    day = F.col("ts").cast("date")
    ev_d = ev.select("user_id", day.alias("day"))
    firsts = ev_d.groupBy("user_id").agg(F.min("day").alias("cohort"))
    activity = (
        ev_d.join(firsts, "user_id")
        .select("user_id", "cohort", F.datediff("day", "cohort").alias("day_n"))
        .distinct()
    )
    return (
        activity.filter(F.col("day_n") <= 7)
        .groupBy("cohort", "day_n")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort", "day_n")
    )


@register(
    "b68_geomean_udaf",
    """SELECT lang, ROUND(EXP(AVG(LN(n_chars))), 4) AS gm
       FROM documents WHERE n_chars > 0 GROUP BY lang ORDER BY lang""",
)
def b68_geomean_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometric mean as a grouped-aggregate Pandas UDF — the UDAF shape
    of the engine's Python surface (scalar pandas_udf and grouped-map
    applyInPandas are shown elsewhere). Arrow-batched; partial
    aggregation does NOT apply to pandas UDAFs, so at 100 TB favor the
    algebraic identity exp(avg(ln x)) (the oracle text) which does."""
    import numpy as np

    @F.pandas_udf("double")
    def geomean(v: pd.Series) -> float:
        return float(np.exp(np.log(v).mean()))

    d = tables(spark, sf_dir)["documents"]
    return (
        d.filter(F.col("n_chars") > 0)
        .groupBy("lang")
        .agg(F.round(geomean("n_chars"), 4).alias("gm"))
        .orderBy("lang")
    )


@register(
    "b59_approx_distinct",
    """SELECT COUNT(DISTINCT l_partkey) AS exact, TRUE AS within_rsd
       FROM lineitem""",
)
def b59_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL sketch vs exact, as an oracle-checkable CONTRACT: the raw
    approx value is engine-specific (Spark HLL++ vs DuckDB's sketch), so
    the query emits the exact count plus a boolean asserting the sketch
    landed within 3x its configured rsd (3 sigma ~ 99.7% of runs; the
    sketch is deterministic for fixed input, so this is stable, not
    flaky). The oracle emits literal TRUE — a hash match proves the
    engine's estimate honored the tolerance."""
    li = tables(spark, sf_dir)["lineitem"]
    rsd = 0.05
    stats = approx_distinct_stats(li, "l_partkey", rsd)
    return stats.select(
        "exact",
        (
            F.abs(F.col("approx") - F.col("exact"))
            <= F.lit(3 * rsd) * F.col("exact")
        ).alias("within_rsd"),
    )


@register(
    "b62_analytic_funcs",
    """SELECT c_custkey,
              FIRST_VALUE(c_custkey) OVER (PARTITION BY c_nationkey
                                           ORDER BY c_custkey) AS fv,
              LAST_VALUE(c_custkey) OVER (PARTITION BY c_nationkey
                                          ORDER BY c_custkey
                                          ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND UNBOUNDED FOLLOWING) AS lv,
              ROUND(PERCENT_RANK() OVER (PARTITION BY c_nationkey
                                         ORDER BY c_custkey), 6) AS pr
       FROM customer ORDER BY c_custkey""",
)
def b62_analytic_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    c = tables(spark, sf_dir)["customer"]
    w = W.partitionBy("c_nationkey").orderBy("c_custkey")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return c.select(
        "c_custkey",
        F.first("c_custkey").over(w).alias("fv"),
        F.last("c_custkey").over(w_full).alias("lv"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
    ).orderBy("c_custkey")


@register(
    "b63_except_all",
    """SELECT l_suppkey AS k FROM lineitem WHERE l_quantity > 40
       EXCEPT ALL SELECT s_suppkey FROM supplier
       ORDER BY k""",
)
def b63_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    li = t["lineitem"].filter(F.col("l_quantity") > 40).select(
        F.col("l_suppkey").alias("k")
    )
    s = t["supplier"].select(F.col("s_suppkey").alias("k"))
    return li.exceptAll(s).orderBy("k")


@register(
    "b64_median",
    """SELECT l_returnflag,
              ROUND(CAST(quantile_cont(l_quantity, 0.5) AS DOUBLE), 4) AS med,
              ROUND(CAST(quantile_cont(l_quantity, 0.9) AS DOUBLE), 4) AS p90
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
)
def b64_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles (Spark percentile == SQL
    quantile_cont/percentile_cont definition)."""
    li = tables(spark, sf_dir)["lineitem"]
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.percentile("l_quantity", F.lit(0.5)).cast("double"), 4).alias(
                "med"
            ),
            F.round(F.percentile("l_quantity", F.lit(0.9)).cast("double"), 4).alias(
                "p90"
            ),
        )
        .orderBy("l_returnflag")
    )


@register(
    "b65_bool_aggs",
    """SELECT o_orderstatus,
              BOOL_AND(o_totalprice > 0) AS all_pos,
              BOOL_OR(o_totalprice > 400000) AS any_big,
              COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent
       FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
)
def b65_bool_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tables(spark, sf_dir)["orders"]
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.bool_and(F.col("o_totalprice") > 0).alias("all_pos"),
            F.bool_or(F.col("o_totalprice") > 400000).alias("any_big"),
            F.count_if(F.col("o_orderpriority") == "1-URGENT").alias("n_urgent"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "b60_levenshtein",
    """SELECT p_partkey, levenshtein(p_brand, p_type) AS d,
              levenshtein(p_name, p_brand) AS dn
       FROM part WHERE p_partkey <= 500 ORDER BY p_partkey""",
)
def b60_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance (fuzzy matching primitive for entity dedup)."""
    p = tables(spark, sf_dir)["part"]
    return (
        p.filter(F.col("p_partkey") <= 500)
        .select(
            "p_partkey",
            F.levenshtein("p_brand", "p_type").alias("d"),
            F.levenshtein("p_name", "p_brand").alias("dn"),
        )
        .orderBy("p_partkey")
    )


@register(
    "b61_array_stats",
    """SELECT vec_id, len(embedding) AS n,
              ROUND(CAST(list_max(embedding) AS DOUBLE), 5) AS mx,
              ROUND(CAST(list_min(embedding) AS DOUBLE), 5) AS mn
       FROM embeddings ORDER BY vec_id""",
)
def b61_array_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-column primitives over the embedding fixture."""
    e = tables(spark, sf_dir)["embeddings"]
    return e.select(
        "vec_id",
        F.size("embedding").alias("n"),
        F.round(F.array_max("embedding").cast("double"), 5).alias("mx"),
        F.round(F.array_min("embedding").cast("double"), 5).alias("mn"),
    ).orderBy("vec_id")
