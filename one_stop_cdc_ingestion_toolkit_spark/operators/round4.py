"""Round-4 extension batch (`a040`–`a042` (né g184–g186)): leakage-safe temporal
holdout, per-source quantile-normalized quality, and embedding
distribution-drift audit.

No reference parity (the reference is a provisioning CLI — SURVEY §0);
training-data-pipeline extensions per SURVEY §2.5. Names sort AFTER the
round-4 correctness window (a001–a110) by design — they rotate into a
later round's window per PARITY.md "Driver-window rotation".

Scale shapes:

- a040 derives its split boundaries from the global [min, max] event
  time with exact integer arithmetic (no floats), broadcast back as one
  row; assignment is a map-side codegen CASE and the report is one
  partial-agg shuffle.
- a041's normalization is percent_rank PARTITIONED by source — the
  window sorts each source's documents independently (never a global
  single-partition sort), and the decile report is one small agg.
- a042 is a posexplode + (dim, half) partial agg: the shuffle carries
  EMB_DIM × 2 accumulator rows regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from one_stop_cdc_ingestion_toolkit_spark.catalog import tables
from one_stop_cdc_ingestion_toolkit_spark.operators import register
from one_stop_cdc_ingestion_toolkit_spark.operators.text import quality_score
from one_stop_cdc_ingestion_toolkit_spark.operators.neardup2 import _DUCK_QUALITY

#: a040 temporal-holdout fractions: train < 80% of the observed time
#: range, a 10% quarantine gap, test ≥ 90% — the gap absorbs sessions /
#: documents straddling the boundary so near-boundary leakage cannot
#: put the same interaction on both sides.
TRAIN_FRAC_TENTHS = 8
TEST_FRAC_TENTHS = 9


@register(
    "a040_temporal_split",
    f"""WITH b AS (
         SELECT epoch_us(MIN(ts)) AS tmin, epoch_us(MAX(ts)) AS tmax
         FROM events),
       lim AS (
         SELECT tmin + (tmax - tmin) * {TRAIN_FRAC_TENTHS} // 10 AS t1,
                tmin + (tmax - tmin) * {TEST_FRAC_TENTHS} // 10 AS t2
         FROM b),
       tagged AS (
         SELECT CASE WHEN epoch_us(e.ts) < lim.t1 THEN 'train'
                     WHEN epoch_us(e.ts) < lim.t2 THEN 'gap'
                     ELSE 'test' END AS split,
                e.user_id, epoch_us(e.ts) AS us
         FROM events e CROSS JOIN lim)
       SELECT split,
              CAST(COUNT(*) AS BIGINT) AS n_events,
              CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
              CAST(MIN(us) AS BIGINT) AS min_us,
              CAST(MAX(us) AS BIGINT) AS max_us
       FROM tagged GROUP BY split ORDER BY split""",
)
def a040_temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe temporal holdout over the event stream: train on the
    first 80% of observed time, quarantine the next 10% (the gap bounds
    boundary leakage from sessions straddling the cut), test on the
    last 10%. Boundaries are exact integer epoch-microsecond arithmetic
    on the broadcast [min, max] row — no float drift between engines —
    and the per-split report (events, distinct users, actual time span)
    is the audit a team checks before trusting an offline eval."""
    ev = tables(spark, sf_dir)["events"]
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    b = ev.agg(
        F.min(us).alias("tmin"), F.max(us).alias("tmax")
    ).select(
        (F.col("tmin") + ((F.col("tmax") - F.col("tmin")) * TRAIN_FRAC_TENTHS / 10).cast("long")).alias("t1"),
        (F.col("tmin") + ((F.col("tmax") - F.col("tmin")) * TEST_FRAC_TENTHS / 10).cast("long")).alias("t2"),
    )
    split = (
        F.when(us < F.col("t1"), F.lit("train"))
        .when(us < F.col("t2"), F.lit("gap"))
        .otherwise(F.lit("test"))
    )
    return (
        ev.crossJoin(F.broadcast(b))
        .select(split.alias("split"), "user_id", us.alias("us"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.min("us").alias("min_us"),
            F.max("us").alias("max_us"),
        )
        .orderBy("split")
    )


@register(
    "a041_quantile_norm_quality",
    f"""WITH q AS (
         SELECT source, {_DUCK_QUALITY} AS quality FROM documents),
       pr AS (
         SELECT source, quality,
                PERCENT_RANK() OVER (PARTITION BY source
                                     ORDER BY quality) AS p
         FROM q)
       SELECT source,
              CAST(LEAST(9, CAST(FLOOR(p * 10) AS INT)) AS INT) AS decile,
              CAST(COUNT(*) AS BIGINT) AS n_docs,
              ROUND(AVG(quality), 4) AS avg_raw_quality
       FROM pr GROUP BY source, decile ORDER BY source, decile""",
)
def a041_quantile_norm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quantile normalization of the quality score: a doc's
    normalized score is its percent_rank WITHIN its source, so "top 10%
    of source X" is comparable to "top 10% of source Y" even when the
    sources' raw-score distributions differ wildly (the reason raw
    cross-source quality thresholds systematically starve verbose
    sources). Reported as per-(source, decile) counts with the mean raw
    score — the calibration table a mixing policy reads. The window is
    PARTITIONED by source (each source sorts independently — no global
    sort); ties get identical percent_rank in both engines."""
    d = tables(spark, sf_dir)["documents"]
    q = d.select("source", quality_score(F.col("text")).alias("quality"))
    p = F.percent_rank().over(W.partitionBy("source").orderBy("quality"))
    decile = F.least(F.lit(9), F.floor(p * 10).cast("int")).cast("int")
    return (
        q.select("source", "quality", decile.alias("decile"))
        .groupBy("source", "decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("quality"), 4).alias("avg_raw_quality"),
        )
        .orderBy("source", "decile")
    )


@register(
    "a042_embedding_drift",
    """WITH x AS (
         SELECT vec_id % 2 AS half, i.pos,
                CAST(embedding[i.pos + 1] AS DOUBLE) AS v
         FROM embeddings,
              (SELECT unnest(generate_series(0,
                      len((SELECT embedding FROM embeddings LIMIT 1)) - 1))
                      AS pos) i),
       m AS (
         SELECT pos,
                ROUND(AVG(CASE WHEN half = 0 THEN v END), 6) AS mean_even,
                ROUND(AVG(CASE WHEN half = 1 THEN v END), 6) AS mean_odd
         FROM x GROUP BY pos)
       SELECT CAST(pos AS INT) AS dim, mean_even, mean_odd,
              ROUND(ABS(mean_even - mean_odd), 6) AS drift
       FROM m ORDER BY dim""",
)
def a042_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding drift between the two id-parity halves of
    the corpus — the cheap canary for 'did my embedding distribution
    shift between ingestion waves' (run it between any two real slices
    by swapping the predicate): a dimension whose mean moves is the
    first sign of an encoder or preprocessing change that silently
    breaks ANN indexes trained on the old distribution. posexplode +
    one (dim)-keyed partial agg — the shuffle carries EMB_DIM
    accumulator rows, not vectors. Means are ROUND(·, 6): addend-order
    float drift is ~1e-12 relative, far below the rounding."""
    e = tables(spark, sf_dir)["embeddings"]
    x = e.select(
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode("embedding").alias("pos", "v"),
    ).select("half", "pos", F.col("v").cast("double").alias("v"))
    return (
        x.groupBy("pos")
        .agg(
            F.round(F.avg(F.when(F.col("half") == 0, F.col("v"))), 6).alias(
                "mean_even"
            ),
            F.round(F.avg(F.when(F.col("half") == 1, F.col("v"))), 6).alias(
                "mean_odd"
            ),
        )
        .select(
            F.col("pos").cast("int").alias("dim"),
            "mean_even",
            "mean_odd",
            F.round(
                F.abs(F.col("mean_even") - F.col("mean_odd")), 6
            ).alias("drift"),
        )
        .orderBy("dim")
    )
