"""Corpus statistics mining (round-3 ``a1xx`` batch, part 2): Zipf-law
fit, BPE merge-candidate mining, per-source dedup-rate audit, and
robust (median/MAD) length-outlier detection.

All four are whole-stage-codegen DataFrame plans over the ``documents``
table — tokenization is ``split`` + ``explode`` (a pure flatMap, no
shuffle), statistics shuffle only on short keys (word, char-pair,
source). Nothing row-at-a-time, nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from one_stop_cdc_ingestion_toolkit_spark.catalog import tables
from one_stop_cdc_ingestion_toolkit_spark.operators import register

#: Top-N BPE merge candidates reported (a128).
BPE_TOP = 20
#: Robust-z cutoff for length outliers (a130) — the standard 3.5 MAD rule.
MAD_Z = 3.5

#: Shared tokenization rendering (same as corpus._TOK_SQL convention).
_WORDS_SQL = r"string_split_regex(trim(lower(text)), '\s+')"


def _words(df: DataFrame) -> DataFrame:
    """One row per (doc_id, word), lowercase whitespace tokenization —
    identical splitting to the DuckDB twin ``_WORDS_SQL``."""
    return df.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("word"),
    ).filter(F.col("word") != "")


@register(
    "a127_zipf_slope",
    f"""WITH w AS (SELECT unnest({_WORDS_SQL}) AS word FROM documents),
       f AS (SELECT word, COUNT(*) AS freq FROM w WHERE word <> '' GROUP BY word),
       r AS (SELECT freq,
                    ROW_NUMBER() OVER (ORDER BY freq DESC, word) AS rank
             FROM f)
       SELECT CAST(COUNT(*) AS BIGINT) AS n_words,
              ROUND(regr_slope(LN(CAST(freq AS DOUBLE)), LN(CAST(rank AS DOUBLE))), 4)
                  AS slope
       FROM r""",
)
def a127_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit over the corpus vocabulary: OLS slope of
    log(frequency) against log(rank). Natural text sits near -1; a
    synthetic or templated corpus (like this fixture) sits much
    shallower — the statistic is a cheap corpus-authenticity /
    distribution-shift audit.

    Word counting is a map-side-combined agg on the word key; the rank
    window orders the VOCABULARY (key-cardinality rows, not corpus
    rows), and regr_slope is an algebraic aggregate — partials merge,
    so the whole fit is two small shuffles at any corpus size."""
    d = tables(spark, sf_dir)["documents"]
    f = _words(d).groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    from pyspark.sql.window import Window as W

    r = f.select(
        "freq",
        F.row_number()
        .over(W.orderBy(F.col("freq").desc(), F.col("word")))
        .alias("rank"),
    )
    return r.agg(
        F.count(F.lit(1)).alias("n_words"),
        F.round(
            F.regr_slope(
                F.log(F.col("freq").cast("double")), F.log(F.col("rank").cast("double"))
            ),
            4,
        ).alias("slope"),
    )


@register(
    "a128_bpe_pair_counts",
    f"""WITH w AS (SELECT unnest({_WORDS_SQL}) AS word FROM documents),
       f AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
             FROM w WHERE word <> '' GROUP BY word),
       p AS (SELECT unnest(list_transform(
                        generate_series(1, length(word) - 1),
                        i -> word[i:i+1])) AS pair,
                    freq
             FROM f WHERE length(word) >= 2)
       SELECT pair, CAST(SUM(freq) AS BIGINT) AS n
       FROM p GROUP BY pair
       ORDER BY n DESC, pair LIMIT {BPE_TOP}""",
)
def a128_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First BPE merge round: corpus-weighted counts of adjacent
    character pairs — the argmax of this table is the first merge a
    byte-pair-encoding tokenizer would learn. Pair extraction runs over
    the VOCABULARY (word, freq) — corpus volume only affects the word
    count agg, so a 100 TB corpus costs one word shuffle plus a
    vocabulary-sized flatMap. Top-N via TakeOrderedAndProject (no full
    sort)."""
    d = tables(spark, sf_dir)["documents"]
    f = _words(d).groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    pairs = (
        f.filter(F.length("word") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(word) - 1),"
                    " i -> substring(word, i, 2))"
                )
            ).alias("pair"),
            "freq",
        )
        .groupBy("pair")
        .agg(F.sum("freq").alias("n"))
    )
    return pairs.orderBy(F.col("n").desc(), "pair").limit(BPE_TOP)


@register(
    "a129_dedup_rate_by_source",
    r"""WITH n AS (SELECT source,
                      md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
                          AS fp
                  FROM documents)
       SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_distinct,
              ROUND(1.0 - CAST(COUNT(DISTINCT fp) AS DOUBLE) / COUNT(*), 4)
                  AS dup_rate
       FROM n GROUP BY source ORDER BY source""",
)
def a129_dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplication-rate audit — the first scorecard a corpus
    curator pulls before deciding which sources need aggressive dedup.
    Fingerprint = md5 of whitespace-normalized lowercase text, so the
    document body never crosses the shuffle (only the 32-char digest).
    COUNT DISTINCT expands to a two-phase partial agg under AQE; at
    100 TB this is the canonical map-combine + distinct-agg shape."""
    d = tables(spark, sf_dir)["documents"]
    fp = F.md5(
        F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    )
    return (
        d.select("source", fp.alias("fp"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("fp").alias("n_distinct"),
            F.round(
                F.lit(1.0) - F.countDistinct("fp").cast("double") / F.count(F.lit(1)),
                4,
            ).alias("dup_rate"),
        )
        .orderBy("source")
    )


@register(
    "a130_mad_outliers",
    f"""WITH med AS (SELECT source, median(CAST(n_chars AS DOUBLE)) AS med
                    FROM documents GROUP BY source),
       dev AS (SELECT d.source, d.doc_id, d.n_chars, med.med,
                      ABS(d.n_chars - med.med) AS dev
               FROM documents d JOIN med USING (source)),
       mad AS (SELECT source, median(dev) AS mad FROM dev GROUP BY source),
       z AS (SELECT dev.source, dev.med, mad.mad,
                    CASE WHEN mad.mad > 0
                         THEN 0.6745 * (dev.n_chars - dev.med) / mad.mad
                    END AS rz
             FROM dev JOIN mad USING (source))
       SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
              ROUND(ANY_VALUE(med), 4) AS med,
              ROUND(ANY_VALUE(mad), 4) AS mad,
              CAST(COUNT(CASE WHEN ABS(rz) > {MAD_Z} THEN 1 END) AS BIGINT)
                  AS n_outliers,
              ROUND(MAX(ABS(rz)), 4) AS max_abs_z
       FROM z GROUP BY source ORDER BY source""",
)
def a130_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-source length-outlier detection: modified z-score
    0.6745·(x − median)/MAD with the standard 3.5 cutoff — unlike
    mean/stddev (a116's rolling z), one giant document cannot drag the
    threshold, which is the failure mode that makes plain z-scores
    useless on web corpora.

    Three source-keyed aggregations (median, MAD, the final audit) with
    the tiny per-source stats broadcast back between them; the document
    body is never shuffled. Exact medians hold a per-group column —
    at 100 TB swap both medians for approx_percentile (a120 documents
    the sketch-vs-exact contract that calibrates the swap)."""
    d = tables(spark, sf_dir)["documents"].select("source", "doc_id", "n_chars")
    med = d.groupBy("source").agg(
        F.expr("percentile(CAST(n_chars AS DOUBLE), 0.5)").alias("med")
    )
    dev = d.join(F.broadcast(med), "source").withColumn(
        "dev", F.abs(F.col("n_chars") - F.col("med"))
    )
    mad = dev.groupBy("source").agg(F.expr("percentile(dev, 0.5)").alias("mad"))
    z = dev.join(F.broadcast(mad), "source").withColumn(
        "rz",
        F.when(
            F.col("mad") > 0,
            F.lit(0.6745) * (F.col("n_chars") - F.col("med")) / F.col("mad"),
        ),
    )
    return (
        z.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.first("med"), 4).alias("med"),
            F.round(F.first("mad"), 4).alias("mad"),
            F.count(F.when(F.abs(F.col("rz")) > MAD_Z, 1)).alias("n_outliers"),
            F.round(F.max(F.abs(F.col("rz"))), 4).alias("max_abs_z"),
        )
        .orderBy("source")
    )
