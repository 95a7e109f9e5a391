"""Round-4 extension batch two (`a043`–`a048`): separation/shift
diagnostics and dedup economics for a training-data pipeline.

- a043: pairwise AUC (Mann–Whitney with tie handling) of the q48 quality
  score separating English from non-English docs, per source — "does my
  quality signal actually rank the slice I care about above the rest?"
- a044: Pearson correlation between the leading embedding dimensions —
  the redundant-dimension audit run before PCA/whitening decisions.
- a045: CUSUM change-point detection over daily event volumes — the
  standard drift alarm on an ingestion stream.
- a046: word burstiness (variance-to-mean ratio over documents, zeros
  included) — separates topical words (bursty) from function words
  (Poisson-ish), the classic content-word signal.
- a047: what exact dedup BUYS: per source, docs and tokens that
  normalization-fingerprint dedup (keep-first) would remove.
- a048: conditional bigram entropy H(w2|w1) per language and its
  perplexity — the in-corpus redundancy/fluency number an LM-data
  curator tracks across snapshots.

Scale shapes: every operator shuffles only short keys (scores, words,
digests, day buckets) or bounded frames (8 dims → 28 pairs; days per
event type; distinct rounded scores ≤ 10^4 by construction since the
quality score lives in [0,1] rounded to 4 places). Windows are
partitioned by source / event_type / fingerprint — never a
zero-partition global sort. No reference parity (the reference is a
provisioning CLI); these extend SURVEY §2.5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from one_stop_cdc_ingestion_toolkit_spark.catalog import tables
from one_stop_cdc_ingestion_toolkit_spark.operators import register, track_cache
from one_stop_cdc_ingestion_toolkit_spark.operators.text import (
    fingerprint,
    quality_score,
    token_count,
)

#: Leading embedding dimensions audited for pairwise correlation (a044).
CORR_DIMS = 8
#: Minimum document frequency for the burstiness audit (a046).
BURST_MIN_DF = 50
#: Top-k burstiest words reported (a046).
BURST_TOPK = 15

#: DuckDB twin of text.quality_score (mirrors the q48 oracle verbatim).
_QUALITY_SQL = r"""ROUND(LEAST(CAST(len(string_split_regex(trim(text), '\s+'))
                         AS DOUBLE) / 100.0, 1.0)
           * (1.0 - CAST(length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g'))
                         AS DOUBLE)
                   / GREATEST(length(text), 1)), 4)"""


@register(
    "a043_pairwise_auc",
    f"""WITH q AS (SELECT source, lang = 'en' AS pos, {_QUALITY_SQL} AS s
                 FROM documents),
       per AS (SELECT source, s,
                      CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS np,
                      CAST(SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS nn
               FROM q GROUP BY 1, 2),
       cum AS (SELECT source, np, nn,
                      COALESCE(SUM(nn) OVER (
                          PARTITION BY source ORDER BY s
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS below
               FROM per),
       agg AS (SELECT source, SUM(np) AS p, SUM(nn) AS n,
                      SUM(CAST(np AS DOUBLE)
                          * (CAST(below AS DOUBLE) + 0.5 * CAST(nn AS DOUBLE)))
                        AS u
               FROM cum GROUP BY source)
       SELECT source, CAST(p AS BIGINT) AS n_pos, CAST(n AS BIGINT) AS n_neg,
              ROUND(u / (CAST(p AS DOUBLE) * CAST(n AS DOUBLE)), 4) AS auc
       FROM agg WHERE p > 0 AND n > 0 ORDER BY source""",
)
def a043_pairwise_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source AUC of the quality score as a classifier of English vs
    non-English documents — the Mann–Whitney rank statistic with exact
    tie handling: AUC = Σ_s np(s)·(cum_nn(<s) + ½·nn(s)) / (P·N).

    Scale shape: docs collapse map-side to (source, score) count rows;
    the only window runs per source over DISTINCT ROUNDED scores (≤ 10^4
    values by construction — quality ∈ [0,1] rounded to 4 places), so no
    corpus-sized frame ever sorts. The U accumulator sums exact
    half-integers (np·below and ½·np·nn are both representable), so the
    statistic is bit-identical across engines before the single
    divide+round."""
    d = tables(spark, sf_dir)["documents"]
    q = d.select(
        "source",
        (F.col("lang") == "en").alias("pos"),
        quality_score(F.col("text")).alias("s"),
    )
    per = q.groupBy("source", "s").agg(
        F.sum(F.when(F.col("pos"), 1).otherwise(0)).alias("np"),
        F.sum(F.when(F.col("pos"), 0).otherwise(1)).alias("nn"),
    )
    w = (
        W.partitionBy("source")
        .orderBy("s")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    cum = per.withColumn("below", F.coalesce(F.sum("nn").over(w), F.lit(0)))
    agg = cum.groupBy("source").agg(
        F.sum("np").alias("p"),
        F.sum("nn").alias("n"),
        F.sum(
            F.col("np").cast("double")
            * (F.col("below").cast("double") + 0.5 * F.col("nn").cast("double"))
        ).alias("u"),
    )
    return (
        agg.filter((F.col("p") > 0) & (F.col("n") > 0))
        .select(
            "source",
            F.col("p").cast("long").alias("n_pos"),
            F.col("n").cast("long").alias("n_neg"),
            F.round(
                F.col("u") / (F.col("p").cast("double") * F.col("n").cast("double")),
                4,
            ).alias("auc"),
        )
        .orderBy("source")
    )


@register(
    "a044_dim_correlation",
    f"""WITH ex AS (SELECT vec_id,
                         unnest(generate_series(0, {CORR_DIMS - 1})) AS pos,
                         embedding
                  FROM embeddings),
       v AS (SELECT vec_id, pos,
                    CAST(embedding[pos + 1] AS DOUBLE) AS val
             FROM ex),
       p AS (SELECT a.pos AS di, b.pos AS dj, a.val AS x, b.val AS y
             FROM v a JOIN v b ON a.vec_id = b.vec_id AND a.pos < b.pos),
       m AS (SELECT di, dj, CAST(COUNT(*) AS DOUBLE) AS n,
                    SUM(x) AS sx, SUM(y) AS sy, SUM(x*y) AS sxy,
                    SUM(x*x) AS sxx, SUM(y*y) AS syy
             FROM p GROUP BY 1, 2)
       SELECT CAST(di AS INT) AS di, CAST(dj AS INT) AS dj,
              ROUND((n*sxy - sx*sy)
                    / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy)), 4) AS corr
       FROM m ORDER BY di, dj""",
)
def a044_dim_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation for every pair of the first {d} embedding
    dimensions — the redundancy audit run before spending a PCA /
    whitening pass: |corr| near 1 means the dimensions carry the same
    signal and the effective dimensionality is lower than the width.

    Shape: posexplode to (vec_id, pos, val) for {d} dims only → self-join
    on vec_id (bounded fan-out {d}×({d}-1)/2 = {p} rows per vector) →
    one partial-aggregated co-moment reduce; the result frame is {p}
    rows whatever the corpus size. Correlation derives from raw co-moment
    sums — the same formula spelled identically in the oracle.""".format(
        d=CORR_DIMS, p=CORR_DIMS * (CORR_DIMS - 1) // 2
    )
    e = tables(spark, sf_dir)["embeddings"]
    v = e.select(
        "vec_id", F.posexplode(F.slice("embedding", 1, CORR_DIMS)).alias("pos", "f")
    ).select("vec_id", "pos", F.col("f").cast("double").alias("val"))
    a = v.select("vec_id", F.col("pos").alias("di"), F.col("val").alias("x"))
    b = v.select("vec_id", F.col("pos").alias("dj"), F.col("val").alias("y"))
    p = a.join(b, "vec_id").filter(F.col("di") < F.col("dj"))
    m = p.groupBy("di", "dj").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    corr = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return m.select(
        F.col("di").cast("int").alias("di"),
        F.col("dj").cast("int").alias("dj"),
        F.round(corr, 4).alias("corr"),
    ).orderBy("di", "dj")


@register(
    "a045_cusum_changepoint",
    """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
                           CAST(COUNT(*) AS BIGINT) AS cnt
                    FROM events GROUP BY 1, 2),
       st AS (SELECT event_type, CAST(SUM(cnt) AS DOUBLE) / COUNT(*) AS mu,
                     COUNT(*) AS n_days
              FROM daily GROUP BY 1),
       cs AS (SELECT d.event_type, day, st.n_days,
                     SUM(CAST(cnt AS DOUBLE) - mu) OVER (
                         PARTITION BY d.event_type ORDER BY day) AS cusum
              FROM daily d JOIN st USING (event_type)),
       r AS (SELECT event_type, day, n_days, cusum,
                    ROW_NUMBER() OVER (PARTITION BY event_type
                                       ORDER BY abs(cusum) DESC, day) AS rn
             FROM cs)
       SELECT event_type, day AS change_day,
              ROUND(cusum, 4) AS peak_cusum,
              CAST(n_days AS BIGINT) AS n_days
       FROM r WHERE rn = 1 ORDER BY event_type""",
)
def a045_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection on daily event volume: per event
    type, the day where the cumulative deviation from the mean daily
    count peaks in magnitude — the standard "did the stream's behavior
    shift, and when" alarm for an ingestion pipeline.

    Shape: the corpus collapses to (event_type, day) counts map-side;
    every window is partitioned by event_type over day-cardinality
    frames. The running sum folds (cnt − mu) in day order — a fixed
    sequential order both engines share, so the doubles are
    bit-identical before the final round."""
    ev = tables(spark, sf_dir)["events"]
    # cached: the (type, day) counts feed the per-type stats AND the
    # cusum window — uncached, the event scan ran twice (review r8)
    daily = track_cache(
        ev.groupBy(
            "event_type", F.col("ts").cast("date").alias("day")
        ).agg(F.count(F.lit(1)).alias("cnt"))
    )
    st = daily.groupBy("event_type").agg(
        (F.sum("cnt").cast("double") / F.count(F.lit(1))).alias("mu"),
        F.count(F.lit(1)).alias("n_days"),
    )
    wsum = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cs = daily.join(st, "event_type").withColumn(
        "cusum", F.sum(F.col("cnt").cast("double") - F.col("mu")).over(wsum)
    )
    wr = W.partitionBy("event_type").orderBy(F.abs("cusum").desc(), "day")
    return (
        cs.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("day").alias("change_day"),
            F.round("cusum", 4).alias("peak_cusum"),
            F.col("n_days").cast("long").alias("n_days"),
        )
        .orderBy("event_type")
    )


@register(
    "a046_word_burstiness",
    rf"""WITH w AS (SELECT doc_id, unnest(string_split_regex(trim(lower(text)),
                                         '\s+')) AS word
                 FROM documents),
       m AS (SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS m
             FROM w WHERE word <> '' GROUP BY 1, 2),
       nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM documents),
       st AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS df,
                     CAST(SUM(m) AS BIGINT) AS s1,
                     CAST(SUM(m * m) AS BIGINT) AS s2
              FROM m GROUP BY word HAVING COUNT(*) >= {BURST_MIN_DF})
       SELECT word, df,
              s1 AS n_occurrences,
              ROUND((CAST(nd AS DOUBLE) * CAST(s2 AS DOUBLE)
                     - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                    / (CAST(nd AS DOUBLE) * CAST(s1 AS DOUBLE)), 4) AS vmr
       FROM st CROSS JOIN nd
       ORDER BY vmr DESC, word LIMIT {BURST_TOPK}""",
)
def a046_word_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} burstiest words (variance-to-mean ratio of the per-doc
    count, zeros included): VMR ≈ 1 is Poisson scatter (function words);
    VMR ≫ 1 marks topical/content words that cluster in few documents —
    the classic dispersion test a curator runs before building stopword
    or keyword lists from a new corpus.

    Zeros never materialize: with N docs total, var/mean over ALL docs
    reduces to (N·s2 − s1²)/(N·s1) from the occurrence-only sums s1=Σm,
    s2=Σm². All inputs are exact integers; each engine performs the same
    three double products and one divide — bit-identical. Shape: one
    explode → (doc, word) map-side collapse → word-keyed agg; the df
    floor ({df}) keeps the output frame tiny; top-k is
    TakeOrderedAndProject.""".format(k=BURST_TOPK, df=BURST_MIN_DF)
    d = tables(spark, sf_dir)["documents"]
    w = d.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("word"),
    ).filter(F.col("word") != "")
    m = w.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("m"))
    nd = d.agg(F.count(F.lit(1)).alias("nd"))
    st = (
        m.groupBy("word")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("m").alias("s1"),
            F.sum(F.col("m") * F.col("m")).alias("s2"),
        )
        .filter(F.col("df") >= BURST_MIN_DF)
    )
    ndd = F.col("nd").cast("double")
    s1d = F.col("s1").cast("double")
    s2d = F.col("s2").cast("double")
    return (
        st.crossJoin(F.broadcast(nd))
        .select(
            "word",
            "df",
            F.col("s1").alias("n_occurrences"),
            F.round((ndd * s2d - s1d * s1d) / (ndd * s1d), 4).alias("vmr"),
        )
        .orderBy(F.desc("vmr"), "word")
        .limit(BURST_TOPK)
    )


@register(
    "a047_dedup_token_savings",
    r"""WITH f AS (SELECT doc_id, source,
                        md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
                            AS fp,
                        CAST(len(string_split_regex(trim(text), '\s+'))
                            AS BIGINT) AS tok
                 FROM documents),
       k AS (SELECT *, MIN(doc_id) OVER (PARTITION BY fp) AS keeper FROM f)
       SELECT source,
              CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(CASE WHEN doc_id <> keeper THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_dup_docs,
              CAST(SUM(tok) AS BIGINT) AS tokens_total,
              CAST(SUM(CASE WHEN doc_id <> keeper THEN tok ELSE 0 END)
                  AS BIGINT) AS tokens_saved,
              ROUND(CAST(SUM(CASE WHEN doc_id <> keeper THEN tok ELSE 0 END)
                         AS DOUBLE) / SUM(tok), 4) AS savings_pct
       FROM k GROUP BY source ORDER BY source""",
)
def a047_dedup_token_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The economics of exact dedup: per source, how many documents and
    TOKENS a keep-first normalization-fingerprint dedup (q38's digest,
    lowest doc_id wins) would remove. Token savings — not doc counts —
    is the number that matters for a training budget, and the per-source
    split shows which feeds are paying for boilerplate.

    Shape: one projection computes (fp, token count); the keeper is a
    window MIN over the fingerprint — digest-keyed, well-distributed
    partitions — and the audit is one source-keyed agg. Text never
    shuffles; integers end-to-end except the final exact ratio."""
    d = tables(spark, sf_dir)["documents"]
    f = d.select(
        "doc_id",
        "source",
        fingerprint(F.col("text")).alias("fp"),
        token_count(F.col("text")).cast("long").alias("tok"),
    )
    k = f.withColumn("keeper", F.min("doc_id").over(W.partitionBy("fp")))
    is_dup = F.col("doc_id") != F.col("keeper")
    return (
        k.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(is_dup, 1).otherwise(0)).cast("long").alias("n_dup_docs"),
            F.sum("tok").cast("long").alias("tokens_total"),
            F.sum(F.when(is_dup, F.col("tok")).otherwise(0))
            .cast("long")
            .alias("tokens_saved"),
            F.round(
                F.sum(F.when(is_dup, F.col("tok")).otherwise(0)).cast("double")
                / F.sum("tok"),
                4,
            ).alias("savings_pct"),
        )
        .orderBy("source")
    )


@register(
    "a048_bigram_cond_entropy",
    r"""WITH w AS (SELECT lang, string_split_regex(trim(lower(text)), '\s+') AS ws
                 FROM documents),
       bx AS (SELECT lang, ws, unnest(generate_series(1, len(ws) - 1)) AS i
              FROM w),
       bg AS (SELECT lang, ws[i] AS w1, ws[i+1] AS w2 FROM bx),
       cb AS (SELECT lang, w1, w2, CAST(COUNT(*) AS BIGINT) AS nb
              FROM bg GROUP BY 1, 2, 3),
       cu AS (SELECT lang, w1, CAST(SUM(nb) AS BIGINT) AS nu
              FROM cb GROUP BY 1, 2),
       tl AS (SELECT lang, CAST(SUM(nu) AS BIGINT) AS t FROM cu GROUP BY 1)
       SELECT cb.lang, CAST(ANY_VALUE(t) AS BIGINT) AS n_bigrams,
              ROUND(-SUM((CAST(nb AS DOUBLE) / CAST(t AS DOUBLE))
                         * LN(CAST(nb AS DOUBLE) / CAST(nu AS DOUBLE))), 4)
                  AS h_cond,
              ROUND(EXP(-SUM((CAST(nb AS DOUBLE) / CAST(t AS DOUBLE))
                             * LN(CAST(nb AS DOUBLE) / CAST(nu AS DOUBLE)))), 4)
                  AS perplexity
       FROM cb JOIN cu USING (lang, w1) JOIN tl USING (lang)
       GROUP BY cb.lang ORDER BY cb.lang""",
)
def a048_bigram_cond_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional bigram entropy H(w2|w1) per language — and exp(H), the
    corpus's bigram perplexity under its own MLE model. Falling H across
    snapshots means the corpus is getting more templated/redundant; the
    cross-language comparison normalizes tokenizer-fertility effects out
    of the a109 fluency signal.

    Shape: the a109 discipline — ONE explode collapses map-side to
    (lang, w1, w2) counts; unigram and total tables derive by re-agg
    from that compact frame (never a second corpus pass); the entropy
    fold runs over distinct-bigram rows with short keys."""
    d = tables(spark, sf_dir)["documents"]
    bg = (
        d.select(
            "lang", F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("ws")
        )
        .select(
            "lang",
            F.explode(
                F.expr(
                    "transform(slice(ws, 1, greatest(size(ws) - 1, 0)),"
                    " (w, i) -> struct(w AS w1, ws[i + 1] AS w2))"
                )
            ).alias("p"),
        )
        .select("lang", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    # cb/cu cached (review r8): the entropy join reads both alongside
    # their own re-aggregations — uncached, the bigram explode ran 3x
    cb = track_cache(
        bg.groupBy("lang", "w1", "w2").agg(F.count(F.lit(1)).alias("nb"))
    )
    cu = track_cache(cb.groupBy("lang", "w1").agg(F.sum("nb").alias("nu")))
    tl = cu.groupBy("lang").agg(F.sum("nu").alias("t"))
    joined = cb.join(cu, ["lang", "w1"]).join(F.broadcast(tl), ["lang"])
    nbd = F.col("nb").cast("double")
    h = -F.sum(
        (nbd / F.col("t").cast("double"))
        * F.log(nbd / F.col("nu").cast("double"))
    )
    return (
        joined.groupBy("lang")
        .agg(
            F.first("t").cast("long").alias("n_bigrams"),
            F.round(h, 4).alias("h_cond"),
            F.round(F.exp(h), 4).alias("perplexity"),
        )
        .orderBy("lang")
    )
