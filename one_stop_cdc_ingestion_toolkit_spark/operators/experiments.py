"""Experimentation / evaluation batch (``e153``–``e164``): k-means
embedding clustering (+ silhouette, purity, margin matrix, coreset
selection and coverage), Welch two-sample audit, classifier calibration
(ECE), segment-level duplicate-mass accounting, weighted sampling
without replacement, padding-waste audit, and VARIANT extraction.

No reference parity (the reference — `/root/reference/`, a Bash
provisioning CLI — has no query surface); these extend the
training-data-pipeline inventory (SURVEY.md §2.5) with the evaluation
loops an ML-data team runs over a CDC-fed lake.

Scale shapes (100 TB posture):

- e153 is MLlib-style Lloyd iteration: centroids (k × dim, bounded)
  round-trip through the driver each iteration and come back as
  *literals*, so cluster assignment is a map-side codegen projection —
  embeddings NEVER shuffle for assignment. The only per-iteration
  shuffle is the (cid, dim)-keyed partial-agg mean recompute, whose
  output is k × dim rows regardless of corpus size.
- e154 reduces the event stream to one exact per-type row (n, Σv, Σv²
  as DECIMAL(38,0) of milli-units — overflow-safe past 10^12 rows) and
  derives every complement ("rest") statistic from the broadcast 1-row
  total — the t-statistics cost one partial-aggregated shuffle total.
- e155 rides a110's broadcast-centroid scan; the calibration table is
  a ≤ 21-row aggregate of (bin)-keyed exact counts.
- e156 shuffles only 32-char segment digests (never text) for the
  document-frequency count plus one digest-keyed join back; both
  aggregations are map-side combinable.

Cross-engine determinism: every emitted double is either derived from
exact integer/decimal sums (e154, counts and ratios in e155/e156) or a
ROUND of a bounded-drift float reduction (e153 inertia — addend order
differs between engines by ~1e-12 relative, rounded well above it; the
same contract `label_centroids` already uses).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from one_stop_cdc_ingestion_toolkit_spark.catalog import tables
from one_stop_cdc_ingestion_toolkit_spark.operators import (
    register,
    track_cache,
)
from one_stop_cdc_ingestion_toolkit_spark.operators.mlprep import (
    _duck_cos_vs,
    label_centroids,
)
from one_stop_cdc_ingestion_toolkit_spark.operators.neardup2 import (
    _DUCK_QUALITY,
    _DUCK_BANDS_CTE,
    _DUCK_FIRST_MATCH,
    _DUCK_SIMHASH_CTE,
    HAMMING_MAX,
    simhash_hamming_pairs,
)
from one_stop_cdc_ingestion_toolkit_spark.operators.similarity import (
    EMB_DIM,
    cosine,
    cosine_hoisted,
    norm,
)
from one_stop_cdc_ingestion_toolkit_spark.operators.text import quality_score

#: k-means cluster count (e153) — init = embeddings of the k smallest
#: vec_ids, 2 Lloyd iterations (init → assign → recompute → assign).
KMEANS_K = 8
KMEANS_ITERS = 2
#: segment width (words) for e156 duplicate-mass accounting.
SEG_WORDS = 10
#: |t| threshold for the e154 significance flag (two-sided 5%).
T_CRIT = 1.96


# ---------------------------------------------------------------------------
# e153: k-means over embeddings (Lloyd, deterministic init)
# ---------------------------------------------------------------------------


def _l2sq(vec: Column, cent: list[float]) -> Column:
    """Squared L2 distance between an array column and a literal centroid,
    folded in index order (same reduction order DuckDB's ``list_sum``
    uses, so both engines produce bit-identical doubles)."""
    lit_vec = F.array(*[F.lit(float(x)) for x in cent])
    return F.aggregate(
        F.zip_with(
            vec,
            lit_vec,
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _dist_grid(X, centroids):
    """n×k squared-L2 grid with the SAME addend order as `_l2sq`'s HOF
    fold (acc starts 0.0, adds (x_i−c_i)² in dimension order): the numpy
    loop runs over dimensions, so every (row, centroid) accumulator sees
    the identical IEEE-double operation sequence — results are
    bit-for-bit equal to the JVM fold (asserted in tests)."""
    import numpy as np

    cents = np.asarray(centroids, dtype=np.float64)
    acc = np.zeros((X.shape[0], cents.shape[0]))
    for i in range(cents.shape[1]):
        diff = X[:, i, None] - cents[None, :, i]
        acc += diff * diff
    return acc


def assign_clusters(
    emb: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    use_arrow: bool = True,
) -> DataFrame:
    """Map-side cluster assignment: adds (cid, dist) = argmin over the
    literal centroid list. No join, no shuffle; ties break to the
    smallest cid.

    Two equivalent physical paths (same bits out — the Arrow kernel
    replays `_l2sq`'s fold order, and ``argmin`` takes the first
    minimum exactly like the (dist, cid) struct-min):

    - ``use_arrow=True`` (default): a vectorized pandas_udf — measured
      ~40× faster per pass at k=8, dim=64. Spark's higher-order
      functions are *interpreted* per element (each lambda evaluation
      walks an expression tree), so the k·dim work per row dominated
      the whole k-means family; the Arrow batch turns it into k·dim
      numpy vector ops per BATCH.
    - ``use_arrow=False``: the pure-JVM ``array_min`` over k (dist,
      cid) structs — no Python workers; kept as the cross-check and
      for Arrow-less deployments.
    """
    if use_arrow:
        import numpy as np
        from pyspark.sql.functions import pandas_udf

        cents = [list(map(float, c)) for c in centroids]

        @pandas_udf("struct<cid:int,dist:double>")
        def best_udf(vs: pd.Series) -> pd.DataFrame:
            # NULL vectors assign to (null, null) — like the HOF path,
            # a null embedding must not kill the job
            mask = vs.isna().to_numpy()
            n = len(vs)
            cid = pd.array([None] * n, dtype="Int32")
            dist = pd.array([None] * n, dtype="Float64")
            if (~mask).any():
                idx = np.flatnonzero(~mask)
                X = np.array(
                    [np.asarray(vs.iloc[i], dtype=np.float64) for i in idx]
                )
                acc = _dist_grid(X, cents)
                c = acc.argmin(axis=1)  # first min = smallest cid on ties
                cid[idx] = c.astype("int32")
                dist[idx] = acc[np.arange(len(c)), c]
            return pd.DataFrame({"cid": cid, "dist": dist})

        # materialize the struct ONCE, then project fields — guarantees a
        # single UDF evaluation per row regardless of optimizer collapse
        return (
            emb.withColumn("__b", best_udf(F.col(vec_col)))
            .withColumn("cid", F.col("__b.cid"))
            .withColumn("dist", F.col("__b.dist"))
            .drop("__b")
        )
    best = F.array_min(
        F.array(
            *[
                F.struct(
                    _l2sq(F.col(vec_col), c).alias("dist"),
                    F.lit(i).alias("cid"),
                )
                for i, c in enumerate(centroids)
            ]
        )
    )
    return emb.withColumn("cid", best["cid"]).withColumn("dist", best["dist"])


def kmeans_centroids(
    emb: DataFrame,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """The centroid list the final Lloyd assignment uses: seeded from the
    ``k`` smallest ids, then ``iters - 1`` recomputes with each centroid
    dimension rounded to 6 places (absorbs summation-order ulp drift,
    the `label_centroids` contract).

    The driver round-trips only k × dim doubles per iteration (the MLlib
    KMeans pattern); per-iteration cluster means are ONE (cid, pos)-keyed
    partial agg whose output size is k × dim, independent of corpus size.
    """
    init_rows = (
        emb.orderBy(id_col)
        .limit(k)
        .select(F.col(vec_col).alias("v"))
        .collect()
    )
    cents = [[float(x) for x in r["v"]] for r in init_rows]
    for _ in range(iters - 1):
        mean_rows = (
            assign_clusters(emb, cents, vec_col)
            .select("cid", F.posexplode(vec_col).alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.round(F.avg(F.col("x").cast("double")), 6).alias("cv"))
            .collect()
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in mean_rows:
            by_cid.setdefault(r["cid"], {})[r["pos"]] = r["cv"]
        # a cluster emptied mid-iteration keeps its previous centroid
        cents = [
            [by_cid[i][p] for p in range(len(cents[i]))] if i in by_cid else cents[i]
            for i in range(k)
        ]
    return cents


def kmeans_fit(
    emb: DataFrame,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means (see `kmeans_centroids`): returns the final
    assignment frame with (cid, dist) added — a zero-shuffle projection
    against the literal centroids."""
    return assign_clusters(emb, kmeans_centroids(emb, k, iters, id_col, vec_col), vec_col)


#: the unrolled 2-iteration Lloyd CTE chain (shared by e153/e158/e159):
#: ends at a2 = (vec_id, cid, dist) final assignments and keeps d2 (the
#: full vector × centroid distance grid) visible for silhouette.
_DUCK_KMEANS_CTES = f"""emb AS (
         SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
         FROM embeddings),
       init AS (
         SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, e AS cv
         FROM (SELECT vec_id, e FROM emb ORDER BY vec_id LIMIT {KMEANS_K})),
       d1 AS (
         SELECT vec_id, e, cid,
                list_sum(list_transform(generate_series(1, {EMB_DIM}),
                         i -> (e[i] - cv[i]) * (e[i] - cv[i]))) AS dist
         FROM emb CROSS JOIN init),
       a1 AS (
         SELECT vec_id, e, cid FROM (
           SELECT vec_id, e, cid,
                  row_number() OVER (PARTITION BY vec_id
                                     ORDER BY dist, cid) AS rn
           FROM d1) WHERE rn = 1),
       m1 AS (
         SELECT cid, i.range AS pos, ROUND(AVG(e[CAST(i.range AS INT) + 1]), 6) AS cv
         FROM a1, range(0, {EMB_DIM}) i GROUP BY 1, 2),
       c1 AS (SELECT cid, list(cv ORDER BY pos) AS cv FROM m1 GROUP BY cid),
       d2 AS (
         SELECT vec_id, a.cid,
                list_sum(list_transform(generate_series(1, {EMB_DIM}),
                         i -> (e[i] - cv[i]) * (e[i] - cv[i]))) AS dist
         FROM emb CROSS JOIN c1 a),
       a2 AS (
         SELECT vec_id, cid, dist FROM (
           SELECT vec_id, cid, dist,
                  row_number() OVER (PARTITION BY vec_id
                                     ORDER BY dist, cid) AS rn
           FROM d2) WHERE rn = 1)"""


@register(
    "a007_kmeans_clusters",
    f"""WITH {_DUCK_KMEANS_CTES}
       SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_members,
              ROUND(SUM(dist), 3) AS inertia,
              ROUND(AVG(dist), 6) AS avg_dist
       FROM a2 GROUP BY cid ORDER BY cid""",
)
def a007_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means corpus structure audit: cluster the embedding table with
    2 deterministic Lloyd iterations (k=8, seeded from the 8 smallest
    vec_ids) and report per-cluster size, inertia (Σ squared L2 to the
    assigned centroid) and mean distance — the quick "does this corpus
    have usable structure / how unbalanced are the modes" check run
    before spending a training job, and the pruning signal for
    cluster-balanced data selection.

    Assignment is a zero-shuffle codegen projection against literal
    centroids (see `assign_clusters`); the oracle unrolls both Lloyd
    iterations as CTEs so DuckDB replays the identical arithmetic."""
    emb = tables(spark, sf_dir)["embeddings"]
    assigned = kmeans_fit(emb)
    return (
        assigned.groupBy("cid")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.round(F.sum("dist"), 3).alias("inertia"),
            F.round(F.avg("dist"), 6).alias("avg_dist"),
        )
        .orderBy("cid")
    )



# ---------------------------------------------------------------------------
# e154: Welch two-sample t audit (each event type vs the rest)
# ---------------------------------------------------------------------------


@register(
    "a008_welch_audit",
    f"""WITH mv AS (
         SELECT event_type,
                CAST(ROUND(value * 1000) AS DECIMAL(38,0)) AS m
         FROM events),
       per AS (
         SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                SUM(m) AS s1, SUM(m * m) AS s2
         FROM mv GROUP BY event_type),
       tot AS (SELECT SUM(n) AS tn, SUM(s1) AS t1, SUM(s2) AS t2 FROM per),
       st AS (
         SELECT event_type, n,
                CAST(s1 AS DOUBLE) / n AS m1,
                (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
                  / (n - 1) AS v1,
                tn - n AS n2,
                CAST(t1 - s1 AS DOUBLE) / (tn - n) AS m2,
                (CAST(t2 - s2 AS DOUBLE)
                 - CAST(t1 - s1 AS DOUBLE) * CAST(t1 - s1 AS DOUBLE) / (tn - n))
                  / (tn - n - 1) AS v2
         FROM per CROSS JOIN tot),
       t AS (
         SELECT event_type, n, m1, v1, n2, m2, v2,
                v1 / n + v2 / n2 AS se2
         FROM st)
       SELECT event_type, n,
              ROUND(m1 / 1000, 4) AS mean_value,
              ROUND((m1 - m2) / sqrt(se2), 4) + 0.0 AS t_welch,
              ROUND(se2 * se2 / ((v1 / n) * (v1 / n) / (n - 1)
                                 + (v2 / n2) * (v2 / n2) / (n2 - 1)), 2)
                AS df_welch,
              abs((m1 - m2) / sqrt(se2)) > {T_CRIT} AS significant
       FROM t ORDER BY event_type""",
)
def a008_welch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metric-shift tripwire: Welch's unequal-variance t-test of
    ``events.value`` for each event type against all other events —
    the standard "did this segment's metric really move" audit over an
    event stream, with the Welch–Satterthwaite degrees of freedom.

    Values are quantized to exact milli-unit DECIMAL(38,0) sums (n, Σv,
    Σv² — overflow-safe past 10^12 rows and bit-identical across
    engines regardless of addend order); each type's complement comes
    from the broadcast one-row total, so the whole test costs one
    partial-aggregated shuffle."""
    ev = tables(spark, sf_dir)["events"]
    m = F.round(F.col("value") * 1000).cast("decimal(38,0)")
    # cached: the per-type moment frame feeds the totals AND the test —
    # uncached, the event scan ran twice (review r8)
    per = track_cache(
        ev.select("event_type", m.alias("m")).groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("m").alias("s1"),
            F.sum(F.col("m") * F.col("m")).alias("s2"),
        )
    )
    tot = per.agg(
        F.sum("n").alias("tn"), F.sum("s1").alias("t1"), F.sum("s2").alias("t2")
    )
    j = per.crossJoin(F.broadcast(tot))
    n = F.col("n").cast("double")
    n2 = (F.col("tn") - F.col("n")).cast("double")
    s1d, s2d = F.col("s1").cast("double"), F.col("s2").cast("double")
    r1d = (F.col("t1") - F.col("s1")).cast("double")
    r2d = (F.col("t2") - F.col("s2")).cast("double")
    m1 = s1d / n
    v1 = (s2d - s1d * s1d / n) / (n - F.lit(1.0))
    m2 = r1d / n2
    v2 = (r2d - r1d * r1d / n2) / (n2 - F.lit(1.0))
    se2 = v1 / n + v2 / n2
    t_stat = (m1 - m2) / F.sqrt(se2)
    df_w = (se2 * se2) / (
        (v1 / n) * (v1 / n) / (n - F.lit(1.0))
        + (v2 / n2) * (v2 / n2) / (n2 - F.lit(1.0))
    )
    return j.select(
        "event_type",
        "n",
        F.round(m1 / 1000, 4).alias("mean_value"),
        # + 0.0 collapses IEEE −0.0 (a sub-half-ulp negative t rounds to
        # −0.0 in one engine and +0.0 in the other) to a single encoding
        (F.round(t_stat, 4) + F.lit(0.0)).alias("t_welch"),
        F.round(df_w, 2).alias("df_welch"),
        (F.abs(t_stat) > T_CRIT).alias("significant"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# e155: calibration table / expected-calibration-error inputs
# ---------------------------------------------------------------------------


@register(
    "a009_ece_calibration",
    f"""WITH cx AS (SELECT label, embedding,
                          unnest(generate_series(1, {EMB_DIM})) AS i
                   FROM embeddings),
       cd AS (SELECT label, i, ROUND(AVG(CAST(embedding[i] AS DOUBLE)), 6) AS cv
              FROM cx GROUP BY 1, 2),
       cent AS (SELECT label AS c_label, list(cv ORDER BY i) AS cent_vec
                FROM cd GROUP BY label),
       scored AS (SELECT e.vec_id, e.label, c.c_label,
                         {_duck_cos_vs('e.embedding', 'c.cent_vec')} AS cos
                  FROM embeddings e CROSS JOIN cent c),
       pred AS (SELECT vec_id, label, c_label AS pred, ROUND(cos, 6) AS conf
                FROM (SELECT vec_id, label, c_label, cos,
                             row_number() OVER (PARTITION BY vec_id
                                                ORDER BY cos DESC, c_label) AS rn
                      FROM scored) WHERE rn = 1),
       binned AS (SELECT LEAST(GREATEST(CAST(FLOOR(conf * 10) AS INT), -10), 9)
                           AS bin,
                         CASE WHEN pred = label THEN 1 ELSE 0 END AS ok
                  FROM pred),
       agg AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
                      CAST(SUM(ok) AS BIGINT) AS n_ok,
                      ROUND(AVG(CAST(bin AS DOUBLE)) / 10 + 0.05, 4) AS bin_mid
               FROM binned GROUP BY bin)
       SELECT bin, n, ROUND(CAST(n_ok AS DOUBLE) / n, 4) AS accuracy,
              bin_mid,
              ROUND(ABS(ROUND(CAST(n_ok AS DOUBLE) / n, 4) - bin_mid), 4)
                AS gap
       FROM agg ORDER BY bin""",
)
def a009_ece_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration audit for the nearest-centroid classifier (a110's
    model): bucket predictions by confidence (max centroid cosine,
    bin width 0.1) and compare per-bin accuracy against the bin
    midpoint — the per-bin table whose n-weighted ``gap`` sum is the
    expected calibration error (ECE). An over-confident auto-labeler
    silently poisons curated training mixes; this is the check.

    Same scan shape as a110 (centroids broadcast, argmax is a keyed
    partial agg, embeddings never shuffle); the calibration table adds
    one ≤ 21-row exact-count aggregation. Accuracy and gap derive from
    integer counts, bit-identical across engines."""
    emb = tables(spark, sf_dir)["embeddings"]
    # norm hoist (r8): one self-fold per vector/centroid, not per pair
    cent = label_centroids(emb).select(
        F.col("label").alias("c_label"),
        "cent_vec",
        norm(F.col("cent_vec")).alias("__cn"),
    )
    scored = (
        emb.withColumn("__vn", norm(F.col("embedding")))
        .crossJoin(F.broadcast(cent))
        .withColumn(
            "cos",
            cosine_hoisted(
                F.col("embedding"), F.col("cent_vec"), F.col("__vn"), F.col("__cn")
            ),
        )
    )
    pred = scored.groupBy("vec_id", "label").agg(
        F.max_by(
            "c_label", F.struct(F.col("cos"), (-F.col("c_label")).alias("nl"))
        ).alias("pred"),
        F.round(F.max("cos"), 6).alias("conf"),
    )
    binned = pred.select(
        F.least(
            F.greatest(F.floor(F.col("conf") * 10).cast("int"), F.lit(-10)),
            F.lit(9),
        ).alias("bin"),
        (F.col("pred") == F.col("label")).cast("int").alias("ok"),
    )
    agg = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("ok").alias("n_ok"),
        F.round(F.avg(F.col("bin").cast("double")) / 10 + 0.05, 4).alias("bin_mid"),
    )
    acc = F.round(F.col("n_ok").cast("double") / F.col("n"), 4)
    return agg.select(
        "bin",
        "n",
        acc.alias("accuracy"),
        "bin_mid",
        F.round(F.abs(acc - F.col("bin_mid")), 4).alias("gap"),
    ).orderBy("bin")


# ---------------------------------------------------------------------------
# e156: segment-level duplicate mass (C4/Falcon line-dedup analog)
# ---------------------------------------------------------------------------


@register(
    "a010_segment_dup_mass",
    f"""WITH w AS (
         SELECT doc_id, source,
                string_split_regex(trim(text), '\\s+') AS ws
         FROM documents),
       segs AS (
         SELECT doc_id, source,
                unnest(list_transform(
                  generate_series(0, CAST(len(ws) // {SEG_WORDS} AS INT) - 1),
                  i -> md5(array_to_string(
                         list_slice(ws, i * {SEG_WORDS} + 1,
                                    i * {SEG_WORDS} + {SEG_WORDS}), ' ')))) AS dig
         FROM w),
       df AS (SELECT dig, COUNT(*) AS c FROM segs GROUP BY dig)
       SELECT source, CAST(COUNT(*) AS BIGINT) AS n_seg,
              CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
              ROUND(CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS DOUBLE)
                    / COUNT(*), 4) AS dup_mass
       FROM segs JOIN df USING (dig)
       GROUP BY source ORDER BY source""",
)
def a010_segment_dup_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplicated-segment mass — the C4/Falcon "line dedup"
    accounting adapted to unpunctuated text: each document is cut into
    consecutive non-overlapping 10-word segments (the trailing partial
    segment is dropped), a segment occurrence counts as duplicated when
    its exact text appears anywhere else in the corpus, and each source
    reports its duplicate fraction. Sources with high ``dup_mass`` are
    boilerplate-heavy and should be line-deduped (or down-weighted)
    before entering a training mix.

    Only 32-char md5 digests ever shuffle (the document-frequency agg
    and the digest-keyed join back); segment construction is a codegen
    higher-order-function projection — text never leaves its input
    partition. Both aggregations are map-side combinable."""
    d = tables(spark, sf_dir)["documents"]
    words = F.split(F.trim(F.col("text")), r"\s+")
    n_seg = F.floor(F.size(words) / SEG_WORDS).cast("int")
    digs = F.transform(
        F.sequence(F.lit(0), n_seg - 1),
        lambda i: F.md5(
            F.array_join(F.slice(words, i * SEG_WORDS + 1, SEG_WORDS), " ")
        ),
    )
    segs = d.filter(F.size(words) >= SEG_WORDS).select(
        "doc_id", "source", F.explode(digs).alias("dig")
    )
    # Pre-aggregate to (source, dig) occurrence counts FIRST: the
    # segment stream is evaluated once and collapses map-side; the
    # corpus-wide frequency then derives from this compact frame (a
    # re-agg, not a second explode), and the join back is digest-table
    # sized instead of occurrence-stream sized.
    # cached (review r8): per_sd feeds the corpus-wide re-agg AND the
    # join back — uncached, the segment explode ran twice
    per_sd = track_cache(
        segs.groupBy("source", "dig").agg(F.count(F.lit(1)).alias("m"))
    )
    per_d = per_sd.groupBy("dig").agg(F.sum("m").alias("c"))
    dup_m = F.when(F.col("c") > 1, F.col("m")).otherwise(F.lit(0))
    return (
        per_sd.join(per_d, "dig")
        .groupBy("source")
        .agg(
            F.sum("m").cast("long").alias("n_seg"),
            F.sum(dup_m).cast("long").alias("n_dup"),
            F.round(
                F.sum(dup_m).cast("double") / F.sum("m"), 4
            ).alias("dup_mass"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# e157: label-centroid margin matrix
# ---------------------------------------------------------------------------


@register(
    "a011_label_margin_matrix",
    f"""WITH cx AS (SELECT label, embedding,
                          unnest(generate_series(1, {EMB_DIM})) AS i
                   FROM embeddings),
       cd AS (SELECT label, i, ROUND(AVG(CAST(embedding[i] AS DOUBLE)), 6) AS cv
              FROM cx GROUP BY 1, 2),
       cent AS (SELECT label, list(cv ORDER BY i) AS cent_vec
                FROM cd GROUP BY label)
       SELECT a.label AS label_a, b.label AS label_b,
              ROUND({_duck_cos_vs('a.cent_vec', 'b.cent_vec')}, 6) AS cos_sim
       FROM cent a JOIN cent b ON a.label < b.label
       ORDER BY label_a, label_b""",
)
def a011_label_margin_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine similarity between label centroids — the margin
    audit behind a110/e155: label pairs whose centroids are nearly
    parallel are the ones an auto-labeler will confuse and a curated
    mix will cross-contaminate. k(k-1)/2 rows regardless of corpus
    size; the per-label centroids come from one (label, dim)-keyed
    partial agg, and the pair matrix is a broadcast self-join over k
    rows."""
    emb = tables(spark, sf_dir)["embeddings"]
    cent = label_centroids(emb)
    a = cent.select(F.col("label").alias("label_a"), F.col("cent_vec").alias("va"))
    b = cent.select(F.col("label").alias("label_b"), F.col("cent_vec").alias("vb"))
    return (
        a.join(F.broadcast(b), F.col("label_a") < F.col("label_b"))
        .select(
            "label_a",
            "label_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos_sim"),
        )
        .orderBy("label_a", "label_b")
    )


# ---------------------------------------------------------------------------
# e158: simplified silhouette for the k-means clustering
# ---------------------------------------------------------------------------


def assign_with_runnerup(
    emb: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    use_arrow: bool = True,
) -> DataFrame:
    """Like `assign_clusters` but also keeps the runner-up centroid
    distance (for simplified-silhouette). Same two physical paths as
    `assign_clusters` (Arrow kernel default; stable argsort's tie order
    equals the (dist, cid) struct sort since cids ascend) — still a
    pure map-side projection, no join, no shuffle."""
    if use_arrow:
        import numpy as np
        from pyspark.sql.functions import pandas_udf

        cents = [list(map(float, c)) for c in centroids]

        @pandas_udf("struct<cid:int,dist:double,dist2:double>")
        def top2_udf(vs: pd.Series) -> pd.DataFrame:
            mask = vs.isna().to_numpy()
            n = len(vs)
            cid = pd.array([None] * n, dtype="Int32")
            dist = pd.array([None] * n, dtype="Float64")
            dist2 = pd.array([None] * n, dtype="Float64")
            if (~mask).any():
                idx = np.flatnonzero(~mask)
                X = np.array(
                    [np.asarray(vs.iloc[i], dtype=np.float64) for i in idx]
                )
                acc = _dist_grid(X, cents)
                order = acc.argsort(axis=1, kind="stable")
                rows = np.arange(len(order))
                cid[idx] = order[:, 0].astype("int32")
                dist[idx] = acc[rows, order[:, 0]]
                dist2[idx] = acc[rows, order[:, 1]]
            return pd.DataFrame({"cid": cid, "dist": dist, "dist2": dist2})

        return (
            emb.withColumn("__t", top2_udf(F.col(vec_col)))
            .withColumn("cid", F.col("__t.cid"))
            .withColumn("dist", F.col("__t.dist"))
            .withColumn("dist2", F.col("__t.dist2"))
            .drop("__t")
        )
    arr = F.array_sort(
        F.array(
            *[
                F.struct(
                    _l2sq(F.col(vec_col), c).alias("dist"),
                    F.lit(i).alias("cid"),
                )
                for i, c in enumerate(centroids)
            ]
        )
    )
    return (
        emb.withColumn("__arr", arr)
        .withColumn("cid", F.col("__arr")[0]["cid"])
        .withColumn("dist", F.col("__arr")[0]["dist"])
        .withColumn("dist2", F.col("__arr")[1]["dist"])
        .drop("__arr")
    )


@register(
    "a012_simplified_silhouette",
    f"""WITH {_DUCK_KMEANS_CTES},
       r2 AS (
         SELECT vec_id, cid, dist,
                row_number() OVER (PARTITION BY vec_id
                                   ORDER BY dist, cid) AS rn
         FROM d2),
       ab AS (
         SELECT a.vec_id, a.cid, a.dist AS da, b.dist AS db
         FROM (SELECT * FROM r2 WHERE rn = 1) a
         JOIN (SELECT * FROM r2 WHERE rn = 2) b USING (vec_id)),
       s AS (
         SELECT cid,
                CASE WHEN GREATEST(da, db) = 0 THEN 0.0
                     ELSE (db - da) / GREATEST(da, db) END AS sil
         FROM ab)
       SELECT cid, CAST(COUNT(*) AS BIGINT) AS n,
              ROUND(AVG(sil), 6) AS avg_sil,
              ROUND(MIN(sil), 6) AS min_sil
       FROM s GROUP BY cid ORDER BY cid""",
)
def a012_simplified_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster simplified silhouette for the e153 clustering: for
    each vector, a = squared distance to its assigned centroid, b = to
    the runner-up centroid, s = (b−a)/max(a,b) ∈ [0,1] here (a ≤ b by
    construction). Clusters with low average silhouette are overlapping
    modes — merge candidates before cluster-balanced sampling trusts
    them. The simplified (centroid-based) variant is O(n·k), unlike the
    O(n²) classic, so it survives corpus scale; assignment + runner-up
    is the same zero-shuffle literal-centroid projection as e153."""
    emb = tables(spark, sf_dir)["embeddings"]
    # the exact centroid literals e153's final assignment used
    scored = assign_with_runnerup(emb, kmeans_centroids(emb))
    sil = F.when(F.greatest("dist", "dist2") == 0, F.lit(0.0)).otherwise(
        (F.col("dist2") - F.col("dist")) / F.greatest("dist", "dist2")
    )
    return (
        scored.select("cid", sil.alias("sil"))
        .groupBy("cid")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("sil"), 6).alias("avg_sil"),
            F.round(F.min("sil"), 6).alias("min_sil"),
        )
        .orderBy("cid")
    )


# ---------------------------------------------------------------------------
# e159: cluster-label purity
# ---------------------------------------------------------------------------


@register(
    "a013_cluster_purity",
    f"""WITH {_DUCK_KMEANS_CTES},
       cl AS (
         SELECT a2.cid, e.label, COUNT(*) AS c
         FROM a2 JOIN embeddings e USING (vec_id) GROUP BY 1, 2),
       top AS (
         SELECT cid, label AS major_label, c AS major_n,
                row_number() OVER (PARTITION BY cid
                                   ORDER BY c DESC, label) AS rn
         FROM cl),
       tot AS (SELECT cid, SUM(c) AS n FROM cl GROUP BY cid)
       SELECT t.cid, CAST(tot.n AS BIGINT) AS n,
              t.major_label, CAST(t.major_n AS BIGINT) AS major_n,
              ROUND(CAST(t.major_n AS DOUBLE) / tot.n, 4) AS purity
       FROM top t JOIN tot USING (cid) WHERE rn = 1 ORDER BY cid""",
)
def a013_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster ↔ label agreement for the e153 clustering: per cluster,
    the majority ground-truth label and its purity (majority fraction).
    High purity means the unsupervised structure recovers the labels —
    the go/no-go check before using clusters as pseudo-labels or as
    strata for balanced sampling. Costs two short-key partial-agg
    shuffles ((cid,label) counts, then per-cid totals) on top of the
    zero-shuffle assignment; purity is an exact integer ratio, so the
    result is bit-identical across engines."""
    emb = tables(spark, sf_dir)["embeddings"]
    assigned = kmeans_fit(emb)
    cl = assigned.groupBy("cid", "label").agg(F.count(F.lit(1)).alias("c"))
    top = cl.groupBy("cid").agg(
        F.max_by(
            F.struct(F.col("label").alias("major_label"), F.col("c").alias("major_n")),
            F.struct(F.col("c"), (-F.col("label")).alias("nl")),
        ).alias("m"),
        F.sum("c").alias("n"),
    )
    return top.select(
        "cid",
        "n",
        F.col("m.major_label").alias("major_label"),
        F.col("m.major_n").alias("major_n"),
        F.round(F.col("m.major_n").cast("double") / F.col("n"), 4).alias("purity"),
    ).orderBy("cid")


# ---------------------------------------------------------------------------
# e160: weighted sampling without replacement (Efraimidis–Spirakis A-Res)
# ---------------------------------------------------------------------------

#: sample size for e160.
WSAMPLE_M = 100


@register(
    "a014_weighted_sample",
    f"""WITH q AS (
         SELECT doc_id, source,
                {_DUCK_QUALITY} AS w,
                (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                      AS BIGINT) + 0.5) / 4294967296.0 AS u
         FROM documents),
       keyed AS (
         SELECT doc_id, source, w, ln(u) / w AS k
         FROM q WHERE w > 0)
       SELECT doc_id, source, ROUND(w, 4) AS weight, ROUND(k, 6) AS sample_key
       FROM keyed ORDER BY k DESC, doc_id LIMIT {WSAMPLE_M}""",
)
def a014_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted sample WITHOUT replacement (m=100): the
    Efraimidis–Spirakis exponential race — each doc gets key
    ln(u)/w for a deterministic md5-derived uniform u, and the m
    largest keys are exactly a weighted sample without replacement.
    Unlike e148's independent accept/reject (random output size), this
    yields a fixed-size sample — what a curated eval set or human
    review batch actually needs.

    The key is computed map-side from each row alone (no weight
    renormalization needed — the race is scale-invariant), so the whole
    query is one TakeOrderedAndProject: per-partition top-m heaps, one
    m-row driver merge, no shuffle of the corpus. Deterministic u means
    task retries can't change the sample."""
    d = tables(spark, sf_dir)["documents"]
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    w = quality_score(F.col("text"))
    keyed = d.select(
        "doc_id",
        "source",
        w.alias("w"),
        (F.log(u) / w).alias("k"),
    ).filter(F.col("w") > 0)
    return (
        keyed.select(
            "doc_id",
            "source",
            F.round("w", 4).alias("weight"),
            F.round("k", 6).alias("sample_key"),
        )
        .orderBy(F.col("sample_key").desc(), "doc_id")
        .limit(WSAMPLE_M)
    )


# ---------------------------------------------------------------------------
# e161: k-center greedy coreset (farthest-first traversal)
# ---------------------------------------------------------------------------

#: number of coreset centers for e161.
KCENTER_K = 8
def _duck_l2(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(generate_series(1, {EMB_DIM}), "
        f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))"
    )


def _kcenter_oracle(k: int = KCENTER_K) -> str:
    """Unrolled farthest-first CTE chain: p_i = the point maximizing the
    running min-distance to centers 0..i-1 (tie → smallest vec_id)."""
    ctes = [
        "emb AS (SELECT vec_id, list_transform(embedding, "
        "x -> CAST(x AS DOUBLE)) AS e FROM embeddings)",
        "p0 AS (SELECT vec_id, e, 0.0 AS md FROM emb ORDER BY vec_id LIMIT 1)",
        f"m0 AS (SELECT emb.vec_id, emb.e, {_duck_l2('emb.e', 'p0.e')} AS md "
        "FROM emb CROSS JOIN p0)",
    ]
    for i in range(1, k):
        ctes.append(
            f"p{i} AS (SELECT vec_id, e, md FROM m{i - 1} "
            "ORDER BY md DESC, vec_id LIMIT 1)"
        )
        if i < k - 1:
            ctes.append(
                f"m{i} AS (SELECT m.vec_id, m.e, "
                f"LEAST(m.md, {_duck_l2('m.e', 'p.e')}) AS md "
                f"FROM m{i - 1} m CROSS JOIN p{i} p)"
            )
    selects = " UNION ALL ".join(
        f"SELECT {i} AS step, vec_id, ROUND(md, 6) AS radius FROM p{i}"
        for i in range(k)
    )
    return f"WITH {', '.join(ctes)} {selects} ORDER BY step"


#: candidate-pool size for the batched farthest-first rounds. One
#: TakeOrdered job collects the top-POOL frontier (vectors included, a
#: POOL × dim-doubles collect — ~1 MB); the driver then extracts as
#: many EXACT centers from it as the certificate allows. Raise to batch
#: more picks per job on bigger corpora.
KCENTER_POOL = 2048


def _py_l2sq(a: list[float], b: list[float]) -> float:
    """Driver-side twin of `_l2sq`: the same left fold in index order
    over IEEE doubles, so pool-local distance updates stay bit-identical
    to the distributed (and DuckDB ``list_sum``) computation."""
    acc = 0.0
    for x, y in zip(a, b):
        d = x - y
        acc += d * d
    return acc


def _kcenter_scored(base: DataFrame, centers: list[list[float]]) -> DataFrame:
    """``base`` + running min-distance ``md`` to ``centers``.

    The whole scoring expression is built as ONE SQL string handed to
    `F.expr` — a single py4j call. Building it column-by-column costs
    ~70 py4j round-trips per 64-literal centroid (measured: expression
    CONSTRUCTION, not execution, dominated the greedy loop), and a
    centers-as-broadcast-data variant pays a per-round broadcast
    exchange (~2x slower per pool job than the literal form). Float
    literals are emitted with ``repr`` (shortest round-trip — parses to
    the identical IEEE double). ``array_min`` over the per-center
    squared distances is bit-identical to the oracle's ``LEAST`` chain
    (min over doubles is exact and order-free); the inner ``aggregate``
    replays `_l2sq`'s index-order left fold."""
    arr = (
        "array("
        + ", ".join(
            "array(" + ", ".join(f"{float(x)!r}D" for x in c) + ")"
            for c in centers
        )
        + ")"
    )
    md = (
        f"array_min(transform({arr}, c -> "
        "aggregate(zip_with(e, c, (x, y) -> "
        "(CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), "
        "0.0D, (acc, x) -> acc + x)))"
    )
    return base.select(*base.columns, F.expr(md).alias("md"))


def _kcenter_greedy(
    base: DataFrame,
) -> tuple[list[tuple[int, int, float]], list[list[float]]]:
    """EXACT farthest-first traversal (greedy k-center) with
    candidate-pool batching; returns the ``(step, vec_id, radius)``
    trace and the picked center vectors, in pick order.

    Naive GFF costs k sequential distributed jobs — pure job-latency at
    bench scale and k cluster barriers at real scale. Instead, each
    distributed round computes the running min-distance (a least() chain
    over the centers picked so far — one codegen projection, the corpus
    never shuffles) and collects only the top-KCENTER_POOL frontier via
    TakeOrderedAndProject (per-partition heaps). The driver then keeps
    picking exact centers inside the pool under this certificate: every
    point OUTSIDE the pool has md ≤ the pool's smallest collected value,
    and md is non-increasing as centers are added, so while the best
    in-pool candidate stays STRICTLY above that bound it is the global
    argmax. A tie at the bound (measure-zero for real embeddings) falls
    back to one exact distributed ``max_by`` pick, guaranteeing
    progress. Equal-md ties inside the pool break by smallest vec_id,
    same as the distributed struct ordering and the oracle's
    ``ORDER BY md DESC, vec_id``.

    At sf0.1 all k centers come from ONE pool job (3 jobs total incl.
    the seed pick); at 100 TB the certificate degrades gracefully toward
    one job per center — never MORE jobs than the naive loop, and the
    collect stays B × dim doubles regardless of corpus size."""
    first = base.orderBy("vec_id").limit(1).collect()[0]
    picked = [(0, int(first["vec_id"]), 0.0)]
    centers = [[float(x) for x in first["e"]]]

    while len(picked) < KCENTER_K:
        scored = _kcenter_scored(base, centers)
        pool_rows = (
            scored.orderBy(F.col("md").desc(), "vec_id")
            .limit(KCENTER_POOL)
            .collect()
        )
        # strictly fewer rows than requested ⇒ the pool IS the corpus
        # and the certificate always holds.
        full = len(pool_rows) < KCENTER_POOL
        pool = [
            [float(r["md"]), int(r["vec_id"]), [float(x) for x in r["e"]]]
            for r in pool_rows
        ]
        bound = None if full else pool[-1][0]
        progressed = False
        while len(picked) < KCENTER_K:
            best = max(pool, key=lambda p: (p[0], -p[1]))
            if not full and not (best[0] > bound):
                break
            picked.append((len(picked), best[1], best[0]))
            centers.append(best[2])
            progressed = True
            if len(picked) >= KCENTER_K:
                break
            for p in pool:
                d = _py_l2sq(p[2], best[2])
                if d < p[0]:
                    p[0] = d
        if not progressed:
            # boundary tie: one exact distributed pick, then re-pool.
            far = scored.agg(
                F.max_by(
                    F.struct("vec_id", "e", "md"),
                    F.struct(F.col("md"), (-F.col("vec_id")).alias("nv")),
                ).alias("p")
            ).collect()[0]["p"]
            picked.append((len(picked), int(far["vec_id"]), float(far["md"])))
            centers.append([float(x) for x in far["e"]])
    return picked, centers


@register("a015_kcenter_coreset", _kcenter_oracle())
def a015_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity coreset by farthest-first traversal (the classic
    2-approximation to k-center): start from the smallest vec_id, then
    repeatedly pick the embedding farthest (squared L2) from all chosen
    centers. The selected rows are the maximally-spread exemplars —
    the standard seed set for diverse data selection and the dual of
    density-based sampling. ``radius`` is each center's min-distance
    when chosen, a monotone non-increasing sequence whose final value
    2-approximates the optimal k-center cover radius.

    Candidate-pool batched (see `_kcenter_greedy`): distributed rounds
    collect only the exact top-KCENTER_POOL frontier and the driver
    extracts every center the certificate proves global — at this scale
    all k come from ONE pool job; the oracle unrolls the same k greedy
    rounds as CTEs, arithmetic bit-identical (no transcendentals, and
    the driver-side distance fold replays `_l2sq`'s index-order left
    fold exactly)."""
    emb = tables(spark, sf_dir)["embeddings"]
    base = emb.select("vec_id", F.col("embedding").alias("e"))
    picked, _ = _kcenter_greedy(base)
    # VALUES literal instead of createDataFrame: one py4j call, no
    # Python->JVM data conversion job (~1s faster for a k-row result).
    rows = ", ".join(
        f"({s}, {v}, {float(round(r, 6))!r})" for s, v, r in picked
    )
    return spark.sql(
        "SELECT CAST(step AS INT) AS step, CAST(vec_id AS BIGINT) AS vec_id, "
        "CAST(radius AS DOUBLE) AS radius "
        f"FROM VALUES {rows} AS t(step, vec_id, radius) ORDER BY step"
    )


# ---------------------------------------------------------------------------
# e162: context-length padding-waste audit
# ---------------------------------------------------------------------------

#: candidate context lengths (tokens) for the e162 packing audit.
PACK_LENGTHS = (16, 32, 64, 128)


@register(
    "a016_padding_waste",
    f"""WITH t AS (
         SELECT doc_id,
                len(string_split_regex(trim(text), '\\s+')) AS n_tok
         FROM documents),
       l AS (SELECT unnest(ARRAY{list(PACK_LENGTHS)}) AS ctx_len),
       p AS (
         SELECT l.ctx_len, t.n_tok,
                CAST(CEIL(CAST(t.n_tok AS DOUBLE) / l.ctx_len) * l.ctx_len
                     AS BIGINT) AS padded
         FROM t CROSS JOIN l)
       SELECT ctx_len, CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
              CAST(SUM(padded) AS BIGINT) AS total_padded,
              ROUND(CAST(SUM(padded) - SUM(n_tok) AS DOUBLE)
                    / SUM(padded), 4) AS waste_frac
       FROM p GROUP BY ctx_len ORDER BY ctx_len""",
)
def a016_padding_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-waste audit for choosing a training context length: for
    each candidate length L, every document occupies ceil(tokens/L)
    rows of L tokens (the pad-don't-concat packing regime) and the
    wasted fraction is (padded − real) / padded. The elbow of this
    curve is how max_seq_len actually gets picked; at 100 TB the audit
    is one scan with a 4-way literal explode and an exact-integer
    partial agg — no shuffle carries more than |PACK_LENGTHS| × sources
    rows."""
    d = tables(spark, sf_dir)["documents"]
    n_tok = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    t = d.select(n_tok.alias("n_tok"))
    exploded = t.select(
        "n_tok", F.explode(F.array(*[F.lit(x) for x in PACK_LENGTHS])).alias("ctx_len")
    )
    padded = (
        F.ceil(F.col("n_tok").cast("double") / F.col("ctx_len")) * F.col("ctx_len")
    ).cast("long")
    return (
        exploded.withColumn("padded", padded)
        .groupBy("ctx_len")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("total_tokens"),
            F.sum("padded").cast("long").alias("total_padded"),
            F.round(
                (F.sum("padded") - F.sum("n_tok")).cast("double") / F.sum("padded"),
                4,
            ).alias("waste_frac"),
        )
        .orderBy("ctx_len")
    )


# ---------------------------------------------------------------------------
# e163: VARIANT semi-structured extraction (Spark 4 twin of b51)
# ---------------------------------------------------------------------------


@register(
    "a017_variant_extract",
    """SELECT event_type,
              CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
              CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS min_k,
              CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS max_k,
              COUNT(json_extract_string(props, '$.k')) AS n_k
       FROM events GROUP BY event_type ORDER BY event_type""",
)
def a017_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction through Spark 4's VARIANT type:
    ``parse_json`` once into a binary VARIANT, then typed
    ``try_variant_get`` path reads — the modern engine-native encoding
    that replaces per-access JSON string re-parsing (b51's
    ``get_json_object``) with a parse-once binary format; on wide
    telemetry payloads the VARIANT read is O(paths), not O(payload).
    Dialect pair: DuckDB extracts the same path from the JSON text."""
    ev = tables(spark, sf_dir)["events"]
    k = F.try_variant_get(F.parse_json("props"), "$.k", "bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.count("k").alias("n_k"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# e164: coreset coverage per label
# ---------------------------------------------------------------------------


def _kcenter_cover_oracle(k: int = KCENTER_K) -> str:
    """e161's unrolled chain plus the final LEAST (m{k-1}) so every
    vector's min-distance covers ALL k centers, aggregated per label."""
    ctes = [
        "emb AS (SELECT vec_id, list_transform(embedding, "
        "x -> CAST(x AS DOUBLE)) AS e FROM embeddings)",
        "p0 AS (SELECT vec_id, e, 0.0 AS md FROM emb ORDER BY vec_id LIMIT 1)",
        f"m0 AS (SELECT emb.vec_id, emb.e, {_duck_l2('emb.e', 'p0.e')} AS md "
        "FROM emb CROSS JOIN p0)",
    ]
    for i in range(1, k):
        ctes.append(
            f"p{i} AS (SELECT vec_id, e, md FROM m{i - 1} "
            "ORDER BY md DESC, vec_id LIMIT 1)"
        )
        ctes.append(
            f"m{i} AS (SELECT m.vec_id, m.e, "
            f"LEAST(m.md, {_duck_l2('m.e', 'p.e')}) AS md "
            f"FROM m{i - 1} m CROSS JOIN p{i} p)"
        )
    return (
        f"WITH {', '.join(ctes)} "
        f"SELECT e.label, CAST(COUNT(*) AS BIGINT) AS n, "
        f"ROUND(AVG(m.md), 6) AS avg_cover_dist, "
        f"ROUND(MAX(m.md), 6) AS max_cover_dist "
        f"FROM m{k - 1} m JOIN embeddings e USING (vec_id) "
        f"GROUP BY e.label ORDER BY e.label"
    )


@register("a018_coreset_coverage", _kcenter_cover_oracle())
def a018_coreset_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How well the e161 k-center coreset covers each label's region:
    per label, the mean and max squared distance from its embeddings to
    the nearest of the k greedy centers. A label with outsized
    ``max_cover_dist`` lives outside the coreset's reach — the signal
    to raise k or stratify selection by label before using the coreset
    as an exemplar set.

    Same candidate-pool batched traversal as e161 (shared
    `_kcenter_greedy`) to obtain the centers, then ONE codegen pass
    computes min-distance against all k literal centers (least() chain
    in pick order, exactly the oracle's m_{k-1}) and a label-keyed
    partial agg reduces it — embeddings never shuffle."""
    emb = tables(spark, sf_dir)["embeddings"]
    base = emb.select("vec_id", "label", F.col("embedding").alias("e"))
    _, centers = _kcenter_greedy(base.select("vec_id", "e"))
    cur = _kcenter_scored(base, centers)
    return (
        cur.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("md"), 6).alias("avg_cover_dist"),
            F.round(F.max("md"), 6).alias("max_cover_dist"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# e165: count-min sketch heavy hitters (mergeable frequency sketch)
# ---------------------------------------------------------------------------

#: count-min geometry: CMS_D hash rows × CMS_W buckets (eps = e/w ~ 4.2%).
CMS_D = 4
CMS_W = 64
#: heavy hitters reported (by true count).
CMS_TOPK = 10


@register(
    "a019_countmin_heavy_hitters",
    f"""WITH b AS (
         SELECT user_id, r.range AS r,
                CAST(('0x' || substr(md5(CAST(r.range AS VARCHAR) || ':' ||
                                         CAST(user_id AS VARCHAR)), 1, 8))
                     AS BIGINT) % {CMS_W} AS bucket
         FROM events, range(0, {CMS_D}) r),
       counters AS (
         SELECT r, bucket, CAST(COUNT(*) AS BIGINT) AS c
         FROM b GROUP BY r, bucket),
       truth AS (
         SELECT user_id, CAST(COUNT(*) AS BIGINT) AS true_n
         FROM events GROUP BY user_id),
       top AS (
         SELECT user_id, true_n FROM truth
         ORDER BY true_n DESC, user_id LIMIT {CMS_TOPK}),
       est AS (
         SELECT t.user_id, t.true_n, MIN(c.c) AS est_n
         FROM top t
         JOIN b ON b.user_id = t.user_id
         JOIN counters c ON c.r = b.r AND c.bucket = b.bucket
         GROUP BY t.user_id, t.true_n),
       tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events)
       SELECT user_id, true_n, est_n,
              est_n >= true_n AS never_underestimates,
              est_n - true_n <= CAST(CEIL(2.718282 / {CMS_W} * tot.n) AS BIGINT)
                AS within_eps
       FROM est CROSS JOIN tot ORDER BY true_n DESC, user_id""",
)
def a019_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimates for the top heavy hitters:
    a CMS_D x CMS_W counter grid (deterministic md5 row-hashes) whose
    per-key estimate is the MIN across rows — never an underestimate,
    and within eps·N (eps = e/w) with high probability. The sketch is
    MERGEABLE (counters add), so per-partition/per-day grids union into
    a global one without rescanning — the companion to a108's HLL
    (distinct-count) for the frequency-count question "which users
    dominate the stream", answerable from 256 counters instead of a
    full per-key table.

    ONE corpus scan total (r11 rewrite; r8 had two): the per-user truth
    counts are computed first (map-side partial agg on user_id — the
    shuffle carries |users| rows, not events), and the counter grid is
    derived FROM them: every event of a user lands in exactly that
    user's (r, bucket) cells, so c(r, bucket) = Σ true_n over users
    hashing there — bit-identical integers with the md5 work cut from
    CMS_D·|events| to CMS_D·|users| (~66x fewer md5s at the fixtures'
    events-per-user). The top-k users' buckets are re-derived on the
    k-row frame itself (same deterministic md5 expression → identical
    buckets), the stream total is the sum of one counter row's column
    (each event contributes exactly one row per r, an exact integer),
    and both the counter grid and the k-row side are broadcast. The
    contract booleans (no-underestimate, eps-bound) are exact-integer
    facts both engines agree on bit-for-bit."""
    ev = tables(spark, sf_dir)["events"]

    def rb_explode(df: DataFrame) -> DataFrame:
        return df.select(
            "*",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).alias("r"),
                            (
                                F.conv(
                                    F.substring(
                                        F.md5(
                                            F.concat_ws(
                                                ":",
                                                F.lit(str(r)),
                                                F.col("user_id").cast("string"),
                                            )
                                        ),
                                        1,
                                        8,
                                    ),
                                    16,
                                    10,
                                ).cast("long")
                                % CMS_W
                            ).alias("bucket"),
                        )
                        for r in range(CMS_D)
                    ]
                )
            ).alias("rb"),
        ).select(*df.columns, "rb.r", "rb.bucket")

    # cached: |users| rows consumed by the counter grid AND the top-k
    # sort (released by operators.release_caches)
    truth = track_cache(
        ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_n"))
    )
    # cached: 256 rows consumed by BOTH the estimate join and the stream
    # total below. Derived from truth, not a second corpus explode:
    # c(r, bucket) = Σ true_n over the users hashing to that cell.
    counters = track_cache(
        rb_explode(truth)
        .groupBy("r", "bucket")
        .agg(F.sum("true_n").cast("long").alias("c"))
    )
    top = truth.orderBy(F.col("true_n").desc(), "user_id").limit(CMS_TOPK)
    est = (
        rb_explode(top)
        .join(F.broadcast(counters), ["r", "bucket"])
        .groupBy("user_id", "true_n")
        .agg(F.min("c").alias("est_n"))
    )
    # N without a third corpus scan: every event lands in exactly one
    # bucket of hash row 0, so that row's counters sum to the count
    tot = counters.filter(F.col("r") == 0).agg(F.sum("c").alias("n"))
    bound = F.ceil(F.lit(2.718282 / CMS_W) * F.col("n")).cast("long")
    return (
        est.crossJoin(F.broadcast(tot))
        .select(
            "user_id",
            "true_n",
            "est_n",
            (F.col("est_n") >= F.col("true_n")).alias("never_underestimates"),
            ((F.col("est_n") - F.col("true_n")) <= bound).alias("within_eps"),
        )
        .orderBy(F.col("true_n").desc(), "user_id")
    )


# ---------------------------------------------------------------------------
# e166: PageRank over the SimHash near-duplicate graph
# ---------------------------------------------------------------------------

#: PageRank damping and unrolled iteration count for e166.
PR_DAMP = 0.85
PR_ITERS = 2
PR_TOPK = 10


@register(
    "a020_pagerank_neardup",
    f"""WITH {_DUCK_SIMHASH_CTE}, {_DUCK_BANDS_CTE},
       cand AS (
         SELECT a.doc_id AS id_a, b.doc_id AS id_b
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.chunk = b.chunk AND a.doc_id < b.doc_id
              AND bit_count(xor(a.fp_lo, b.fp_lo))
                  + bit_count(xor(a.fp_hi, b.fp_hi)) <= {HAMMING_MAX}
         WHERE {_DUCK_FIRST_MATCH}),
       edges AS (
         SELECT id_a AS src, id_b AS dst FROM cand
         UNION ALL SELECT id_b, id_a FROM cand),
       deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d
               FROM edges GROUP BY src),
       n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nn FROM deg),
       p0 AS (SELECT node, d, 1.0 / nn AS pr FROM deg CROSS JOIN n),
       p1 AS (
         SELECT t.node, t.d, (1 - {PR_DAMP}) / n.nn + {PR_DAMP} * s.contrib AS pr
         FROM deg t CROSS JOIN n
         JOIN (SELECT e.dst AS node, SUM(p.pr / p.d) AS contrib
               FROM edges e JOIN p0 p ON p.node = e.src GROUP BY e.dst) s
           ON s.node = t.node),
       p2 AS (
         SELECT t.node, t.d, (1 - {PR_DAMP}) / n.nn + {PR_DAMP} * s.contrib AS pr
         FROM deg t CROSS JOIN n
         JOIN (SELECT e.dst AS node, SUM(p.pr / p.d) AS contrib
               FROM edges e JOIN p1 p ON p.node = e.src GROUP BY e.dst) s
           ON s.node = t.node)
       SELECT node AS doc_id, d AS degree, ROUND(pr * 1000, 6) AS pr_milli
       FROM p2 ORDER BY ROUND(pr * 1000, 6) DESC, node LIMIT {PR_TOPK}""",
)
def a020_pagerank_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the SimHash near-duplicate graph (e147's
    Hamming-≤3 pairs as undirected edges), PR_ITERS unrolled power
    iterations with damping PR_DAMP: the most "central" documents of
    a template family are its canonical representatives — a principled
    keeper choice for near-dup collapse (vs a141's quality rule), and
    the same machinery ranks authority in any doc-similarity graph.

    Every node in this graph has degree ≥ 1, so there is no dangling
    mass and each iteration is exactly one edge-keyed contribution join
    + a node-keyed partial-agg sum — the join carries (node, pr/deg)
    doubles only, never text or fingerprints. Ranking uses the ROUNDED
    score (6 dp at milli scale) with doc_id tie-break so both engines
    order identically despite sub-ulp addend-order drift."""
    pairs = simhash_hamming_pairs(tables(spark, sf_dir)["documents"])
    a = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    edges = a.union(a.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    # the edge list embeds the banded SimHash self-join; deg + every PR
    # iteration re-reads it, so persist once (released via release_caches)
    edges = track_cache(edges)
    # deg cached too (review r8): it is re-read by the node count, the
    # initial ranks AND every iteration's rebuild — each was a fresh
    # groupBy shuffle over the cached edges
    deg = track_cache(
        edges.groupBy(F.col("src").alias("node")).agg(
            F.count(F.lit(1)).alias("d")
        )
    )
    n = deg.agg(F.count(F.lit(1)).cast("double").alias("nn"))
    pr = deg.crossJoin(F.broadcast(n)).select(
        "node", "d", (F.lit(1.0) / F.col("nn")).alias("pr")
    )
    for _ in range(PR_ITERS):
        contrib = (
            edges.join(pr.select("node", (F.col("pr") / F.col("d")).alias("w")),
                       edges.src == F.col("node"))
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("w").alias("contrib"))
        )
        pr = (
            deg.crossJoin(F.broadcast(n))
            .join(contrib, "node")
            .select(
                "node",
                "d",
                (
                    (1 - PR_DAMP) / F.col("nn") + PR_DAMP * F.col("contrib")
                ).alias("pr"),
            )
        )
    score = F.round(F.col("pr") * 1000, 6)
    return (
        pr.select(
            F.col("node").alias("doc_id"),
            F.col("d").alias("degree"),
            score.alias("pr_milli"),
        )
        .orderBy(F.col("pr_milli").desc(), "doc_id")
        .limit(PR_TOPK)
    )


# ---------------------------------------------------------------------------
# e167: per-user next-event Markov transitions
# ---------------------------------------------------------------------------


@register(
    "a021_markov_transitions",
    """WITH seq AS (
         SELECT user_id, event_type,
                lead(event_type) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS nxt
         FROM events),
       t AS (
         SELECT event_type AS cur, nxt, CAST(COUNT(*) AS BIGINT) AS n
         FROM seq WHERE nxt IS NOT NULL GROUP BY cur, nxt),
       tot AS (SELECT cur, SUM(n) AS tn FROM t GROUP BY cur)
       SELECT t.cur, t.nxt, t.n,
              ROUND(CAST(t.n AS DOUBLE) / tot.tn, 4) AS p
       FROM t JOIN tot USING (cur) ORDER BY cur, nxt""",
)
def a021_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user behavior: for every
    consecutive event pair within a user's (ts, event_id)-ordered
    history, count cur→next transitions and normalize per current
    state. The matrix is the standard sequence-model sanity check
    before training on event sequences (a114's assembly): a
    near-uniform row means that state carries no signal; a
    near-degenerate row reveals deterministic instrumentation
    (log-spam) that will dominate next-event objectives.

    One user-keyed window (the only shuffle carrying event rows) then
    two |types|²-sized exact-count aggs; probabilities are exact
    integer ratios, bit-identical across engines."""
    ev = tables(spark, sf_dir)["events"]
    from pyspark.sql.window import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "event_type", F.lead("event_type").over(w).alias("nxt")
    ).filter(F.col("nxt").isNotNull())
    # cached: the types² transition counts feed the row totals AND the
    # probabilities — uncached, the events window pass ran twice
    # (review r8)
    t = track_cache(
        seq.groupBy(F.col("event_type").alias("cur"), "nxt").agg(
            F.count(F.lit(1)).alias("n")
        )
    )
    tot = t.groupBy("cur").agg(F.sum("n").alias("tn"))
    return (
        t.join(F.broadcast(tot), "cur")
        .select(
            "cur",
            "nxt",
            "n",
            F.round(F.col("n").cast("double") / F.col("tn"), 4).alias("p"),
        )
        .orderBy("cur", "nxt")
    )
