"""Retrieval scoring operators: BM25 keyword search and hybrid
keyword+vector fusion (reciprocal-rank fusion).

A training-data platform is also a retrieval platform — eval-set mining,
targeted corpus slicing, and RAG-style indexing all need a lexical
ranker next to the ANN family in ``similarity.py``. BM25 composes the
TF-IDF statistics d93 already computes into the standard ranking
function; RRF is the standard way to fuse heterogeneous rankers without
score calibration (Cormack et al.: score = Σ 1/(k + rank)).

Scale shapes:

- BM25 is two corpus scans (one 1-row stats aggregate — at scale this
  comes from a cached corpus-stats table, recomputed per ingest batch —
  then one scoring scan with the stats row broadcast) + TakeOrdered.
  Per-doc work is a fixed number of HOF filters over the word array —
  whole-stage codegen, no shuffle of document text.
- RRF fuses two bounded top-``LIST_K`` rankings — the join inputs are
  K rows regardless of corpus size; ranker cost dominates, fusion is
  free.

Determinism: doubles emitted to the oracle hash are either IEEE-exact
single divisions (RRF terms 1/(k+rank), summed in fixed order) or
ROUND(·, 4)-collapsed (BM25 scores, which pass through libm ``ln`` —
the d97 PMI precedent). Ranking ties break on doc_id on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from one_stop_cdc_ingestion_toolkit_spark.catalog import tables
from one_stop_cdc_ingestion_toolkit_spark.operators import register, track_cache
from one_stop_cdc_ingestion_toolkit_spark.operators.similarity import (
    _duck_cos,
    cosine_hoisted,
    norm,
)

#: BM25 query terms (fixture vocabulary) and shape parameters.
QUERY_TERMS = ("table", "window", "merge")
BM25_K1 = 1.2
BM25_B = 0.75
#: Result sizes: each ranker contributes its top LIST_K; fusion keeps TOP_K.
LIST_K = 50
TOP_K = 20
#: RRF dampening constant (standard k=60).
RRF_K = 60
#: Query vector for the dense ranker: the embedding of vec_id QUERY_VEC_ID.
QUERY_VEC_ID = 0

_WORDS_SQL = r"string_split_regex(lower(trim(text)), '\s+')"


def _tf_sql(term: str) -> str:
    return f"len(list_filter(words, x -> x = '{term}'))"


def _bm25_sql() -> str:
    """DuckDB CTEs ``d`` → ``scored``: per-doc BM25 over QUERY_TERMS."""
    tfs = ", ".join(f"{_tf_sql(t)} AS tf{i}" for i, t in enumerate(QUERY_TERMS))
    dfs = ", ".join(
        f"COUNT(CASE WHEN tf{i} > 0 THEN 1 END) AS df{i}"
        for i in range(len(QUERY_TERMS))
    )
    score = " + ".join(
        f"ln((s.n - s.df{i} + 0.5) / (s.df{i} + 0.5) + 1.0)"
        f" * (d.tf{i} * {BM25_K1 + 1}) / "
        f"(d.tf{i} + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * d.dl / s.avgdl))"
        for i in range(len(QUERY_TERMS))
    )
    return f"""d AS (
          SELECT doc_id, len(words) AS dl, {tfs}
          FROM (SELECT doc_id, {_WORDS_SQL} AS words FROM documents)
        ),
        s AS (
          SELECT COUNT(*) AS n,
                 CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl, {dfs}
          FROM d
        ),
        scored AS (
          SELECT d.doc_id, ROUND({score}, 4) AS score
          FROM d CROSS JOIN s
          WHERE {" + ".join(f"d.tf{i}" for i in range(len(QUERY_TERMS)))} > 0
        )"""


def bm25_partial(
    tf: Column, dl: Column, df: Column, n: Column, avgdl: Column
) -> Column:
    """One term's BM25 contribution: idf(n, df) x saturation(tf, dl).
    Shared by the batch operator below and the incremental
    ``streaming.search_index.SearchIndex`` so both paths score
    identically."""
    idf = F.log((n - df + 0.5) / (df + 0.5) + 1.0)
    weight = (tf * (BM25_K1 + 1)) / (
        tf + BM25_K1 * (1 - BM25_B + BM25_B * dl / avgdl)
    )
    return idf * weight


def tokenize(text: Column) -> Column:
    """The engine's lexical tokenization (shared with the oracle twin
    _WORDS_SQL): whitespace split of lower(trim(text))."""
    return F.split(F.lower(F.trim(text)), r"\s+")


def _bm25_scores(d: DataFrame) -> DataFrame:
    """(doc_id, score) — engine twin of _bm25_sql over a documents frame.

    The (doc_id, dl, tf*) projection feeds BOTH the corpus-stats
    aggregate and the scoring scan; uncached, Spark tokenizes the whole
    corpus TWICE (r9 stage decomposition: the double tokenize was ~70%
    of a106's wall). The projection is 4 small ints per doc — unlike
    the corpus itself it stays cacheable at any scale (this is the
    module docstring's 'cached corpus-stats table', realized), and
    release_caches() frees it between bench queries."""
    words = tokenize(F.col("text"))
    proj = d.select(
        "doc_id",
        F.size(words).alias("dl"),
        # NOTE: single-arg lambdas only — a 2-arg HOF lambda receives
        # (element, index), so binding the loop var via default arg would
        # silently compare against the index. F.filter evaluates the
        # lambda eagerly, so the closure reads the current `t`.
        *[
            F.size(F.filter(words, lambda x: x == F.lit(t))).alias(f"tf{i}")  # noqa: B023
            for i, t in enumerate(QUERY_TERMS)
        ],
    )
    proj = track_cache(proj)
    stats = proj.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf{i}") > 0, 1).otherwise(0)).alias(f"df{i}")
            for i in range(len(QUERY_TERMS))
        ],
    )
    terms = [
        bm25_partial(
            F.col(f"tf{i}"), F.col("dl"), F.col(f"df{i}"), F.col("n"), F.col("avgdl")
        )
        for i in range(len(QUERY_TERMS))
    ]
    score = terms[0]
    for t in terms[1:]:
        score = score + t
    any_hit = F.col("tf0")
    for i in range(1, len(QUERY_TERMS)):
        any_hit = any_hit + F.col(f"tf{i}")
    return (
        proj.crossJoin(F.broadcast(stats))
        .filter(any_hit > 0)
        .select("doc_id", F.round(score, 4).alias("score"))
    )


@register(
    "a106_bm25_search",
    rf"""WITH {_bm25_sql()}
        SELECT doc_id, score,
               CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
                 AS rank
        FROM scored
        ORDER BY score DESC, doc_id LIMIT {TOP_K}""",
)
def a106_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TOP_K} documents by BM25(k1={BM25_K1}, b={BM25_B}) for the
    fixed query QUERY_TERMS. See module docstring for the plan shape;
    the top-TOP_K set is taken FIRST by sort+limit — Catalyst plans that
    as TakeOrderedAndProject (each partition forwards only its local
    top-TOP_K) — and the global rank window runs over those TOP_K rows
    alone. Spark's WindowGroupLimit rule does not apply to windows with
    an empty partition spec, so ranking before limiting would sort every
    matching doc in one partition at scale."""
    d = tables(spark, sf_dir)["documents"]
    scored = _bm25_scores(d)
    top = scored.orderBy(F.desc("score"), "doc_id").limit(TOP_K)
    w = W.orderBy(F.desc("score"), "doc_id")
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .orderBy("rank")
        .select("doc_id", "score", "rank")
    )


@register(
    "a107_hybrid_rrf",
    rf"""WITH {_bm25_sql()},
        kw AS (
          SELECT doc_id,
                 ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r
          FROM scored QUALIFY r <= {LIST_K}
        ),
        qv AS (SELECT embedding AS q_vec FROM embeddings
               WHERE vec_id = {QUERY_VEC_ID}),
        vs AS (
          SELECT vec_id AS doc_id,
                 ROW_NUMBER() OVER (
                   ORDER BY {_duck_cos('embedding', 'q_vec')} DESC, vec_id
                 ) AS r
          FROM embeddings CROSS JOIN qv QUALIFY r <= {LIST_K}
        )
        SELECT COALESCE(kw.doc_id, vs.doc_id) AS doc_id,
               CAST(kw.r AS BIGINT) AS kw_rank,
               CAST(vs.r AS BIGINT) AS vec_rank,
               COALESCE(1.0 / ({RRF_K} + kw.r), 0.0)
                 + COALESCE(1.0 / ({RRF_K} + vs.r), 0.0) AS rrf_score
        FROM kw FULL OUTER JOIN vs ON kw.doc_id = vs.doc_id
        ORDER BY rrf_score DESC, doc_id LIMIT {TOP_K}""",
)
def a107_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: fuse the BM25 top-{LIST_K} and the dense-cosine
    top-{LIST_K} (query = embedding of vec_id {QUERY_VEC_ID}) by
    reciprocal-rank fusion, score = Σ 1/({RRF_K} + rank). RRF needs no
    score calibration between rankers — exactly why it is the standard
    hybrid baseline. Ranks ride doc_id==vec_id (the fixture's shared key
    space). The fusion join touches 2x{LIST_K} rows whatever the corpus
    size; each 1/(k+rank) term is an IEEE-exact division, summed in
    fixed order, so the emitted doubles are bit-stable across engines.

    Plan shape (r6 stage-fusion, the weak-tail ask): each list is taken
    by TakeOrderedAndProject — only per-partition top-{LIST_K} rows ever
    move — then the two bounded lists are UNIONED with a source tag and
    ranked in ONE window pass (partitionBy src), and the full-outer
    fusion join is replaced by a groupBy(doc_id) pivot over the same
    ≤2x{LIST_K} rows: one window + one agg where the r5 shape paid two
    single-partition windows and a two-sided join shuffle."""
    d = tables(spark, sf_dir)["documents"]
    emb = tables(spark, sf_dir)["embeddings"]
    kw = (
        _bm25_scores(d)
        .orderBy(F.desc("score"), "doc_id")
        .limit(LIST_K)
        .select("doc_id", F.col("score").alias("s"), F.lit("kw").alias("src"))
    )
    qv = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("q_vec"), norm(F.col("embedding")).alias("__qn")
    )
    vs = (
        emb.withColumn("__cn", norm(F.col("embedding")))
        .crossJoin(F.broadcast(qv))
        .withColumn(
            "cos",
            cosine_hoisted(
                F.col("embedding"), F.col("q_vec"), F.col("__cn"), F.col("__qn")
            ),
        )
        .orderBy(F.desc("cos"), "vec_id")
        .limit(LIST_K)
        .select(
            F.col("vec_id").alias("doc_id"),
            F.col("cos").alias("s"),
            F.lit("vs").alias("src"),
        )
    )
    both = kw.unionByName(vs).withColumn(
        "r",
        F.row_number().over(
            W.partitionBy("src").orderBy(F.desc("s"), "doc_id")
        ),
    )
    fused = both.groupBy("doc_id").agg(
        F.max(F.when(F.col("src") == "kw", F.col("r"))).alias("kw_r"),
        F.max(F.when(F.col("src") == "vs", F.col("r"))).alias("vec_r"),
    )
    rrf = F.coalesce(1.0 / (RRF_K + F.col("kw_r")), F.lit(0.0)) + F.coalesce(
        1.0 / (RRF_K + F.col("vec_r")), F.lit(0.0)
    )
    return (
        fused.select(
            "doc_id",
            F.col("kw_r").cast("long").alias("kw_rank"),
            F.col("vec_r").cast("long").alias("vec_rank"),
            rrf.alias("rrf_score"),
        )
        .orderBy(F.desc("rrf_score"), "doc_id")
        .limit(TOP_K)
    )


# ---------------------------------------------------------------------------
# f108 — mergeable sketch rollup
# ---------------------------------------------------------------------------

#: Relative tolerance for the sketch contract: Datasketches HLL at the
#: default lgConfigK=12 has ~1.6% relative standard error; 5% is >3 sigma.
SKETCH_TOL = 0.05


@register(
    "a108_sketch_rollup",
    """SELECT event_type AS grp,
              COUNT(DISTINCT user_id) AS exact, TRUE AS within_tol
       FROM events GROUP BY event_type
       UNION ALL
       SELECT 'ALL', COUNT(DISTINCT user_id), TRUE FROM events
       ORDER BY grp""",
)
def a108_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level distinct-user rollup proving sketch MERGEABILITY: the
    global estimate is computed by union-merging the per-event-type HLL
    sketches — never by rescanning the events — which is exactly how a
    100 TB deployment serves "distinct users, any slice" (store partial
    sketches per partition/day, merge at query time; cost is sketch
    count, not data size).

    Oracle contract (the b59 pattern): raw sketch estimates are
    engine-specific, so each row emits the exact count plus a boolean
    asserting the estimate landed within SKETCH_TOL of it; the oracle
    emits literal TRUE. Deterministic for fixed input — not flaky."""
    ev = tables(spark, sf_dir)["events"]
    # cached (review r8): the per-type sketch frame feeds the per-group
    # rows AND the merged-union row — uncached, the sketch-building
    # event scan ran twice (the global exact rescan below is inherent:
    # users span types, so it cannot derive from the per-type frame)
    per = track_cache(
        ev.groupBy("event_type").agg(
            F.hll_sketch_agg("user_id").alias("sk"),
            F.count_distinct("user_id").alias("exact"),
        )
    )
    within = (
        F.abs(F.hll_sketch_estimate("sk") - F.col("exact"))
        <= F.lit(SKETCH_TOL) * F.col("exact")
    ).alias("within_tol")
    per_rows = per.select(F.col("event_type").alias("grp"), "exact", within)
    # global: merged partial sketches only; the exact rescan exists to
    # CHECK the estimate, it is not the production read path
    merged = per.agg(F.hll_union_agg("sk").alias("sk")).crossJoin(
        F.broadcast(ev.agg(F.count_distinct("user_id").alias("exact")))
    )
    gl = merged.select(F.lit("ALL").alias("grp"), "exact", within)
    return per_rows.unionByName(gl).orderBy("grp")
