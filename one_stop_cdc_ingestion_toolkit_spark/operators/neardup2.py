"""Near-duplicate surface, round-3 extension batch (`e147`–`e150`):
Hamming-verified SimHash pairs, quality-temperature sampling, an
LSH-bucketed kNN-graph degree audit, and directional containment over
LSH candidate pairs.

All four are built-in-function DataFrame plans layered on helpers from
``dedup.py`` / ``similarity.py`` / ``text.py``; no reference parity (the
reference is a provisioning CLI) — these extend the training-data
surface (SURVEY.md §2.5).

Scale shapes:

- e147 partitions the 32-bit SimHash into 4 bytes; by pigeonhole, any
  pair within Hamming distance ≤ 3 shares at least one exact byte, so
  candidate generation is a byte-bucket equi-join (never all-pairs) and
  the verify is one codegen ``bit_count(xor)``.
- e148 is a pure map-side accept/reject (deterministic md5 uniform vs a
  per-source temperature weight) followed by one small agg — the weight
  table is per-source maxima, broadcast back.
- e149 bounds pair generation by the LSH sign-bucket (8 hyperplanes →
  256 buckets); the degree histogram is two partial-agg shuffles over
  id-keyed rows, embeddings never shuffle twice.
- e150 computes exact shingle containment ONLY for MinHash-LSH candidate
  pairs (q43's banded self-join bounds the pair space); the intersection
  count joins postings against the bounded pair list, so cost follows
  candidates × shingles-per-doc, not corpus².
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from one_stop_cdc_ingestion_toolkit_spark.catalog import tables
from one_stop_cdc_ingestion_toolkit_spark.operators import (
    REGISTRY,
    register,
    track_cache,
)
from one_stop_cdc_ingestion_toolkit_spark.operators.dedup import (  # noqa: F401
    minhash_lsh_pairs,
    simhash,
    word_shingles,
)
from one_stop_cdc_ingestion_toolkit_spark.operators.similarity import (
    _duck_cos,
    _duck_signature,
    cosine,
    lsh_signature,
)
from one_stop_cdc_ingestion_toolkit_spark.operators.text import quality_score

#: max Hamming distance for e147 (4 byte-bands cover ≤ 3 flipped bits).
HAMMING_MAX = 3
#: sampling temperature exponent for e148.
SAMPLE_POW = 2
#: cosine threshold for an e149 kNN-graph edge.
KNN_TAU = 0.2

#: DuckDB twin of dedup.simhash (extracted from the b45 oracle).
_DUCK_SIMHASH_CTE = """
  words AS (
    SELECT doc_id,
           unnest(list_distinct(string_split_regex(lower(text), '\\s+'))) AS w
    FROM documents),
  bits AS (
    SELECT doc_id, CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT) AS h
    FROM words),
  votes AS (
    SELECT doc_id, i.range AS bit,
           SUM(CASE WHEN (h >> CAST(i.range AS INTEGER)) & 1 = 1
                    THEN 1 ELSE -1 END) AS v
    FROM bits, range(0, 32) i GROUP BY 1, 2),
  fp AS (
    SELECT doc_id,
           CAST(SUM(CASE WHEN v > 0
                         THEN (CAST(1 AS BIGINT) << CAST(bit AS INTEGER))
                         ELSE 0 END) AS BIGINT) AS fp
    FROM votes GROUP BY doc_id)
"""


@register(
    "a001_simhash_hamming_pairs",
    f"""WITH {_DUCK_SIMHASH_CTE},
       bands AS (
         SELECT doc_id, fp, i.range AS band,
                (fp >> CAST(i.range * 8 AS INTEGER)) & 255 AS byte
         FROM fp, range(0, 4) i),
       cand AS (
         SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                a.fp AS fp_a, b.fp AS fp_b
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.byte = b.byte AND a.doc_id < b.doc_id),
       pairs AS (
         SELECT id_a, id_b,
                CAST(bit_count(xor(fp_a, fp_b)) AS INT) AS hamming
         FROM cand WHERE bit_count(xor(fp_a, fp_b)) <= {HAMMING_MAX})
       SELECT hamming, CAST(COUNT(*) AS BIGINT) AS n_pairs,
              CAST(MIN(id_a) AS BIGINT) AS min_id_a,
              CAST(MIN(id_b) AS BIGINT) AS min_id_b
       FROM pairs GROUP BY hamming ORDER BY hamming""",
)
def a001_simhash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram (by Hamming distance, with min-id witnesses) of
    document pairs within SimHash Hamming distance ≤ 3 — the radius at
    which 32-bit SimHash flags near-identical text. Exact-bucket
    SimHash grouping (b45) misses fingerprints that differ by a bit;
    this closes that gap with the standard multi-band trick: a pair ≤ 3
    bits apart must agree exactly on one of the 4 fingerprint bytes
    (pigeonhole), so candidates come from a byte-band equi-join and the
    Hamming verify is codegen bit arithmetic. The registered query
    aggregates (the raw pair list is quadratic-ish on template-heavy
    corpora — 1.5M pairs at sf0.1); `simhash_hamming_pairs` below
    returns the pairs themselves for pipeline use."""
    pairs = simhash_hamming_pairs(tables(spark, sf_dir)["documents"])
    return (
        pairs.groupBy("hamming")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.min("id_a").alias("min_id_a"),
            F.min("id_b").alias("min_id_b"),
        )
        .orderBy("hamming")
    )


def simhash_hamming_pairs(
    d: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id_a, id_b, hamming) pairs with SimHash Hamming ≤ HAMMING_MAX."""
    fp = d.select(F.col(id_col).alias("doc_id"), simhash(F.col(text_col)).alias("fp"))
    # the 32-bit fingerprint costs an explode-words + md5 + 32 bit-votes
    # pass over the corpus — persist it so the banded self-join reads it
    # once instead of recomputing it on both sides (the q43 MinHash rule;
    # released via release_caches() after materialization)
    fp = track_cache(fp)
    bands = fp.select(
        "doc_id",
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright("fp", i * 8).bitwiseAND(F.lit(255)).alias(
                            "byte"
                        ),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "fp", "bb.band", "bb.byte")
    a = bands.select(
        F.col("doc_id").alias("id_a"), F.col("fp").alias("fp_a"), "band", "byte"
    )
    b = bands.select(
        F.col("doc_id").alias("id_b"), F.col("fp").alias("fp_b"), "band", "byte"
    )
    ham = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (
        a.join(b, ["band", "byte"])
        .filter(F.col("id_a") < F.col("id_b"))
        # verify Hamming BEFORE the cross-band dedup: most band-collisions
        # fail the radius check, so the distinct (the only wide exchange
        # on pair rows) sees surviving pairs only — on template-heavy
        # corpora this shrinks its input by an order of magnitude
        .filter(ham <= HAMMING_MAX)
        .select("id_a", "id_b", ham.cast("int").alias("hamming"))
        .distinct()
        .orderBy("id_a", "id_b")
    )


#: DuckDB twin of text.quality_score (extracted from the q48 oracle).
_DUCK_QUALITY = r"""ROUND(LEAST(CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE)
                      / 100.0, 1.0)
                * (1.0 - CAST(length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g'))
                              AS DOUBLE)
                        / GREATEST(length(text), 1)), 4)"""


@register(
    "a002_temperature_sample",
    f"""WITH q AS (
         SELECT doc_id, source, {_DUCK_QUALITY} AS quality,
                CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                     AS BIGINT) / 4294967296.0 AS u
         FROM documents),
       m AS (SELECT source, MAX(quality) AS qmax FROM q GROUP BY source),
       s AS (
         SELECT q.source, q.quality,
                q.u < POW(q.quality / m.qmax, {SAMPLE_POW}) AS keep
         FROM q JOIN m ON q.source = m.source)
       SELECT source,
              CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS kept,
              ROUND(SUM(CASE WHEN keep THEN 1 ELSE 0 END)
                    / CAST(COUNT(*) AS DOUBLE), 4) AS kept_frac
       FROM s GROUP BY source ORDER BY source""",
)
def a002_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-temperature sampling: keep a document with probability
    (quality / source-max-quality)^2 — the standard up-weight-the-best
    corpus reshaping — decided by a deterministic md5-derived uniform,
    so the sample is identical under task retries and re-runs (no
    rand()). The per-source weight table is a tiny agg broadcast back;
    the accept test is map-side."""
    d = tables(spark, sf_dir)["documents"]
    q = d.select(
        "doc_id",
        "source",
        quality_score(F.col("text")).alias("quality"),
        (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("long")
            .cast("double")
            / F.lit(4294967296.0)
        ).alias("u"),
    )
    m = q.groupBy("source").agg(F.max("quality").alias("qmax"))
    s = q.join(F.broadcast(m), "source").withColumn(
        "keep", F.col("u") < F.pow(F.col("quality") / F.col("qmax"), SAMPLE_POW)
    )
    kept = F.sum(F.when(F.col("keep"), 1).otherwise(0))
    return (
        s.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            kept.cast("long").alias("kept"),
            F.round(kept / F.count(F.lit(1)).cast("double"), 4).alias("kept_frac"),
        )
        .orderBy("source")
    )


@register(
    "a003_knn_degree",
    f"""WITH sig AS (
         SELECT vec_id, embedding, {_duck_signature()} AS s FROM embeddings),
       edges AS (
         SELECT a.vec_id AS id_a, b.vec_id AS id_b
         FROM sig a JOIN sig b
           ON a.s = b.s AND a.vec_id < b.vec_id
         WHERE {_duck_cos('a.embedding', 'b.embedding')} >= {KNN_TAU}),
       nbrs AS (
         SELECT id_a AS vec_id, id_b AS nbr FROM edges
         UNION ALL
         SELECT id_b AS vec_id, id_a AS nbr FROM edges),
       deg AS (
         SELECT s.vec_id, CAST(COUNT(n.nbr) AS BIGINT) AS degree
         FROM sig s LEFT JOIN nbrs n ON s.vec_id = n.vec_id
         GROUP BY s.vec_id)
       SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_vecs
       FROM deg GROUP BY degree ORDER BY degree""",
)
def a003_knn_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of the LSH-bucketed approximate kNN graph over
    the embedding corpus (edges = same sign-bucket AND cosine ≥ 0.2) —
    the index-quality audit run before trusting ANN retrieval: a spiky
    histogram means hub buckets (recall rot + join skew), a mass at
    degree 0 means over-partitioned planes. Pair generation is bounded
    per bucket; the histogram is two partial-agg shuffles."""
    e = tables(spark, sf_dir)["embeddings"]
    sig = e.select("vec_id", "embedding", lsh_signature(F.col("embedding")).alias("s"))
    a = sig.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"), "s"
    )
    b = sig.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"), "s"
    )
    edges = (
        a.join(b, "s")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(cosine(F.col("va"), F.col("vb")) >= KNN_TAU)
        .select("id_a", "id_b")
    )
    nbrs = edges.select(F.col("id_a").alias("vec_id")).unionAll(
        edges.select(F.col("id_b").alias("vec_id"))
    )
    deg = (
        sig.select("vec_id")
        .join(nbrs.groupBy("vec_id").agg(F.count(F.lit(1)).alias("d")), "vec_id", "left")
        .select(F.coalesce(F.col("d"), F.lit(0)).alias("degree"))
    )
    return (
        deg.groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_vecs"))
        .orderBy("degree")
    )


_Q43_ORACLE = REGISTRY["q43_minhash_lsh_pairs"].oracle


@register(
    "a004_containment_pairs",
    f"""WITH pairs AS (SELECT id_a, id_b FROM ({_Q43_ORACLE})),
       sh AS (
         SELECT DISTINCT w.doc_id,
                unnest(list_transform(generate_series(1, len(words) - 2),
                       i -> array_to_string(words[i:i+2], ' '))) AS shingle
         FROM (SELECT doc_id,
                      string_split_regex(lower(text), '\\s+') AS words
               FROM documents) w
         WHERE len(words) >= 3),
       sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz
                 FROM sh GROUP BY doc_id),
       inter AS (
         SELECT p.id_a, p.id_b, CAST(COUNT(*) AS BIGINT) AS n_common
         FROM pairs p
         JOIN sh sa ON sa.doc_id = p.id_a
         JOIN sh sb ON sb.doc_id = p.id_b AND sb.shingle = sa.shingle
         GROUP BY p.id_a, p.id_b)
       SELECT i.id_a, i.id_b, i.n_common,
              ROUND(i.n_common / CAST(za.sz AS DOUBLE), 4) AS cont_a,
              ROUND(i.n_common / CAST(zb.sz AS DOUBLE), 4) AS cont_b
       FROM inter i
       JOIN sizes za ON za.doc_id = i.id_a
       JOIN sizes zb ON zb.doc_id = i.id_b
       ORDER BY id_a, id_b""",
)
def a004_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional shingle containment for MinHash-LSH candidate pairs:
    |sh(A)∩sh(B)| / |sh(A)| and / |sh(B)|. Jaccard alone misses the
    quote/sub-document case (small A fully inside big B has low Jaccard
    but cont_a ≈ 1); real dedup policies branch on containment. The
    exact intersection is computed ONLY for q43's banded candidates —
    postings join against a bounded pair list, never corpus²."""
    d = tables(spark, sf_dir)["documents"]
    pairs = minhash_lsh_pairs(d, "doc_id", "text").select("id_a", "id_b")
    sh = d.select(
        "doc_id", F.explode(word_shingles(F.col("text"))).alias("shingle")
    ).distinct()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        pairs.join(
            sh.select(F.col("doc_id").alias("id_a"), "shingle"), "id_a"
        )
        .join(
            sh.select(F.col("doc_id").alias("id_b"), "shingle"),
            ["id_b", "shingle"],
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    za = sizes.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("sz_a"))
    zb = sizes.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(za, "id_a")
        .join(zb, "id_b")
        .select(
            "id_a",
            "id_b",
            "n_common",
            F.round(F.col("n_common") / F.col("sz_a").cast("double"), 4).alias(
                "cont_a"
            ),
            F.round(F.col("n_common") / F.col("sz_b").cast("double"), 4).alias(
                "cont_b"
            ),
        )
        .orderBy("id_a", "id_b")
    )
