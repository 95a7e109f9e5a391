"""Deduplication operators for large-scale training-data pipelines.

The reference's pipeline exists to feed a lake (Hudi hint,
``/root/reference/README.md:22-32``); dedup is the first thing a 100 TB
corpus pipeline does to that lake. Four families, all shuffle-conscious:

- **Exact** — hash-groupBy on a content digest. One shuffle on the digest.
- **MinHash + LSH** — shingle → per-seed min-hash → band → bucket self-join.
  The self-join is on band signature (small buckets), never all-pairs.
- **N-gram Jaccard** — inverted-index join on shingles (pair generation is
  bounded by shared-shingle postings), exact Jaccard on candidate pairs.
- **SimHash** — 32-bit fingerprint from word hashes; near-dups share bands
  of the fingerprint.

All hashing is MD5-derived so the DuckDB oracle can reproduce results
bit-for-bit (engine-neutral, unlike xxhash64/murmur which differ between
engines). At 100 TB each family's shuffle key is the digest/band — never
the document — so skew is bounded by bucket size, and AQE's skew-join
handles pathological buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from one_stop_cdc_ingestion_toolkit_spark.catalog import tables
from one_stop_cdc_ingestion_toolkit_spark.operators import register

# MinHash configuration: 8 seeded hashes, 4 bands x 2 rows.
MINHASH_SEEDS = tuple(f"s{i}:" for i in range(8))
MINHASH_BANDS = ((0, 1), (2, 3), (4, 5), (6, 7))
SHINGLE_K = 3  # word-shingle width


# ---------------------------------------------------------------------------
# Reusable operator API (DataFrame -> DataFrame)
# ---------------------------------------------------------------------------


def dedup_exact(df: DataFrame, content_col: str, order_col: str) -> DataFrame:
    """Keep-first exact dedup by content digest (one shuffle on the digest)."""
    w = W.partitionBy(F.md5(F.col(content_col))).orderBy(order_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def word_shingles(text: Column, k: int = SHINGLE_K) -> Column:
    """Array of k-word shingles of ``lower(text)``; empty when < k words."""
    words = F.split(F.lower(text), r"\s+")
    n = F.size(words)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.concat_ws(" ", F.slice(words, i, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _seeded_min(shingles: Column, seed: str) -> Column:
    # NB: the transform lambda must take exactly ONE arg — a 2-arg lambda
    # would receive the element index as its second argument.
    return F.array_min(F.transform(shingles, lambda s: F.md5(F.concat(F.lit(seed), s))))


def minhash_signature(shingles: Column, seeds: tuple[str, ...] = MINHASH_SEEDS) -> list[Column]:
    """Per-seed min of md5(seed || shingle). Lexicographic min over hex
    strings is engine-neutral (pure ASCII compare)."""
    return [_seeded_min(shingles, seed).alias(f"mh{i}") for i, seed in enumerate(seeds)]


def minhash_lsh_pairs(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) via MinHash banding.

    Plan shape: project → per-row signature (no shuffle) → explode 4 band
    rows → shuffle on (band_idx, band_sig) → self-join inside buckets.
    """
    sig = df.select(
        F.col(id_col).alias("id"),
        *minhash_signature(word_shingles(F.col(text_col))),
    ).filter(F.col("mh0").isNotNull())
    bands = sig.select(
        "id",
        F.array(
            *[
                F.concat_ws("|", f"mh{a}", f"mh{b}").alias(f"band{i}")
                for i, (a, b) in enumerate(MINHASH_BANDS)
            ]
        ).alias("bands"),
    ).select("id", F.posexplode("bands").alias("band_idx", "band_sig"))
    left = bands.select("band_idx", "band_sig", F.col("id").alias("id_a"))
    right = bands.select("band_idx", "band_sig", F.col("id").alias("id_b"))
    return (
        left.join(right, ["band_idx", "band_sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, threshold: float = 0.5
) -> DataFrame:
    """Exact Jaccard over word-shingle sets for pairs sharing >=1 shingle.

    Inverted-index join: explode distinct shingles → shuffle on shingle →
    pair counts → join per-doc set sizes → filter by threshold. Hot
    shingles (stopword runs) are the skew risk at scale; AQE skew-join
    splits them.
    """
    sh = (
        df.select(F.col(id_col).alias("id"), word_shingles(F.col(text_col)).alias("sh"))
        .select("id", F.explode("sh").alias("shingle"))
        .distinct()
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("id").alias("id_a"), "shingle")
    b = sh.select(F.col("id").alias("id_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        common.join(sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("na")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("nb")), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(text: Column, bits: int = 32) -> Column:
    """32-bit SimHash over words: per-word 32-bit hash from md5 hex; each bit
    position votes +1/-1; sign of the vote sum sets the fingerprint bit.

    Built entirely from higher-order functions (no Python UDF): the
    per-word hash is ``conv(substr(md5(w),1,8),16,10)`` and the bit votes
    are aggregated with ``F.aggregate`` over the word array.
    """
    words = F.array_distinct(F.split(F.lower(text), r"\s+"))
    hashes = F.transform(
        words, lambda w: F.conv(F.substring(F.md5(w), 1, 8), 16, 10).cast("long")
    )
    # votes[i] = sum over words of (bit_i(h) ? 1 : -1); shift amounts must be
    # Python ints (Spark's shiftright takes a literal), hence the list compr.
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), bits),
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    F.when(
                        F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, F.lit(1)
                    ).otherwise(F.lit(-1))
                    for i in range(bits)
                ]
            ),
            lambda x, y: x + y,
        ),
    )
    # fingerprint = sum of 2^i where votes[i] > 0
    powers = F.array(*[F.lit(1 << i).cast("long") for i in range(bits)])
    contrib = F.zip_with(
        votes, powers, lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long"))
    )
    return F.aggregate(contrib, F.lit(0).cast("long"), lambda acc, x: acc + x)


def simhash_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Group docs by exact SimHash fingerprint (cheap near-dup bucketing)."""
    return (
        df.select(F.col(id_col).alias("id"), simhash(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n"), F.min("id").alias("keeper"))
    )


# ---------------------------------------------------------------------------
# Registered oracle-checked queries over the documents fixture
# ---------------------------------------------------------------------------


@register(
    "q43_minhash_lsh_pairs",
    f"""WITH w AS (
          SELECT doc_id, string_split_regex(lower(text), '\\s+') AS words
          FROM documents
        ),
        sh AS (
          SELECT doc_id,
                 unnest(list_transform(generate_series(1, len(words) - {SHINGLE_K - 1}),
                        i -> array_to_string(words[i:i+{SHINGLE_K - 1}], ' '))) AS shingle
          FROM w WHERE len(words) >= {SHINGLE_K}
        ),
        sig AS (
          SELECT doc_id,
                 {", ".join(f"MIN(MD5('s{i}:' || shingle)) AS mh{i}" for i in range(8))}
          FROM sh GROUP BY doc_id
        ),
        bands AS (
          {" UNION ALL ".join(f"SELECT doc_id, {i} AS band_idx, mh{a} || '|' || mh{b} AS band_sig FROM sig" for i, (a, b) in enumerate(MINHASH_BANDS))}
        )
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band_idx = b.band_idx AND a.band_sig = b.band_sig
         AND a.doc_id < b.doc_id
        ORDER BY id_a, id_b""",
)
def q43_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tables(spark, sf_dir)["documents"]
    return minhash_lsh_pairs(d, "doc_id", "text").orderBy("id_a", "id_b")


@register(
    "q44_ngram_jaccard_dups",
    f"""WITH w AS (
          SELECT doc_id, string_split_regex(lower(text), '\\s+') AS words
          FROM documents
        ),
        sh AS (
          SELECT DISTINCT doc_id,
                 unnest(list_transform(generate_series(1, len(words) - {SHINGLE_K - 1}),
                        i -> array_to_string(words[i:i+{SHINGLE_K - 1}], ' '))) AS shingle
          FROM w WHERE len(words) >= {SHINGLE_K}
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        common AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT id_a, id_b,
               ROUND(CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
        FROM common
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.5
        ORDER BY id_a, id_b""",
)
def q44_ngram_jaccard_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tables(spark, sf_dir)["documents"]
    return ngram_jaccard_pairs(d, "doc_id", "text", 0.5).orderBy("id_a", "id_b")


@register(
    "q45_simhash_buckets",
    """WITH words AS (
         SELECT doc_id, unnest(list_distinct(string_split_regex(lower(text), '\\s+'))) AS w
         FROM documents
       ),
       bits AS (
         SELECT doc_id, w,
                CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT) AS h
         FROM words
       ),
       votes AS (
         SELECT doc_id, i.range AS bit,
                SUM(CASE WHEN (h >> CAST(i.range AS INTEGER)) & 1 = 1
                         THEN 1 ELSE -1 END) AS v
         FROM bits, range(0, 32) i GROUP BY 1, 2
       ),
       fp AS (
         SELECT doc_id,
                SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << CAST(bit AS INTEGER))
                         ELSE 0 END) AS fp
         FROM votes GROUP BY doc_id
       )
       SELECT fp, COUNT(*) AS n, MIN(doc_id) AS keeper
       FROM fp GROUP BY fp ORDER BY fp""",
)
def q45_simhash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tables(spark, sf_dir)["documents"]
    return simhash_dedup(d, "doc_id", "text").orderBy("fp")
