"""Training-data pipeline operators: deterministic sampling, text
normalization, ID scrubbing, corpus mixing weights, length filtering.

These are the corpus-preparation steps a large-scale training-data
pipeline runs between raw ingestion (the CDC/streaming side of this
engine) and model consumption. All hot-path logic is built-in Spark SQL
functions — JVM-side, codegen'd — so every operator is a single scan
plus (at most) one aggregation shuffle at any corpus size.

Determinism notes (oracle hash parity):
- Sampling uses md5 of a salted key, never rand(): the same row is kept
  on both engines AND under Spark task retry (a rand()-based sample is
  not idempotent across stage re-execution — same argument as
  operators/skew.py's deterministic salt).
- Mixing weights emit sqrt(n/total): division and sqrt are both
  correctly-rounded IEEE ops over exactly-representable integer inputs,
  so the doubles are bit-equal across engines with no cross-row
  double-summation order dependence.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from one_stop_cdc_ingestion_toolkit_spark.catalog import tables
from one_stop_cdc_ingestion_toolkit_spark.operators import register

#: salt for the deterministic sampler — changing it draws a fresh sample
SAMPLE_SALT = "s:"


def sample_hash(key: Column) -> Column:
    """First hex digit of md5(salt || key): uniform over 16 buckets,
    deterministic across engines and task retries."""
    return F.substring(F.md5(F.concat(F.lit(SAMPLE_SALT), key.cast("string"))), 1, 1)


def keep_stratified(key: Column, threshold: Column) -> Column:
    """Keep a row iff its sample hash is below the stratum threshold
    ('4' → 4/16 = 25 %, '8' → 50 %, ...)."""
    return sample_hash(key) < threshold


def normalize_text(text: Column) -> Column:
    """Normalization pipeline: lowercase → strip non-alnum (ASCII) →
    collapse whitespace → trim. One codegen'd projection."""
    low = F.lower(text)
    alnum = F.regexp_replace(low, r"[^a-z0-9\s]", "")
    return F.trim(F.regexp_replace(alnum, r"\s+", " "))


def scrub_ids(text: Column) -> Column:
    """Replace every digit run with '#' (ID/PII scrubbing primitive)."""
    return F.regexp_replace(text, r"[0-9]+", "#")


@register(
    "c80_stratified_sample",
    f"""SELECT lang, COUNT(*) AS n_total,
              COUNT(CASE WHEN substr(md5('{SAMPLE_SALT}' || CAST(doc_id AS VARCHAR)), 1, 1)
                              < (CASE WHEN lang = 'en' THEN '4' ELSE '8' END)
                         THEN 1 END) AS n_kept
       FROM documents GROUP BY lang ORDER BY lang""",
)
def c80_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified downsampling for corpus mixing: the
    over-represented language ('en' in the fixture) keeps 25 %, the rest
    50 %. Hash-based (md5 of salted doc_id), so the sample is stable
    under task retry and reproducible across runs — rand()-based
    TABLESAMPLE is neither. At 100 TB this is a pure map-side filter
    (no shuffle at all until the audit aggregation)."""
    d = tables(spark, sf_dir)["documents"]
    threshold = F.when(F.col("lang") == "en", F.lit("4")).otherwise(F.lit("8"))
    kept = keep_stratified(F.col("doc_id"), threshold)
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count(F.when(kept, 1)).alias("n_kept"),
        )
        .orderBy("lang")
    )


@register(
    "c81_text_normalize",
    r"""SELECT doc_id,
              length(trim(regexp_replace(
                  regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'),
                  '\s+', ' ', 'g'))) AS n_norm_chars,
              substr(trim(regexp_replace(
                  regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'),
                  '\s+', ' ', 'g')), 1, 40) AS norm_prefix
       FROM documents ORDER BY doc_id""",
)
def c81_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text normalization (lower/strip-punct/collapse-ws) as a single
    whole-stage-codegen projection — the canonical pre-dedup cleanup
    step feeding fingerprint()/minhash (operators/text.py:74)."""
    d = tables(spark, sf_dir)["documents"]
    norm = normalize_text(F.col("text"))
    return d.select(
        "doc_id",
        F.length(norm).alias("n_norm_chars"),
        F.substring(norm, 1, 40).alias("norm_prefix"),
    ).orderBy("doc_id")


@register(
    "c82_id_scrub",
    r"""SELECT event_type, COUNT(*) AS n_events,
              CAST(SUM(length(props) - length(regexp_replace(props, '[0-9]+', '#', 'g')))
                AS BIGINT) AS chars_scrubbed,
              COUNT(CASE WHEN props != regexp_replace(props, '[0-9]+', '#', 'g')
                         THEN 1 END) AS n_changed
       FROM events GROUP BY event_type ORDER BY event_type""",
)
def c82_id_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ID/PII scrubbing audit: digit runs in event payloads replaced by
    '#', reporting how many characters each event type leaks. The scrub
    itself is a map-side regexp_replace; only the audit aggregates."""
    ev = tables(spark, sf_dir)["events"]
    scrubbed = scrub_ids(F.col("props"))
    removed = F.length("props") - F.length(scrubbed)
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(removed).cast("long").alias("chars_scrubbed"),
            F.count(F.when(F.col("props") != scrubbed, 1)).alias("n_changed"),
        )
        .orderBy("event_type")
    )


@register(
    "c83_mix_weights",
    """WITH per_src AS (
         SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
       )
       SELECT source, n_docs,
              sqrt(CAST(n_docs AS DOUBLE) / CAST(SUM(n_docs) OVER () AS DOUBLE))
                AS mix_weight
       FROM per_src ORDER BY source""",
)
def c83_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled corpus mixing weights (sqrt of the source's doc
    share — the alpha=0.5 sampling temperature used for multilingual /
    multi-domain training mixes). sqrt(n/total) keeps the doubles
    bit-reproducible: integer counts convert exactly, and divide + sqrt
    are correctly-rounded, so no ROUND() is needed. The window total runs
    over the already-aggregated per-source frame (|sources| rows), not
    the corpus."""
    d = tables(spark, sf_dir)["documents"]
    per_src = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    total = F.sum("n_docs").over(W.partitionBy())
    return per_src.select(
        "source",
        "n_docs",
        F.sqrt(F.col("n_docs").cast("double") / total.cast("double")).alias(
            "mix_weight"
        ),
    ).orderBy("source")


@register(
    "c84_length_histogram",
    """SELECT CAST(floor(n_chars / 100.0) AS BIGINT) AS bucket,
              COUNT(*) AS n_docs,
              MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
       FROM documents GROUP BY 1 ORDER BY bucket""",
)
def c84_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length histogram (100-char buckets) — the evidence base
    for length-filter thresholds in a pretraining cleanup pipeline.
    Integer-only arithmetic; one partial-agg shuffle of |buckets| rows."""
    d = tables(spark, sf_dir)["documents"]
    bucket = F.floor(F.col("n_chars") / F.lit(100.0)).alias("bucket")
    return (
        d.groupBy(bucket)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("bucket")
    )
