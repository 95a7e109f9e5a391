"""Unit/property tests for the training-data prep operators
(operators/pipeline_ops.py) beyond the oracle-parity sweep."""

from __future__ import annotations

from pyspark.sql import functions as F

from one_stop_cdc_ingestion_toolkit_spark.operators.pipeline_ops import (
    keep_stratified,
    normalize_text,
    sample_hash,
    scrub_ids,
)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0][0]


def test_normalize_idempotent(spark):
    """normalize(normalize(x)) == normalize(x) — the pipeline can be
    re-applied (e.g. on already-cleaned upstream data) without drift."""
    df = spark.createDataFrame(
        [("  Hello,   WORLD!! 42  ",), ("a\t\tb\nc",), ("", ), ("...",)],
        ["t"],
    )
    once = df.select(normalize_text(F.col("t")).alias("n"))
    twice = once.select(normalize_text(F.col("n")).alias("n"))
    assert [r.n for r in once.collect()] == [r.n for r in twice.collect()]


def test_normalize_examples(spark):
    df = spark.createDataFrame([("  Hello,   WORLD!! 42  ",)], ["t"])
    assert df.select(normalize_text(F.col("t")).alias("n")).collect()[0].n == (
        "hello world 42"
    )


def test_scrub_ids_examples(spark):
    df = spark.createDataFrame([('{"id": 12345, "v": 6}',)], ["t"])
    assert df.select(scrub_ids(F.col("t")).alias("s")).collect()[0].s == (
        '{"id": #, "v": #}'
    )


def test_sample_hash_deterministic(spark):
    """Same key → same bucket on every evaluation (retry safety)."""
    df = spark.range(100)
    a = df.select(sample_hash(F.col("id")).alias("h")).collect()
    b = df.select(sample_hash(F.col("id")).alias("h")).collect()
    assert a == b


def test_stratified_rate_bounds(spark):
    """A '8' threshold keeps ~50% (md5 hex digit uniform over 16 values);
    assert broad bounds, not exact counts — the point is the rule is a
    rate, not a row picker."""
    df = spark.range(2000)
    kept = df.filter(keep_stratified(F.col("id"), F.lit("8"))).count()
    assert 800 < kept < 1200
    none = df.filter(keep_stratified(F.col("id"), F.lit("0"))).count()
    assert none == 0
    all_ = df.filter(keep_stratified(F.col("id"), F.lit("g"))).count()
    assert all_ == 2000  # every hex digit < 'g'


def test_clean_corpus_invariants(spark):
    """The composed cleanup pipeline: output ⊆ input, no surviving exact
    dups, no candidate near-dup pair with both members surviving, quality
    floor respected, and fully deterministic across runs."""
    from one_stop_cdc_ingestion_toolkit_spark.operators import release_caches
    from one_stop_cdc_ingestion_toolkit_spark.operators.dedup import (
        minhash_lsh_pairs,
    )
    from one_stop_cdc_ingestion_toolkit_spark.operators.pipeline_ops import (
        clean_corpus,
    )
    from one_stop_cdc_ingestion_toolkit_spark.operators.text import (
        fingerprint,
        quality_score,
    )
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = clean_corpus(docs, "doc_id", "text", min_quality=0.2)
    out_rows = out.collect()
    release_caches()
    in_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    out_ids = {r.doc_id for r in out_rows}
    assert out_ids <= in_ids and out_ids
    # quality floor
    q = docs.select("doc_id", quality_score(F.col("text")).alias("q")).collect()
    qmap = {r.doc_id: r.q for r in q}
    assert all(qmap[i] >= 0.2 for i in out_ids)
    # no exact dups survive
    fps = out.select(fingerprint(F.col("text")).alias("fp")).collect()
    assert len(fps) == len({r.fp for r in fps})
    # no candidate pair has both members surviving
    surviving_pairs = minhash_lsh_pairs(out, "doc_id", "text").collect()
    release_caches()
    assert surviving_pairs == []
    # deterministic
    again = {r.doc_id for r in clean_corpus(docs, "doc_id", "text", 0.2).collect()}
    release_caches()
    assert again == out_ids
