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
