"""Cache hygiene: operators that persist() intermediates must leave zero
cached RDDs behind once release_caches() runs — a long-lived session
(bench loop, the driver's multi-query sweep) must not accumulate storage
memory across queries."""

from __future__ import annotations

from pyspark.sql import functions as F

from one_stop_cdc_ingestion_toolkit_spark.catalog import tables
from one_stop_cdc_ingestion_toolkit_spark.operators import (
    _LIVE_CACHES,
    release_caches,
)
from one_stop_cdc_ingestion_toolkit_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)
from tests.conftest import SF_DIR


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def test_caching_queries_release_everything(spark):
    """Run every track_cache-using operator, then release: no persistent
    RDDs may remain registered with the SparkContext."""
    d = tables(spark, SF_DIR)["documents"]
    minhash_lsh_pairs(d, "doc_id", "text").collect()
    ngram_jaccard_pairs(d, "doc_id", "text", 0.5).collect()
    from one_stop_cdc_ingestion_toolkit_spark.operators import load_all

    load_all()["b55_embedding_neardup"].fn(spark, SF_DIR).collect()
    assert len(_LIVE_CACHES) > 0  # the operators did register caches
    released = release_caches()
    assert released >= 3
    assert len(_LIVE_CACHES) == 0
    # unpersist(blocking=False) still deregisters immediately
    assert _n_persistent(spark) == 0


def test_release_caches_idempotent(spark):
    assert release_caches() == 0
