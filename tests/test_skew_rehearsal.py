"""Mechanized hot-duplicate SKEW rehearsal (judge ask r7 #6): the
BASELINE.md appendix table — d96/a141/a038/a0006 wall-clock flat under a
B=10k hot duplicate cluster — asserted in the suite so future edits
cannot silently regress the star collapse.

Timing under this host's CPU-steal (spread routinely 1.5-3) needs the
interleaved discipline: flat and hot variants alternate inside the same
window and each side takes its min-of-3, so a steal burst inflates both
or neither. The bound is 1.25x + 1s absolute slack (the ask's ~1.2x,
with the slack absorbing sub-second walls where a constant-cost extra
stage dominates the ratio).

Marked ``slow`` (pytest.ini) — ~4 min: generation of the 20k corpora is
module-scoped and the queries run 6 times each.
"""

from __future__ import annotations

import time

import pytest

from one_stop_cdc_ingestion_toolkit_spark.operators import (
    load_all,
    release_caches,
)

N_DOCS = 20_000
HOT = 10_000


@pytest.fixture(scope="module")
def corpora(tmp_path_factory):
    from tools.gen_scale import write_documents

    flat = str(tmp_path_factory.mktemp("skew_flat"))
    hot = str(tmp_path_factory.mktemp("skew_hot"))
    write_documents(flat, N_DOCS)
    write_documents(hot, N_DOCS, hot_copies=HOT)
    return flat, hot


@pytest.fixture(scope="module")
def emb_corpora(spark, tmp_path_factory):
    """a038's analog: embeddings.parquet with one vector repeated HOT
    times (same doc corpus dirs reused so the fixture stays tiny)."""
    from pyspark.sql import functions as F

    flat = str(tmp_path_factory.mktemp("skew_emb_flat"))
    hot = str(tmp_path_factory.mktemp("skew_emb_hot"))
    base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    one = base.orderBy("vec_id").limit(1).collect()[0]["embedding"]
    dup = spark.range(1_000_000, 1_000_000 + HOT).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(float(x)).cast("float") for x in one]).alias("embedding"),
    )
    cols = base.columns
    extra = [c for c in cols if c not in ("vec_id", "embedding")]
    for c in extra:
        dup = dup.withColumn(c, F.lit(None).cast(dict(base.dtypes)[c]))
    base.write.mode("overwrite").parquet(f"{flat}/embeddings.parquet")
    base.unionByName(dup.select(*cols)).write.mode("overwrite").parquet(
        f"{hot}/embeddings.parquet"
    )
    return flat, hot


def _interleaved_min(fn_flat, fn_hot, n=3):
    tf = th = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn_flat()
        tf = min(tf, time.time() - t0)
        release_caches()
        t0 = time.time()
        fn_hot()
        th = min(th, time.time() - t0)
        release_caches()
    return tf, th


@pytest.mark.slow
@pytest.mark.parametrize(
    "qname", ["d96_dup_clusters", "a141_cluster_retention",
              "a0006_minhash_pairs_collapsed"]
)
def test_hot_duplicate_wall_stays_flat(spark, corpora, qname):
    """B=10k identical boilerplate docs on a 20k corpus: the collapsed
    paths must pay O(B), not B²/2 — wall within ~1.2x of the flat run."""
    flat, hot = corpora
    reg = load_all()
    fn = reg[qname].fn
    tf, th = _interleaved_min(
        lambda: fn(spark, flat).count(), lambda: fn(spark, hot).count()
    )
    assert th <= 1.25 * tf + 1.0, (
        f"{qname}: hot={th:.2f}s vs flat={tf:.2f}s — star collapse regressed?"
    )


@pytest.mark.slow
def test_hot_embedding_wall_stays_flat(spark, emb_corpora):
    """a038 under a B=10k identical-embedding cluster (one LSH bucket):
    the embedding star collapse keeps the semantic-CC wall flat."""
    flat, hot = emb_corpora
    reg = load_all()
    fn = reg["a038_semantic_clusters"].fn
    tf, th = _interleaved_min(
        lambda: fn(spark, flat).count(), lambda: fn(spark, hot).count()
    )
    assert th <= 1.25 * tf + 1.0, (
        f"a038: hot={th:.2f}s vs flat={tf:.2f}s — star collapse regressed?"
    )
