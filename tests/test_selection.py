"""Tests for the data-selection batch (operators/selection.py): DSIR
weight semantics, retention-policy invariants vs the cluster operator,
fertility arithmetic, KL non-negativity, contamination symmetry of the
intersection — plus the plan shapes the 100 TB story depends on
(broadcast ratio tables, TakeOrderedAndProject for global top-k)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from one_stop_cdc_ingestion_toolkit_spark.catalog import tables
from one_stop_cdc_ingestion_toolkit_spark.operators.advanced import (
    d96_dup_clusters,
)
from one_stop_cdc_ingestion_toolkit_spark.operators.retrieval import (
    TOP_K,
    a106_bm25_search,
    a107_hybrid_rrf,
)
from one_stop_cdc_ingestion_toolkit_spark.operators.selection import (
    a140_dsir_importance,
    a141_cluster_retention,
    a142_fertility_audit,
    a143_source_kl_shift,
    a144_cross_contamination,
)
from one_stop_cdc_ingestion_toolkit_spark.plans import physical_plan
from tests.conftest import SF_DIR


def test_dsir_covers_every_doc_with_words(spark):
    """Per-source doc counts in the DSIR output sum to the number of
    documents that contain at least one word."""
    d = tables(spark, SF_DIR)["documents"]
    n_nonempty = d.filter(F.trim(F.col("text")) != "").count()
    out = a140_dsir_importance(spark, SF_DIR)
    assert out.agg(F.sum("n_docs")).collect()[0][0] == n_nonempty
    # target-like count can never exceed the doc count
    bad = out.filter(F.col("n_target_like") > F.col("n_docs")).count()
    assert bad == 0


def test_dsir_word_stream_never_shuffles(spark):
    """r11 shape: the word stream lives entirely inside the Arrow
    kernels — the scoring plan is scan → widen → MapInArrow → per-source
    agg, with no join and no word- or doc-keyed exchange; the lambda
    table is applied in-kernel (bounded DSIR_BUCKETS materialization),
    so the returned plan must not contain any join at all."""
    plan = physical_plan(a140_dsir_importance(spark, SF_DIR))
    assert "MapInArrow" in plan
    for node in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert node not in plan, node
    # the only hash exchange carries per-source partial aggregates
    assert plan.count("Exchange hashpartitioning") <= 1


def test_retention_agrees_with_clusters(spark):
    """a141 keeps exactly one doc per d96 cluster; its membership counts
    match the cluster operator's."""
    clusters = d96_dup_clusters(spark, SF_DIR)
    sizes = {
        r["cluster_id"]: r["n"]
        for r in clusters.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    kept = a141_cluster_retention(spark, SF_DIR).collect()
    assert {r["cluster_id"] for r in kept} == set(sizes)
    for r in kept:
        assert r["n_docs"] == sizes[r["cluster_id"]]
        assert r["n_removed"] == r["n_docs"] - 1
        assert r["keeper_doc_id"] is not None


def test_retention_keeper_is_member_with_max_quality(spark):
    """The keeper belongs to its cluster and no member outranks it."""
    from one_stop_cdc_ingestion_toolkit_spark.operators.dedup import (
        minhash_lsh_pairs,
    )
    from one_stop_cdc_ingestion_toolkit_spark.operators.advanced import (
        connected_components,
    )
    from one_stop_cdc_ingestion_toolkit_spark.operators.text import quality_score

    d = tables(spark, SF_DIR)["documents"]
    labels = connected_components(
        minhash_lsh_pairs(d, "doc_id", "text")
    ).select(F.col("node").alias("doc_id"), F.col("comp").alias("cluster_id"))
    q = {
        r["doc_id"]: r["q"]
        for r in d.select(
            "doc_id", quality_score(F.col("text")).alias("q")
        ).collect()
    }
    members: dict[int, list[int]] = {}
    for r in labels.collect():
        members.setdefault(r["cluster_id"], []).append(r["doc_id"])
    for r in a141_cluster_retention(spark, SF_DIR).collect():
        docs = members[r["cluster_id"]]
        assert r["keeper_doc_id"] in docs
        best = max(q[doc] for doc in docs)
        assert q[r["keeper_doc_id"]] == best
        assert abs(r["keeper_quality"] - best) < 1e-9


def test_fertility_ratios_consistent(spark):
    """fertility == n_subtokens/n_words exactly, and >= 1: every
    non-empty whitespace word yields at least one BPE-ish token (an
    alnum run or a single mark)."""
    rows = a142_fertility_audit(spark, SF_DIR).collect()
    assert rows, "no languages"
    for r in rows:
        assert math.isclose(
            r["fertility"], r["n_subtokens"] / r["n_words"], rel_tol=1e-12
        )
        assert r["n_words"] > 0
        assert r["fertility"] >= 1.0


def test_kl_nonnegative_and_complete(spark):
    """Smoothed KL is >= 0 (Gibbs) for every source; all sources appear."""
    d = tables(spark, SF_DIR)["documents"]
    n_sources = d.select("source").distinct().count()
    rows = a143_source_kl_shift(spark, SF_DIR).collect()
    assert len(rows) == n_sources
    for r in rows:
        assert r["kl"] >= -1e-9, (r["source"], r["kl"])


def test_contamination_intersection_symmetric(spark):
    """n_common is symmetric in (A,B); containment stays in (0, 1]."""
    rows = a144_cross_contamination(spark, SF_DIR).collect()
    common = {(r["src_a"], r["src_b"]): r["n_common"] for r in rows}
    for (sa, sb), n in common.items():
        assert common.get((sb, sa)) == n
    for r in rows:
        assert 0.0 < r["containment"] <= 1.0


def test_bm25_topk_is_take_ordered(spark):
    """Global top-k ranking must plan TakeOrderedAndProject (distributed
    per-partition top-k), never a full single-partition sort of all
    matches: WindowGroupLimit does NOT apply to empty partition specs."""
    plan = physical_plan(a106_bm25_search(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan
    out = a106_bm25_search(spark, SF_DIR).collect()
    assert len(out) <= TOP_K
    ranks = [r["rank"] for r in out]
    assert ranks == sorted(ranks) == list(range(1, len(out) + 1))


def test_hybrid_rrf_legs_are_take_ordered(spark):
    plan = physical_plan(a107_hybrid_rrf(spark, SF_DIR))
    assert plan.count("TakeOrderedAndProject") >= 2
