"""Semantic tests for operators/retrieval.py: BM25 against a
hand-computed reference on a toy corpus, and RRF fusion invariants."""

from __future__ import annotations

import math

from one_stop_cdc_ingestion_toolkit_spark.operators.retrieval import (
    BM25_B,
    BM25_K1,
    LIST_K,
    QUERY_TERMS,
    RRF_K,
    TOP_K,
    _bm25_scores,
    a107_hybrid_rrf,
)
from tests.conftest import SF_DIR

TOY = [
    (1, "table merge table window table"),
    (2, "table scan scan scan scan"),
    (3, "scan sort filter project join"),
    (4, "window window merge merge sort"),
]


def _bm25_ref() -> dict[int, float]:
    docs = {i: t.split() for i, t in TOY}
    n = len(docs)
    avgdl = sum(len(w) for w in docs.values()) / n
    out = {}
    for i, w in docs.items():
        score = 0.0
        for t in QUERY_TERMS:
            tf = w.count(t)
            df = sum(1 for ww in docs.values() if t in ww)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            score += idf * (tf * (BM25_K1 + 1)) / (
                tf + BM25_K1 * (1 - BM25_B + BM25_B * len(w) / avgdl)
            )
        if any(t in w for t in QUERY_TERMS):
            out[i] = round(score, 4)
    return out


def test_bm25_matches_hand_computation(spark):
    df = spark.createDataFrame(TOY, "doc_id long, text string")
    got = {r["doc_id"]: r["score"] for r in _bm25_scores(df).collect()}
    assert got == _bm25_ref()
    # doc 3 has no query term -> excluded; doc 1 beats doc 2 (3x 'table'
    # plus rarer terms)
    assert 3 not in got
    assert got[1] > got[2]


def test_rrf_fusion_invariants(spark):
    rows = a107_hybrid_rrf(spark, SF_DIR).collect()
    assert len(rows) == TOP_K
    seen = set()
    prev = None
    for r in rows:
        assert r["doc_id"] not in seen
        seen.add(r["doc_id"])
        # at least one ranker contributed, ranks are within the list bound
        assert r["kw_rank"] is not None or r["vec_rank"] is not None
        for rank in (r["kw_rank"], r["vec_rank"]):
            assert rank is None or 1 <= rank <= LIST_K
        # score equals the definition exactly and descends
        expect = (1.0 / (RRF_K + r["kw_rank"]) if r["kw_rank"] else 0.0) + (
            1.0 / (RRF_K + r["vec_rank"]) if r["vec_rank"] else 0.0
        )
        assert r["rrf_score"] == expect
        if prev is not None:
            assert r["rrf_score"] <= prev
        prev = r["rrf_score"]
