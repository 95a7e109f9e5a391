"""Property test for the prefix-filtered jaccard join: on ANY corpus,
``ngram_jaccard_pairs`` must emit exactly the pairs a brute-force
computation over per-doc shingle sets finds.

The AllPairs/PPJoin prefix filter (dedup._prefix_candidates) rests on
two ceil() bounds with 1e-9 float guards — the highest-consequence
arithmetic in the dedup family: a boundary flipped the wrong way
silently LOSES qualifying pairs (the fixed-corpus oracles only sample a
few jaccard values, so a boundary bug could hide). The strategy draws
tiny-vocabulary corpora (6 words, 3-16 word docs) so shingle overlap is
dense and jaccard values repeatedly land ON rational thresholds
(1/3, 1/2, 2/3...), the exact regime where a mis-rounded prefix length
or overlap bound drops a pair. The expected side mirrors the engine's
double arithmetic (c / (na + nb - c) in IEEE doubles, >= the same
double threshold), so the comparison tests the FILTER, not float
folklore."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from one_stop_cdc_ingestion_toolkit_spark.operators import release_caches
from one_stop_cdc_ingestion_toolkit_spark.operators.dedup import (
    SHINGLE_K,
    ngram_jaccard_pairs,
)

#: tiny vocabulary => dense shingle collisions => jaccard values that
#: hit exact rational boundaries instead of generic irrationals
WORDS = ["aa", "bb", "cc", "dd", "ee", "ff"]

THRESHOLDS = [0.25, 1 / 3, 0.5, 2 / 3, 0.75]


@st.composite
def corpus_and_threshold(draw):
    n = draw(st.integers(4, 9))
    docs = []
    for _ in range(n):
        ln = draw(st.integers(SHINGLE_K, 16))
        docs.append(
            " ".join(draw(st.lists(st.sampled_from(WORDS), min_size=ln, max_size=ln)))
        )
    return docs, draw(st.sampled_from(THRESHOLDS))


def brute_force_pairs(docs: list[str], t: float) -> dict[tuple[int, int], float]:
    """Reference answer over raw shingle STRINGS (hashing is injective
    here for comparison purposes: equality of grams is what jaccard
    sees). Engine semantics mirrored exactly: per-doc DISTINCT k-gram
    sets, docs shorter than k contribute nothing, jaccard in double
    arithmetic, filter jac >= t (same double compare as the Spark
    filter)."""
    sets: dict[int, set[str]] = {}
    for i, d in enumerate(docs):
        ws = d.split()
        s = {
            " ".join(ws[j : j + SHINGLE_K])
            for j in range(len(ws) - (SHINGLE_K - 1))
        }
        if s:
            sets[i] = s
    out: dict[tuple[int, int], float] = {}
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            c = len(sets[a] & sets[b])
            if c == 0:
                continue
            jac = c / (len(sets[a]) + len(sets[b]) - c)
            if jac >= t:
                out[(a, b)] = jac
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=corpus_and_threshold())
def test_prefix_filter_loses_no_pair(spark, data):
    docs, t = data
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], ["doc_id", "text"]
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, "doc_id", "text", t).collect()
    }
    release_caches()
    want = brute_force_pairs(docs, t)
    assert set(got) == set(want), (
        f"pair sets differ at t={t}: "
        f"missing={set(want) - set(got)} extra={set(got) - set(want)}"
    )
    for pair, jac in want.items():
        assert abs(got[pair] - jac) < 2e-6, (pair, got[pair], jac)
