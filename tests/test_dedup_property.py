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


@st.composite
def corpus_with_dups(draw):
    """Random docs from a tiny vocabulary plus FORCED duplicate copies —
    the regime where identical-signature groups actually form."""
    n = draw(st.integers(4, 8))
    docs = []
    for _ in range(n):
        ln = draw(st.integers(SHINGLE_K, 12))
        docs.append(
            " ".join(draw(st.lists(st.sampled_from(WORDS), min_size=ln, max_size=ln)))
        )
    # copy up to n extra docs from the base set (duplicate groups)
    extra = draw(st.lists(st.integers(0, n - 1), min_size=1, max_size=n))
    docs.extend(docs[i] for i in extra)
    return docs


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=corpus_with_dups())
def test_collapsed_minhash_reconstructs_on_random_corpora(spark, docs):
    """minhash_pairs_collapsed must expand to EXACTLY minhash_lsh_pairs'
    pair set on ANY corpus — the planted-corpus equivalence test
    (test_scale_bounds) generalized to random duplicate structure."""
    from one_stop_cdc_ingestion_toolkit_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_pairs_collapsed,
    )

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], ["doc_id", "text"]
    )
    full = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(df, "doc_id", "text").collect()
    }
    release_caches()
    rows = minhash_pairs_collapsed(df, "doc_id", "text").collect()
    release_caches()

    groups: dict[int, set[int]] = {}
    for r in rows:
        if r["rel"] == "member":
            groups.setdefault(r["id_a"], {r["id_a"]}).add(r["id_b"])
    expanded: set[tuple[int, int]] = set()
    for g in groups.values():
        mem = sorted(g)
        for i, x in enumerate(mem):
            for y in mem[i + 1:]:
                expanded.add((x, y))
    for r in rows:
        if r["rel"] != "pair":
            continue
        ga = groups.get(r["id_a"], {r["id_a"]})
        gb = groups.get(r["id_b"], {r["id_b"]})
        assert len(ga) == r["size_a"] and len(gb) == r["size_b"]
        for x in ga:
            for y in gb:
                expanded.add((min(x, y), max(x, y)))
    assert expanded == full, (
        f"missing={full - expanded} extra={expanded - full} docs={docs}"
    )
