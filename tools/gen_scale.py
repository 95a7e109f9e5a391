"""Deterministic large-scale `documents` fixture generator for the scale
rehearsal (VERDICT r4 ask #5).

Produces a documents.parquet shaped like the driver fixtures
(/root/repo/TESTDATA.md: doc_id, text, lang, source, n_chars) at an
arbitrary multiple of sf0.1's 5,000 docs, with the same dedup-relevant
structure the engine's near-dup family exercises:

- ~80% independent word-salad docs over the fixtures' small vocabulary,
- ~8% near-duplicates (a few word substitutions over an earlier doc —
  LSH candidates with Jaccard well above threshold),
- ~4% exact duplicates,
- ~8% span-sharing docs (a long verbatim run copied into fresh salad —
  a138's case).

Written with pyarrow in 5,000-row row groups so the file carries
multiple splits (unlike the single-row-group driver fixtures — see
memory note: single-rowgroup testdata).

Usage: python tools/gen_scale.py OUT_DIR N_DOCS [SEED]
"""

from __future__ import annotations

import os
import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "batch part spark line column order small sort fast value scan hash "
    "slow group agg filter query big key window row table stream merge "
    "data a vector join index plan shuffle stage task broadcast cache "
    "skew limit count"
).split()

LANGS = ("en", "zh", "de", "fr", "es")
SOURCES = tuple(f"src{i}" for i in range(10))


#: One boilerplate template (fixed 40-word VOCAB sequence): ``hot_copies``
#: identical copies model the 100 TB adversarial input — a license header /
#: scraped template whose LSH bucket goes quadratic without star collapse.
HOT_TEXT = " ".join(VOCAB[(i * 7) % len(VOCAB)] for i in range(40))


def gen_documents(
    n_docs: int,
    seed: int = 1_234,
    hot_copies: int = 0,
    vocab: list[str] | None = None,
) -> dict[str, list]:
    """``vocab``: override the fixed 38-word pool — pass a corpus-size-
    scaled vocabulary (scaled_vocab) to model GROWING-vocabulary corpora
    where shingle dfs stay bounded as N grows (judge ask r8->r9 #8); the
    default fixed pool saturates dfs ∝N (BASELINE 200k-decade appendix).
    """
    V = VOCAB if vocab is None else vocab
    rng = random.Random(seed)
    texts: list[str] = []
    for i in range(n_docs):
        kind = rng.random()
        if i > 100 and kind < 0.08:
            # near-duplicate: mutate ~10% of an earlier doc's words
            base = texts[rng.randrange(len(texts))].split()
            for _ in range(max(1, len(base) // 10)):
                base[rng.randrange(len(base))] = rng.choice(V)
            texts.append(" ".join(base))
        elif i > 100 and kind < 0.12:
            # exact duplicate
            texts.append(texts[rng.randrange(len(texts))])
        elif i > 100 and kind < 0.20:
            # span sharer: a 12..25-word verbatim run inside fresh salad
            donor = texts[rng.randrange(len(texts))].split()
            span_len = min(len(donor), rng.randint(12, 25))
            start = rng.randrange(max(1, len(donor) - span_len + 1))
            span = donor[start : start + span_len]
            pre = [rng.choice(V) for _ in range(rng.randint(5, 20))]
            post = [rng.choice(V) for _ in range(rng.randint(5, 20))]
            texts.append(" ".join(pre + span + post))
        else:
            n_words = rng.randint(15, 80)
            texts.append(" ".join(rng.choice(V) for _ in range(n_words)))
    texts.extend(HOT_TEXT for _ in range(hot_copies))
    n_total = n_docs + hot_copies
    return {
        "doc_id": list(range(n_total)),
        "text": texts,
        "lang": [LANGS[rng.randrange(len(LANGS))] for _ in range(n_total)],
        "source": [SOURCES[i % len(SOURCES)] for i in range(n_total)],
        "n_chars": [len(t) for t in texts],
    }


def scaled_vocab(n_docs: int, per_docs: int = 5_000) -> list[str]:
    """A vocabulary that grows with corpus size — len(VOCAB) fresh
    tokens per ``per_docs`` documents, floored at the fixed pool. Keeps
    average shingle df roughly CONSTANT as N grows, the regime real
    scraped corpora live in (new pages bring new names/words), vs the
    fixed pool whose dfs grow ∝N into the saturation floor."""
    mult = max(1, n_docs // per_docs)
    return list(VOCAB) + [f"w{i}" for i in range(len(VOCAB) * (mult - 1))]


def write_documents(
    out_dir: str,
    n_docs: int,
    seed: int = 1_234,
    hot_copies: int = 0,
    vocab: list[str] | None = None,
) -> str:
    os.makedirs(out_dir, exist_ok=True)
    cols = gen_documents(n_docs, seed, hot_copies, vocab=vocab)
    table = pa.table(
        {
            "doc_id": pa.array(cols["doc_id"], pa.int64()),
            "text": pa.array(cols["text"], pa.string()),
            "lang": pa.array(cols["lang"], pa.string()),
            "source": pa.array(cols["source"], pa.string()),
            "n_chars": pa.array(cols["n_chars"], pa.int64()),
        }
    )
    path = os.path.join(out_dir, "documents.parquet")
    pq.write_table(table, path, row_group_size=5_000)
    return path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_sf1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 1_234
    hot = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    p = write_documents(out, n, seed, hot)
    print(f"wrote {n} docs (+{hot} hot copies) -> {p}")
