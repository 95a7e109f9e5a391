"""Quantify a0003's growth floor (judge ask r7 #4): on the fixed-vocab
rehearsal corpus, is the wall-clock growth an algorithmic defect or the
size of the ANSWER itself?

For each corpus size this measures:
- ``wall``        min-of-2 a0003 wall-clock,
- ``qual_pairs``  the total number of qualifying pairs (sum of the
                  output's n_pairs — the quantity the query must count),
- ``coposting``   sum over kept shingles of df² — the exact-counting
                  join's row count,
- ``n_postings``  kept posting rows (the linear term).

The impossibility argument, made quantitative (BASELINE.md appendix):
a0003's threshold is an ABSOLUTE overlap (≥ CL_MIN_SHARED distinct
shared shingles). The overlap prefix filter exists but has length
sz − t + 1 (drops only t−1 = 4 postings per doc) — no asymptotic power,
unlike q44's Jaccard prefix (drops half the doc). On a FIXED-vocabulary
corpus the distinct-shingle universe is bounded, so average df grows
linearly with the corpus and the TRUE ANSWER grows quadratically:
qual_pairs ~ N². Any exact algorithm that produces per-language-pair
counts of qualifying pairs must do Ω(qual_pairs) work absent a closed
form — so demanding ≤2× wall growth for a 2.5× corpus growth while the
output itself grows ~6× is demanding sublinearity in the answer. The
engine's wall already grows SLOWER than qual_pairs (the table this
prints); on realistic growing-vocabulary corpora df stays flat and the
co-posting stream is linear in postings (sum df² ≤ DF_CAP · postings).

Usage: python tools/a0003_floor.py [--sizes 20000,50000]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.gen_scale import write_documents  # noqa: E402


def main() -> None:
    sizes = [20_000, 50_000]
    for a in sys.argv[1:]:
        if a.startswith("--sizes"):
            val = a.split("=", 1)[1] if "=" in a else sys.argv[sys.argv.index(a) + 1]
            sizes = [int(x) for x in val.split(",")]

    os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "32")
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    import __spark_entry__ as entry_mod
    from one_stop_cdc_ingestion_toolkit_spark.operators import release_caches
    from one_stop_cdc_ingestion_toolkit_spark.operators.dedup import (
        NGRAM_DF_CAP,
        hashed_shingles,
    )
    from one_stop_cdc_ingestion_toolkit_spark.session import get_session

    spark = get_session("a0003-floor")
    fn = entry_mod.queries()["a0003_crosslang_dups"]

    dirs = {}
    for n in sizes:
        d = f"/tmp/scale_docs_{n}"
        if not os.path.exists(os.path.join(d, "documents.parquet")):
            write_documents(d, n)
        dirs[n] = d

    fn(spark, dirs[sizes[0]]).collect()  # warm
    release_caches()

    rows = []
    for n in sizes:
        wall = float("inf")
        qual = 0
        for _ in range(2):
            t0 = time.time()
            out = fn(spark, dirs[n]).collect()
            wall = min(wall, time.time() - t0)
            qual = sum(r["n_pairs"] for r in out)
            release_caches()
        docs = spark.read.parquet(f"{dirs[n]}/documents.parquet")
        sh = docs.select(
            "doc_id", F.explode(hashed_shingles(F.col("text"))).alias("s")
        )
        stats = (
            sh.groupBy("s")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= NGRAM_DF_CAP)
            .agg(
                F.sum(F.col("df") * F.col("df")).alias("coposting"),
                F.sum("df").alias("n_postings"),
            )
            .collect()[0]
        )
        rows.append((n, wall, qual, stats["coposting"], stats["n_postings"]))

    print("| docs | wall (s) | qual_pairs | sum(df²) | postings |")
    print("|---|---|---|---|---|")
    for n, wall, qual, cop, post in rows:
        print(f"| {n} | {wall:.2f} | {qual} | {cop} | {post} |")
    if len(rows) >= 2:
        a, b = rows[0], rows[-1]
        print(
            f"growth {b[0] / a[0]:.1f}x docs: wall {b[1] / a[1]:.2f}x, "
            f"qual_pairs {b[2] / max(a[2], 1):.2f}x, "
            f"sum(df²) {b[3] / max(a[3], 1):.2f}x, "
            f"postings {b[4] / max(a[4], 1):.2f}x"
        )


if __name__ == "__main__":
    main()
