"""Stage-level decomposition of the canonical weak four (judge ask
r8→r9 #2): a138_span_dedup, a107_hybrid_rrf, c88_decontaminate,
a106_bm25_search — the compute-bound entries that have carried "fixed
stage cost" verdicts since r6 without a stage-level proof.

Each query is split into its named pipeline stages (reconstructed from
the same module primitives the operator composes), and all stages of
all four queries are timed INTERLEAVED min-of-N in one process window —
the bench protocol's answer to host steal. Stages nest (each adds one
pipeline step), so "where does every 0.5 s go" reads off the deltas
between consecutive stages; the full registered query runs last as the
total. Prints a markdown table for BASELINE.md.

Usage: python tools/weak4_stages.py [--sf-dir /root/testdata/sf0.1]
                                    [--reps 3]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "8")
os.environ.setdefault("SPARK_GRAFT_AQE", "false")

from pyspark.sql import functions as F  # noqa: E402


def build_stages(spark, sf_dir):
    """{query: [(stage_label, thunk_returning_df)]} — thunks rebuild
    the DataFrame each call so caches don't leak between reps."""
    from one_stop_cdc_ingestion_toolkit_spark.catalog import tables
    from one_stop_cdc_ingestion_toolkit_spark.operators import (
        load_all,
        widen_narrow_scan,
    )
    from one_stop_cdc_ingestion_toolkit_spark.operators.dedup import (
        band_pairs,
        hashed_shingles,
        minhash_band_rows,
        word_shingles,
    )
    reg = load_all()
    cat = tables(spark, sf_dir)
    d = cat["documents"]
    emb = cat["embeddings"]

    from one_stop_cdc_ingestion_toolkit_spark.operators import retrieval as R
    from one_stop_cdc_ingestion_toolkit_spark.operators.pipeline_ops import (
        DECONTAM_K,
    )
    from one_stop_cdc_ingestion_toolkit_spark.operators.similarity import (
        cosine_hoisted,
        norm,
    )

    def bm25_scan():
        # the tokenize + per-term tf projection, no aggregation
        words = R.tokenize(F.col("text"))
        return d.select(
            "doc_id",
            F.size(words).alias("dl"),
            *[
                F.size(F.filter(words, lambda x: x == F.lit(t))).alias(f"tf{i}")  # noqa: B023
                for i, t in enumerate(R.QUERY_TERMS)
            ],
        )

    def bm25_stats():
        return bm25_scan().agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
            *[
                F.sum(F.when(F.col(f"tf{i}") > 0, 1).otherwise(0)).alias(f"df{i}")
                for i in range(len(R.QUERY_TERMS))
            ],
        )

    def bm25_scored():
        return R._bm25_scores(d)

    def vs_leg():
        qv = emb.filter(F.col("vec_id") == R.QUERY_VEC_ID).select(
            F.col("embedding").alias("q_vec"),
            norm(F.col("embedding")).alias("__qn"),
        )
        return (
            emb.withColumn("__cn", norm(F.col("embedding")))
            .crossJoin(F.broadcast(qv))
            .withColumn(
                "cos",
                cosine_hoisted(
                    F.col("embedding"),
                    F.col("q_vec"),
                    F.col("__cn"),
                    F.col("__qn"),
                ),
            )
            .orderBy(F.desc("cos"), "vec_id")
            .limit(R.LIST_K)
        )

    def c88_grams():
        return d.select(
            "doc_id",
            F.explode(hashed_shingles(F.col("text"), k=DECONTAM_K)).alias("g"),
        )

    def c88_eval():
        return c88_grams().filter(F.col("doc_id") < 5).select("g").distinct()

    def a138_pairs():
        return band_pairs(minhash_band_rows(d, "doc_id", "text"))

    def a138_shingles():
        pairs = a138_pairs()
        cand_ids = (
            pairs.select(F.col("id_a").alias("doc_id"))
            .union(pairs.select(F.col("id_b").alias("doc_id")))
            .distinct()
        )
        dd = widen_narrow_scan(d.join(F.broadcast(cand_ids), "doc_id"))
        return dd.select(
            F.col("doc_id"),
            F.posexplode(word_shingles(F.col("text"))).alias("pos0", "g"),
        ).select(
            "doc_id",
            (F.col("pos0") + 1).alias("pos"),
            F.xxhash64("g").alias("gram"),
        )

    return {
        "a106_bm25_search": [
            ("scan+tokenize+tf", bm25_scan),
            ("corpus stats agg (1 row)", bm25_stats),
            ("scored (scan x2 + bcast)", bm25_scored),
            ("FULL (top-k + rank)", lambda: reg["a106_bm25_search"].fn(spark, sf_dir)),
        ],
        "a107_hybrid_rrf": [
            ("bm25 leg top-50", lambda: bm25_scored().orderBy(F.desc("score"), "doc_id").limit(R.LIST_K)),
            ("cosine leg top-50", vs_leg),
            ("FULL (union+window+agg)", lambda: reg["a107_hybrid_rrf"].fn(spark, sf_dir)),
        ],
        "c88_decontaminate": [
            ("gram explode scan", c88_grams),
            ("eval distinct (bcast side)", c88_eval),
            ("FULL (semi-join + agg)", lambda: reg["c88_decontaminate"].fn(spark, sf_dir)),
        ],
        "a138_span_dedup": [
            ("minhash bands + pairs", a138_pairs),
            ("cand filter + pos shingles", a138_shingles),
            ("FULL (gram join + islands)", lambda: reg["a138_span_dedup"].fn(spark, sf_dir)),
        ],
    }


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    reps = 3
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        if argv[i] == "--sf-dir":
            sf_dir = argv[i + 1]
            i += 2
        elif argv[i] == "--reps":
            reps = int(argv[i + 1])
            i += 2
        else:
            sys.exit(f"unknown arg {argv[i]}")

    import bench

    from one_stop_cdc_ingestion_toolkit_spark.operators import release_caches
    from one_stop_cdc_ingestion_toolkit_spark.oracle import duck_connect
    from one_stop_cdc_ingestion_toolkit_spark.session import get_session

    import __spark_entry__ as entry_mod

    probes = [bench._host_spread()]
    spark = get_session("weak4")
    stages = build_stages(spark, sf_dir)
    oracles = entry_mod.oracle_sql()
    con = duck_connect(sf_dir)

    # warm
    next(iter(stages.values()))[0][1]().collect()
    release_caches()

    best: dict[tuple[str, str], float] = {}
    obest: dict[str, float] = {}
    for _ in range(reps):
        for qname, qstages in stages.items():
            for label, thunk in qstages:
                t0 = time.time()
                # intermediate stages run a noop-sink write (outputs can
                # be data-sized gram streams — compute, not fetch; and
                # count() would let ColumnPruning skip projection-only
                # work entirely, undermeasuring scan stages); the FULL
                # query collect()s like bench.py so totals line up
                df = thunk()
                if label.startswith("FULL"):
                    df.collect()
                else:
                    df.write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                key = (qname, label)
                best[key] = min(best.get(key, 9e9), dt)
                release_caches()
            t0 = time.time()
            con.execute(oracles[qname]).fetchall()
            obest[qname] = min(obest.get(qname, 9e9), time.time() - t0)
    probes.append(bench._host_spread())

    print(f"probes: {probes}  reps: {reps}  sf_dir: {sf_dir}\n")
    print("| query | stage | cumulative s | delta s |")
    print("|---|---|---|---|")
    for qname, qstages in stages.items():
        prev = 0.0
        for label, _ in qstages:
            t = best[(qname, label)]
            print(f"| {qname} | {label} | {t:.3f} | {t - prev:+.3f} |")
            prev = t
        print(f"| {qname} | _DuckDB oracle_ | {obest[qname]:.3f} | |")


if __name__ == "__main__":
    main()
