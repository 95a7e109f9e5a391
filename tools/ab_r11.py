"""Round-11 interleaved A/Bs: old shapes rebuilt inline vs the shipped
rewrites, alternated in ONE process window (min-of-N) with collected-row
equality asserted — the only comparison valid on this steal-prone host
(BENCH protocol / OPTIMIZATION_r10.md methodology).

Covered pairs:
- c87_repetition_ratio: r10 explode + two hash aggs  vs  r11 in-row
  Arrow bigram kernel (_bigram_stats_batches).
- a019_countmin_heavy_hitters: r8 two-scan corpus explode counters vs
  r11 counters derived from the per-user truth counts.
- a140_dsir_importance: current registry shape vs candidate (see
  old_a140 note) — only wired when a candidate ships.

Usage: python tools/ab_r11.py [sf_dir] [reps] [pair ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import bench
from one_stop_cdc_ingestion_toolkit_spark.catalog import tables
from one_stop_cdc_ingestion_toolkit_spark.operators import (
    REGISTRY,
    load_all,
    release_caches,
    track_cache,
    widen_narrow_scan,
)
from one_stop_cdc_ingestion_toolkit_spark.session import get_session

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
ONLY = set(sys.argv[3:])


def old_c87(spark, sf_dir):
    """r10 shape: explode every bigram, two doc-keyed hash aggregations."""
    from one_stop_cdc_ingestion_toolkit_spark.operators.dedup import word_shingles

    d = widen_narrow_scan(tables(spark, sf_dir)["documents"])
    bg = d.select(
        "doc_id",
        F.explode(word_shingles(F.col("text"), k=2)).alias("bigram"),
    )
    counts = bg.groupBy("doc_id", "bigram").agg(F.count(F.lit(1)).alias("c"))
    return (
        counts.groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_bigrams"),
            (F.max("c").cast("double") / F.sum("c")).alias("rep_ratio"),
        )
        .orderBy("doc_id")
    )


def old_a019(spark, sf_dir):
    """r8 shape: counters from a CMS_D-way explode of the raw event
    stream (second corpus scan for truth)."""
    from one_stop_cdc_ingestion_toolkit_spark.operators.experiments import (
        CMS_D,
        CMS_TOPK,
        CMS_W,
    )

    ev = tables(spark, sf_dir)["events"]

    def rb_explode(df):
        return df.select(
            "*",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).alias("r"),
                            (
                                F.conv(
                                    F.substring(
                                        F.md5(
                                            F.concat_ws(
                                                ":",
                                                F.lit(str(r)),
                                                F.col("user_id").cast("string"),
                                            )
                                        ),
                                        1,
                                        8,
                                    ),
                                    16,
                                    10,
                                ).cast("long")
                                % CMS_W
                            ).alias("bucket"),
                        )
                        for r in range(CMS_D)
                    ]
                )
            ).alias("rb"),
        ).select(*df.columns, "rb.r", "rb.bucket")

    counters = track_cache(
        rb_explode(ev.select("user_id"))
        .groupBy("r", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    truth = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_n"))
    top = truth.orderBy(F.col("true_n").desc(), "user_id").limit(CMS_TOPK)
    est = (
        rb_explode(top)
        .join(F.broadcast(counters), ["r", "bucket"])
        .groupBy("user_id", "true_n")
        .agg(F.min("c").alias("est_n"))
    )
    tot = counters.filter(F.col("r") == 0).agg(F.sum("c").alias("n"))
    bound = F.ceil(F.lit(2.718282 / CMS_W) * F.col("n")).cast("long")
    return (
        est.crossJoin(F.broadcast(tot))
        .select(
            "user_id",
            "true_n",
            "est_n",
            (F.col("est_n") >= F.col("true_n")).alias("never_underestimates"),
            ((F.col("est_n") - F.col("true_n")) <= bound).alias("within_eps"),
        )
        .orderBy(F.col("true_n").desc(), "user_id")
    )


def old_a140(spark, sf_dir):
    """r10 shape: cached word-row explode, per-occurrence md5, 27M-row
    broadcast-join + doc-keyed agg."""
    from one_stop_cdc_ingestion_toolkit_spark.operators.selection import (
        DSIR_BUCKETS,
        DSIR_TARGET_LANG,
        _bucket,
        _word_rows,
    )

    d = tables(spark, sf_dir)["documents"]
    wn = track_cache(
        _word_rows(d, "doc_id", "source", "lang").withColumn(
            "b", _bucket(F.col("word"), DSIR_BUCKETS)
        )
    )
    counts = wn.groupBy("b").agg(
        F.count(F.lit(1)).alias("r"),
        F.sum(
            F.when(F.col("lang") == DSIR_TARGET_LANG, 1).otherwise(0)
        ).alias("t"),
    )
    tot = counts.agg(F.sum("r").alias("rt"), F.sum("t").alias("tt"))
    lam = (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "b",
            F.log(
                ((F.col("t") + 1).cast("double")
                 * (F.col("rt") + DSIR_BUCKETS).cast("double"))
                / ((F.col("r") + 1).cast("double")
                   * (F.col("tt") + DSIR_BUCKETS).cast("double"))
            ).alias("lam"),
        )
    )
    dw = (
        wn.join(F.broadcast(lam), "b")
        .groupBy("doc_id")
        .agg(F.min("source").alias("source"), F.sum("lam").alias("w"))
    )
    return (
        dw.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("w"), 4).alias("avg_logratio"),
            F.sum(F.when(F.col("w") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_target_like"),
        )
        .orderBy("source")
    )


def old_a115(spark, sf_dir):
    """r10 shape: corpus-side JVM hashed_shingles explode feeding a
    broadcast LeftSemi against the eval gram-hash set."""
    from one_stop_cdc_ingestion_toolkit_spark.operators.dedup import hashed_shingles
    from one_stop_cdc_ingestion_toolkit_spark.operators.mlprep import COVERAGE_K

    d = tables(spark, sf_dir)["documents"]
    eval_grams = (
        d.filter(F.col("doc_id") < 5)
        .select(F.explode(hashed_shingles(F.col("text"), k=COVERAGE_K)).alias("g"))
        .distinct()
    )
    corpus = (
        widen_narrow_scan(d)
        .filter(F.col("doc_id") >= 5)
        .select(F.explode(hashed_shingles(F.col("text"), k=COVERAGE_K)).alias("g"))
    )
    found = corpus.join(F.broadcast(eval_grams), "g", "left_semi").distinct()
    n_eval = eval_grams.agg(F.count(F.lit(1)).alias("n_eval_grams"))
    n_found = found.agg(F.count(F.lit(1)).alias("n_found"))
    return n_eval.crossJoin(n_found).select(
        "n_eval_grams",
        "n_found",
        F.round(F.col("n_found").cast("double") / F.col("n_eval_grams"), 4).alias(
            "coverage"
        ),
    )


def old_a0004(spark, sf_dir):
    """r10 kernel: per-row ord() prep, per-row bit packing (runs on the
    current png codec — the type-0 filter fast path is measured
    separately by the committed microbench)."""
    from one_stop_cdc_ingestion_toolkit_spark.operators.round5 import (
        PHASH_PIXELS,
        PNG_H,
        PNG_W,
    )

    d = tables(spark, sf_dir)["documents"]
    n_bytes = PHASH_PIXELS * 3
    src = widen_narrow_scan(
        d.select("doc_id", F.substring("text", 1, n_bytes).alias("t"))
    )

    def batches(it):
        import numpy as np
        import pandas as pd

        from one_stop_cdc_ingestion_toolkit_spark.functions import png_codec

        weights = (np.int64(1) << np.arange(PHASH_PIXELS, dtype=np.int64))
        for pdf in it:
            ids, hs = [], []
            for i, t in zip(pdf["doc_id"], pdf["t"]):
                pixels = bytes(min(ord(c), 255) for c in t[:n_bytes]).ljust(
                    n_bytes, b"\0"
                )
                img = png_codec.decode_png(
                    png_codec.encode_png(pixels, PNG_W, PNG_H, 3)
                )
                arr = np.frombuffer(bytes(img.pixels), dtype=np.uint8)
                gray = arr.reshape(PHASH_PIXELS, 3).astype(np.int64).sum(axis=1) // 3
                bits = PHASH_PIXELS * gray > gray.sum()
                ids.append(i)
                hs.append(int(weights[bits].sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "phash": pd.Series(hs, dtype="int64"),
                }
            )

    hashed = src.mapInPandas(batches, "doc_id long, phash long")
    return (
        hashed.groupBy("phash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy("phash")
    )


def old_b55(spark, sf_dir):
    """r10 shape: signature self-join streaming every candidate pair
    through an interpreted HOF dot fold."""
    from one_stop_cdc_ingestion_toolkit_spark.operators.similarity import (
        cosine_hoisted,
        lsh_signature,
        norm,
    )

    emb = tables(spark, sf_dir)["embeddings"]
    sig = track_cache(
        emb.select(
            "vec_id",
            "embedding",
            lsh_signature(F.col("embedding")).alias("s"),
            norm(F.col("embedding")).alias("nrm"),
        )
    )
    a = sig.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("va"),
        "s",
        F.col("nrm").alias("na"),
    )
    b = sig.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("vb"),
        "s",
        F.col("nrm").alias("nb"),
    )
    return (
        a.join(b, "s")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "__cos",
            cosine_hoisted(F.col("va"), F.col("vb"), F.col("na"), F.col("nb")),
        )
        .filter(F.col("__cos") >= 0.3)
        .select("id_a", "id_b", F.round("__cos", 6).alias("sim"))
        .orderBy("id_a", "id_b")
    )


def old_a0054(spark, sf_dir):
    """r10 shape: signature self-join, two interpreted dot folds per
    pair, per-pair ratio rows into a Spark histogram."""
    from one_stop_cdc_ingestion_toolkit_spark.operators.quantization import (
        dot,
        jl_project,
    )
    from one_stop_cdc_ingestion_toolkit_spark.operators.similarity import (
        lsh_signature,
    )

    emb = tables(spark, sf_dir)["embeddings"]
    sig = emb.withColumn("proj", jl_project(F.col("embedding"))).select(
        "vec_id",
        "embedding",
        lsh_signature(F.col("embedding")).alias("s"),
        "proj",
        dot(F.col("embedding"), F.col("embedding")).alias("n64"),
        dot(F.col("proj"), F.col("proj")).alias("n16"),
    )
    a = sig.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("ea"),
        F.col("proj").alias("pa"),
        F.col("n64").alias("na64"),
        F.col("n16").alias("na16"),
        "s",
    )
    b = sig.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("eb"),
        F.col("proj").alias("pb"),
        F.col("n64").alias("nb64"),
        F.col("n16").alias("nb16"),
        "s",
    )
    pairs = (
        a.join(b, "s")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            F.sqrt(
                F.greatest(
                    F.col("na64")
                    + F.col("nb64")
                    - F.lit(2.0) * dot(F.col("ea"), F.col("eb")),
                    F.lit(0.0),
                )
            ).alias("d64"),
            F.sqrt(
                F.greatest(
                    F.col("na16")
                    + F.col("nb16")
                    - F.lit(2.0) * dot(F.col("pa"), F.col("pb")),
                    F.lit(0.0),
                )
            ).alias("d16"),
        )
        .filter(F.col("d64") > 0)
        .select((F.col("d16") / F.col("d64")).alias("ratio"))
    )
    return (
        pairs.groupBy(
            (F.floor(F.col("ratio") * 10) / 10.0).alias("ratio_bin")
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("ratio_bin")
    )


def old_a0052(spark, sf_dir):
    """r10 shape: broadcast-queries x corpus join, 2*MK_QUERIES
    interpreted cosine folds per corpus row."""
    from one_stop_cdc_ingestion_toolkit_spark.operators.quantization import (
        MK_QUERIES,
        MK_TOPK,
        PREFIX_DIM,
    )
    from one_stop_cdc_ingestion_toolkit_spark.operators.similarity import (
        cosine_hoisted,
        norm,
    )
    from pyspark.sql.window import Window as W

    emb = tables(spark, sf_dir)["embeddings"]
    qs = (
        emb.filter(F.col("vec_id") < MK_QUERIES)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
        .withColumn("__qnf", norm(F.col("q_vec")))
        .withColumn("__qnt", norm(F.slice(F.col("q_vec"), 1, PREFIX_DIM)))
    )
    cs = emb.withColumn("__cnf", norm(F.col("embedding"))).withColumn(
        "__cnt", norm(F.slice(F.col("embedding"), 1, PREFIX_DIM))
    )
    scored = (
        cs.crossJoin(F.broadcast(qs))
        .withColumn(
            "cf",
            cosine_hoisted(
                F.col("q_vec"), F.col("embedding"), F.col("__qnf"), F.col("__cnf")
            ),
        )
        .withColumn(
            "ct",
            cosine_hoisted(
                F.slice(F.col("q_vec"), 1, PREFIX_DIM),
                F.slice(F.col("embedding"), 1, PREFIX_DIM),
                F.col("__qnt"),
                F.col("__cnt"),
            ),
        )
        .select("q_id", F.col("vec_id").alias("c_id"), "cf", "ct")
    )
    wf = W.partitionBy("q_id").orderBy(F.col("cf").desc(), F.col("c_id"))
    wt = W.partitionBy("q_id").orderBy(F.col("ct").desc(), F.col("c_id"))
    return (
        scored.withColumn("rf", F.row_number().over(wf))
        .withColumn("rt", F.row_number().over(wt))
        .filter((F.col("rf") <= MK_TOPK) & (F.col("rt") <= MK_TOPK))
        .groupBy("q_id")
        .agg(
            F.count(F.lit(1)).alias("n_overlap"),
            F.round(F.count(F.lit(1)) / MK_TOPK, 2).alias("recall"),
        )
        .orderBy("q_id")
    )


PAIRS = {
    "c87_repetition_ratio": old_c87,
    "a019_countmin_heavy_hitters": old_a019,
    "a140_dsir_importance": old_a140,
    "a115_contamination_coverage": old_a115,
    "a0004_phash_dedup": old_a0004,
    "b55_embedding_neardup": old_b55,
    "a0054_jl_distortion": old_a0054,
    "a0052_matryoshka_recall": old_a0052,
}


def main() -> int:
    load_all()
    pairs = {
        n: old for n, old in PAIRS.items() if not ONLY or n in ONLY
    }
    spread0 = bench._host_spread()
    spark = get_session("ab-r11")
    out = {}
    for name, old_fn in pairs.items():
        new_fn = REGISTRY[name].fn
        # warm both plans + assert row equality once
        rows_old = [tuple(r) for r in old_fn(spark, SF_DIR).collect()]
        release_caches()
        rows_new = [tuple(r) for r in new_fn(spark, SF_DIR).collect()]
        release_caches()
        equal = rows_old == rows_new
        best = {"old": float("inf"), "new": float("inf")}
        for _ in range(REPS):
            for tag, fn in (("old", old_fn), ("new", new_fn)):
                spark.sparkContext.setJobDescription(f"ab:{name}:{tag}")
                t0 = time.time()
                fn(spark, SF_DIR).collect()
                best[tag] = min(best[tag], time.time() - t0)
                release_caches()
        out[name] = {
            "rows_equal": equal,
            "n_rows": len(rows_new),
            "old_s": round(best["old"], 3),
            "new_s": round(best["new"], 3),
            "speedup": round(best["old"] / max(best["new"], 1e-9), 2),
        }
        print(json.dumps({name: out[name]}), flush=True)
    spread1 = bench._host_spread()
    print(
        json.dumps(
            {"sf_dir": SF_DIR, "reps": REPS, "probes": [spread0, spread1], "results": out}
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
