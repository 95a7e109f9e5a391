"""Interleaved A/B: per-pair ``cosine()`` vs the r8 norm hoist.

Rebuilds the OLD (pre-hoist) plan inline for each consumer — the old code
was exactly ``cosine(a, b)`` inside the pair projection/filter — and runs
old/new alternately in ONE process (min-of-N), the only comparison that is
valid on this steal-prone host (see BENCH protocol).

Usage: python3 tools/ab_norm_hoist.py [sf_dir] [repeats]
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from one_stop_cdc_ingestion_toolkit_spark.catalog import tables
from one_stop_cdc_ingestion_toolkit_spark.operators import (
    REGISTRY,
    release_caches,
    track_cache,
)
from one_stop_cdc_ingestion_toolkit_spark.operators.similarity import (
    cosine,
    lsh_signature,
)
from one_stop_cdc_ingestion_toolkit_spark.session import get_session

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def old_q46(spark, sf_dir):
    emb = tables(spark, sf_dir)["embeddings"]
    qs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    cs = emb.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    joined = cs.crossJoin(F.broadcast(qs)).withColumn(
        "__cos", cosine(F.col("q_vec"), F.col("c_vec"))
    )
    w = W.partitionBy("q_id").orderBy(F.col("__cos").desc(), F.col("c_id"))
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("q_id", "c_id", F.round("__cos", 6).alias("sim"), "rn")
        .orderBy("q_id", "rn")
    )


def old_b55(spark, sf_dir):
    emb = tables(spark, sf_dir)["embeddings"]
    sig = track_cache(
        emb.select("vec_id", "embedding", lsh_signature(F.col("embedding")).alias("s"))
    )
    a = sig.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"), "s")
    b = sig.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"), "s")
    out = (
        a.join(b, "s")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("__cos", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("__cos") >= 0.3)
        .select("id_a", "id_b", F.round("__cos", 6).alias("sim"))
        .orderBy("id_a", "id_b")
    )
    return out


def old_a0056(spark, sf_dir):
    from one_stop_cdc_ingestion_toolkit_spark.operators.round4c import (
        HN_QUERIES,
        HN_TOPK,
    )

    emb = tables(spark, sf_dir)["embeddings"]
    qs = emb.filter(F.col("vec_id") < HN_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_vec"),
        F.col("label").alias("q_label"),
    )
    scored = (
        emb.crossJoin(F.broadcast(qs))
        .filter(F.col("label") != F.col("q_label"))
        .select(
            "q_id",
            F.col("vec_id").alias("c_id"),
            cosine(F.col("q_vec"), F.col("embedding")).alias("cos"),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("c_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= HN_TOPK)
        .select("q_id", "c_id", F.round("cos", 6).alias("sim"), "rn")
        .orderBy("q_id", "rn")
    )


def old_a110(spark, sf_dir):
    from one_stop_cdc_ingestion_toolkit_spark.operators.mlprep import label_centroids

    emb = tables(spark, sf_dir)["embeddings"]
    cent = label_centroids(emb).select(F.col("label").alias("c_label"), "cent_vec")
    scored = emb.crossJoin(F.broadcast(cent)).withColumn(
        "cos", cosine(F.col("embedding"), F.col("cent_vec"))
    )
    pred = scored.groupBy("vec_id", "label").agg(
        F.max_by(
            "c_label", F.struct(F.col("cos"), (-F.col("c_label")).alias("nl"))
        ).alias("pred")
    )
    return (
        pred.groupBy("label", "pred")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("label", "pred")
    )


def old_a0052(spark, sf_dir):
    from one_stop_cdc_ingestion_toolkit_spark.operators.quantization import (
        MK_QUERIES,
        MK_TOPK,
        PREFIX_DIM,
    )

    emb = tables(spark, sf_dir)["embeddings"]
    qs = emb.filter(F.col("vec_id") < MK_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    scored = (
        emb.crossJoin(F.broadcast(qs))
        .withColumn("cf", cosine(F.col("q_vec"), F.col("embedding")))
        .withColumn(
            "ct",
            cosine(
                F.slice(F.col("q_vec"), 1, PREFIX_DIM),
                F.slice(F.col("embedding"), 1, PREFIX_DIM),
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


PAIRS = [
    ("q46_cosine_topk", old_q46),
    ("b55_embedding_neardup", old_b55),
    ("a0056_hard_negatives", old_a0056),
    ("a110_centroid_classify", old_a110),
    ("a0052_matryoshka_recall", old_a0052),
]


def run(fn, spark):
    t = time.monotonic()
    fn(spark, SF_DIR).collect()
    release_caches()
    return time.monotonic() - t


def main():
    from one_stop_cdc_ingestion_toolkit_spark.operators import load_all

    load_all()
    spark = get_session()
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    for name, old_fn in PAIRS:
        new_fn = REGISTRY[name].fn
        # warm both once (scan cache, codegen), then interleave
        run(old_fn, spark)
        run(new_fn, spark)
        olds, news = [], []
        for _ in range(REPS):
            olds.append(run(old_fn, spark))
            news.append(run(new_fn, spark))
        results[name] = (min(olds), min(news))
        print(
            f"{name}: old {min(olds):.2f}s new {min(news):.2f}s "
            f"speedup {min(olds) / min(news):.2f}x "
            f"(old {['%.2f' % x for x in olds]} new {['%.2f' % x for x in news]})",
            flush=True,
        )
    tot_o = sum(o for o, _ in results.values())
    tot_n = sum(n for _, n in results.values())
    print(f"TOTAL old {tot_o:.2f}s new {tot_n:.2f}s speedup {tot_o / tot_n:.2f}x")


if __name__ == "__main__":
    main()
