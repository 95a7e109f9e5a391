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


PAIRS = {
    "c87_repetition_ratio": old_c87,
    "a019_countmin_heavy_hitters": old_a019,
    "a140_dsir_importance": old_a140,
    "a115_contamination_coverage": old_a115,
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
