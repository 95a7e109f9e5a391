"""sf1 rehearsal (judge ask r8→r9 #1): run the compute-bound query
subset (oracle ≥0.3 s in the committed sf0.1 sitting — 39 queries)
PAIRED against DuckDB at sf0.1 AND sf1 of the same generated data
(tools/gen_sf.py), interleaved min-of-N inside ONE process window.

This settles the story that carries ~170 of 207 paired ratios: Spark's
fixed ~0.3–0.6 s scheduling cost per query dominates sub-50 ms oracles
at sf0.1 and should VANISH as data grows. For each query the table
reports engine/oracle/ratio at both scales plus the ratio slope
(ratio_sf1 / ratio_sf0.1): slope < 1 means the engine closes on (or
passes) DuckDB with scale; slope > 1.3 is the fix-or-floor trigger.

Both scales run the SAME generator's data in the SAME sitting, so the
comparison is free of the driver-fixture vs generator distribution
delta AND of cross-window host noise (probes recorded before/between/
after). Shuffle partitions are sized per scale the way the engine
ships: 8 at sf0.1, 32 at sf1 (spark.conf.set between phases); AQE off
per the bench protocol.

Usage:
  python tools/sf1_rehearsal.py [--small DIR] [--big DIR] [--reps 2]
                                [--queries name1,name2]
Defaults: --small /tmp/sfgen01 --big /tmp/sf1 (generate first with
tools/gen_sf.py). Writes SF1_REHEARSAL.json and prints the markdown
table for BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: oracle ≥0.3 s at sf0.1 in the committed r8 sitting (BENCH_LOCAL.json)
QUERIES = (
    "a027_triangle_census",
    "a038_semantic_clusters",
    "d96_dup_clusters",
    "a141_cluster_retention",
    "a020_pagerank_neardup",
    "a003_knn_degree",
    "a0007_jaccard_pairs_collapsed",
    "a0006_minhash_pairs_collapsed",
    "c91_clean_corpus_stats",
    "a0005_kmv_overlap",
    "a004_containment_pairs",
    "q44_ngram_jaccard_dups",
    "q43_minhash_lsh_pairs",
    "a015_kcenter_coreset",
    "a105_est_jaccard_pairs",
    "b55_embedding_neardup",
    "a102_lsh_decontaminate",
    "a002_temperature_sample",
    "a018_coreset_coverage",
    "a014_weighted_sample",
    "a0003_crosslang_dups",
    "a001_simhash_hamming_pairs",
    "a139_lsh_recall_curve",
    "a134_novelty_curve",
    "c88_decontaminate",
    "a144_cross_contamination",
    "c87_repetition_ratio",
    "a138_span_dedup",
    "b45_simhash_buckets",
    "a140_dsir_importance",
    "a115_contamination_coverage",
    "a043_pairwise_auc",
    "a107_hybrid_rrf",
    "a106_bm25_search",
    "a041_quantile_norm_quality",
    "a0004_phash_dedup",
    "b54_ann_lsh_topk",
    "a019_countmin_heavy_hitters",
    "a104_curriculum_buckets",
)

#: per-scale shuffle sizing (the engine's own discipline: partitions
#: sized to data, not cores)
SHUFFLE = {"small": "8", "big": "32"}


def main() -> None:
    small = "/tmp/sfgen01"
    big = "/tmp/sf1"
    reps = 2
    out_name = "SF1_REHEARSAL.json"
    names = list(QUERIES)
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        a = argv[i]
        if "=" in a:
            key, val = a.split("=", 1)
        else:
            if i + 1 >= len(argv):
                sys.exit(f"usage: {a} needs a value")
            key, val = a, argv[i + 1]
            i += 1
        if key == "--small":
            small = val
        elif key == "--big":
            big = val
        elif key == "--reps":
            reps = int(val)
        elif key == "--queries":
            names = val.split(",")
        elif key == "--out":
            # the sf3/sf10 decade sittings (VERDICT r9 ask #1) reuse this
            # harness; a distinct output name keeps each scale's committed
            # artifact instead of clobbering SF1_REHEARSAL.json
            out_name = val
        else:
            sys.exit(f"unknown arg {key}")
        i += 1
    for d in (small, big):
        if not os.path.exists(os.path.join(d, "lineitem.parquet")):
            sys.exit(f"{d} missing — generate with tools/gen_sf.py first")

    os.environ.setdefault("SPARK_GRAFT_SHUFFLE", SHUFFLE["small"])
    os.environ.setdefault("SPARK_GRAFT_AQE", "false")

    import bench  # the host-spread probe

    import __spark_entry__ as entry_mod
    from one_stop_cdc_ingestion_toolkit_spark.operators import release_caches
    from one_stop_cdc_ingestion_toolkit_spark.oracle import duck_connect
    from one_stop_cdc_ingestion_toolkit_spark.session import get_session

    probes = [bench._host_spread()]
    spark = get_session("sf1-rehearsal")
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    missing = [n for n in names if n not in qs or n not in oracles]
    if missing:
        sys.exit(f"unknown queries: {missing}")

    cons = {"small": duck_connect(small), "big": duck_connect(big)}
    dirs = {"small": small, "big": big}
    # warm both catalogs + the JVM once
    for scale in ("small", "big"):
        qs[names[0]](spark, dirs[scale]).count()
        release_caches()

    results: dict[str, dict] = {}
    t_start = time.time()
    for qi, name in enumerate(names):
        row: dict = {}
        for scale in ("small", "big"):
            spark.conf.set("spark.sql.shuffle.partitions", SHUFFLE[scale])
            eng = ora = float("inf")
            err = None
            try:
                for _ in range(reps):
                    t0 = time.time()
                    qs[name](spark, dirs[scale]).collect()
                    eng = min(eng, time.time() - t0)
                    release_caches()
                    if ora == float("inf") or ora <= 10.0:
                        t0 = time.time()
                        cons[scale].execute(oracles[name]).fetchall()
                        ora = min(ora, time.time() - t0)
            except Exception as exc:  # noqa: BLE001 — record, keep going
                err = f"{type(exc).__name__}: {exc}"[:200]
                release_caches()
            row[scale] = {
                "engine_s": round(eng, 3) if eng < float("inf") else None,
                "oracle_s": round(ora, 3) if ora < float("inf") else None,
                "ratio": (
                    round(eng / max(ora, 1e-4), 2)
                    if eng < float("inf") and ora < float("inf")
                    else None
                ),
                **({"err": err} if err else {}),
            }
        results[name] = row
        print(
            f"[{qi + 1}/{len(names)}] {name}: "
            f"sf0.1 {row['small']['engine_s']}/{row['small']['oracle_s']} "
            f"-> sf1 {row['big']['engine_s']}/{row['big']['oracle_s']}",
            file=sys.stderr,
        )
        if qi == len(names) // 2:
            probes.append(bench._host_spread())
    probes.append(bench._host_spread())

    def tot(scale, side):
        return round(
            sum(
                r[scale][side]
                for r in results.values()
                if r[scale].get(side) is not None
            ),
            2,
        )

    out = {
        "queries": results,
        "probes": probes,
        "reps": reps,
        "wall_s": round(time.time() - t_start, 1),
        "totals": {
            s: {
                "engine_s": tot(s, "engine_s"),
                "oracle_s": tot(s, "oracle_s"),
            }
            for s in ("small", "big")
        },
    }
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, out_name), "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")

    print("| query | sf0.1 eng/ora (ratio) | sf1 eng/ora (ratio) | slope |")
    print("|---|---|---|---|")

    def slope(r):
        a, b = r["small"].get("ratio"), r["big"].get("ratio")
        return round(b / a, 2) if a and b else None

    for name in sorted(results, key=lambda n: -(slope(results[n]) or 0)):
        r = results[name]
        s, b = r["small"], r["big"]
        print(
            f"| {name} | {s['engine_s']}/{s['oracle_s']} ({s['ratio']}) "
            f"| {b['engine_s']}/{b['oracle_s']} ({b['ratio']}) "
            f"| {slope(r)} |"
        )
    print(f"\nprobes: {probes}  totals: {out['totals']}")


if __name__ == "__main__":
    main()
