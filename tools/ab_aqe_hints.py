"""VERDICT r9 ask #5 / r10 ask #7: per-operator AQE hints, measured.

For the two families the r9 sf1 A/B flagged — the CC/cluster family
(AQE ON wins: per-round re-planning benefits from coalescing) and the
staged inverted-index pipeline family (AQE OFF wins: per-stage
re-planning with nothing to coalesce) — time each query under global
AQE off and on, interleaved min-of-N in ONE process window, at a real
scale (default sf3). The "hinted" total is then composable from the
per-query winners; the acceptance bar is hinted < min(global_on_total,
global_off_total) on the union.

Usage: python tools/ab_aqe_hints.py [sf_dir] [reps] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "32")
os.environ.setdefault("SPARK_GRAFT_AQE", "false")

import bench
from one_stop_cdc_ingestion_toolkit_spark.operators import load_all, release_caches
from one_stop_cdc_ingestion_toolkit_spark.session import get_session

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf3"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
NAMES = sys.argv[3:] or [
    "d96_dup_clusters",
    "a141_cluster_retention",
    "a038_semantic_clusters",
    "q44_ngram_jaccard_dups",
]


def main() -> int:
    spread0 = bench._host_spread()
    spark = get_session("ab-aqe")
    reg = load_all()
    # warm
    reg[NAMES[0]].fn(spark, SF_DIR).collect()
    release_caches()
    best: dict[str, dict[str, float]] = {n: {} for n in NAMES}
    for _ in range(REPS):
        for mode in ("false", "true"):
            spark.conf.set("spark.sql.adaptive.enabled", mode)
            for n in NAMES:
                spark.sparkContext.setJobDescription(f"aqe:{mode}:{n}")
                t0 = time.time()
                reg[n].fn(spark, SF_DIR).collect()
                dt = time.time() - t0
                best[n][mode] = min(best[n].get(mode, float("inf")), dt)
                release_caches()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spread1 = bench._host_spread()
    rows = {
        n: {
            "aqe_off_s": round(v["false"], 3),
            "aqe_on_s": round(v["true"], 3),
            "winner": "on" if v["true"] < v["false"] else "off",
        }
        for n, v in best.items()
    }
    tot_off = round(sum(v["false"] for v in best.values()), 3)
    tot_on = round(sum(v["true"] for v in best.values()), 3)
    tot_hint = round(sum(min(v.values()) for v in best.values()), 3)
    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "reps": REPS,
                "probes": [spread0, spread1],
                "per_query": rows,
                "total_global_off": tot_off,
                "total_global_on": tot_on,
                "total_hinted": tot_hint,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
