"""VERDICT r10 ask #4 evidence: a scaling pair that can actually
separate "parallelizes" from "serial".

Runs a representative query subset at a REAL scale (default sf3) twice
— SPARK_GRAFT_CPUS=32 and =8, each in its own subprocess so the session
master really changes — with SPARK_GRAFT_SHUFFLE left unset, so
session.py sizes shuffle partitions to the core count (the r11 bench.py
posture above sf0.1). Reports per-query low/high walls and the ratio;
parallel scan/shuffle-bound queries should approach the core ratio,
fixed-latency or single-task queries ~1.

Usage: python tools/scaling_pair.py [sf_dir] [reps]
Writes SCALING_r11.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf3"
REPS = sys.argv[2] if len(sys.argv) > 2 else "2"

#: mix: heavy parallel text/gram kernels, CC loops, joins, plus known
#: serial/fixed-latency shapes (single-task recursion, tiny aggs)
QUERIES = [
    "c87_repetition_ratio",
    "a140_dsir_importance",
    "a115_contamination_coverage",
    "c88_decontaminate",
    "a134_novelty_curve",
    "a102_lsh_decontaminate",
    "c91_clean_corpus_stats",
    "a144_cross_contamination",
    "d96_dup_clusters",
    "a141_cluster_retention",
    "a019_countmin_heavy_hitters",
    "a0004_phash_dedup",
    "a0054_jl_distortion",
    "q38_dedup_md5",
    "q29_union_all_reagg",
    # expected-serial / fixed-latency contrast group
    "a036_hierarchy_rollup",
    "b68_geomean_udaf",
    "c83_mix_weights",
    "q01_scan_count",
]

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {here!r})
from one_stop_cdc_ingestion_toolkit_spark.operators import load_all, release_caches
from one_stop_cdc_ingestion_toolkit_spark.session import get_session
spark = get_session("scaling-pair")
reg = load_all()
names = {names!r}
reg[names[0]].fn(spark, {sf!r}).collect(); release_caches()
out = {{}}
for n in names:
    best = float("inf")
    for _ in range({reps}):
        t0 = time.time()
        reg[n].fn(spark, {sf!r}).collect()
        best = min(best, time.time() - t0)
        release_caches()
    out[n] = round(best, 3)
print("RESULT::" + json.dumps(out))
"""


def run(cpus: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env.pop("SPARK_GRAFT_SHUFFLE", None)  # scale-adaptive: session uses cpus
    env.setdefault("SPARK_GRAFT_AQE", "false")
    code = CHILD.format(here=HERE, names=QUERIES, sf=SF_DIR, reps=REPS)
    p = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, env=env
    )
    for line in p.stdout.splitlines():
        if line.startswith("RESULT::"):
            return json.loads(line[len("RESULT::") :])
    raise SystemExit(f"cpus={cpus} run failed:\n{p.stderr[-2000:]}")


def main() -> int:
    sys.path.insert(0, HERE)
    import bench

    spread0 = bench._host_spread()
    hi = run(32)
    mid = bench._host_spread()
    lo = run(8)
    spread1 = bench._host_spread()
    rows = {
        n: {
            "c32_s": hi[n],
            "c8_s": lo[n],
            "ratio_c8_over_c32": round(lo[n] / max(hi[n], 1e-9), 2),
        }
        for n in QUERIES
    }
    out = {
        "sf_dir": SF_DIR,
        "reps": int(REPS),
        "probes": [spread0, mid, spread1],
        "shuffle": "unset (session sizes to core count)",
        "per_query": rows,
        "total_c32": round(sum(hi.values()), 2),
        "total_c8": round(sum(lo.values()), 2),
    }
    with open(os.path.join(HERE, "SCALING_r11.json"), "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
