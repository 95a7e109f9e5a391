"""VERDICT r10 ask #5: validate the CC loop's "message join is
exchange-free" claim AT SCALE with AQE ON.

Reconstructs exactly one pointer-jumping round the way
connected_components builds it (advanced.py) on d96's sf10 pair graph,
captures ``explain("formatted")`` of the round frame, and reports
whether any Exchange sits between the cached edge frame and the message
join (AQE can in principle re-partition or invalidate the elided sort).
Also times d96 + a141 end-to-end with AQE on vs off, interleaved in one
window (the rehearsal files only carry AQE-off rows).

Usage: SPARK_GRAFT_AQE=true python tools/cc_plan_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "32")
os.environ.setdefault("SPARK_GRAFT_AQE", "true")

from pyspark.sql import functions as F

import bench
from one_stop_cdc_ingestion_toolkit_spark.catalog import tables
from one_stop_cdc_ingestion_toolkit_spark.operators import (
    release_caches,
    track_cache,
    track_local_checkpoint,
)
from one_stop_cdc_ingestion_toolkit_spark.operators.dedup import minhash_cc_edges
from one_stop_cdc_ingestion_toolkit_spark.session import get_session

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"


def main() -> int:
    spread0 = bench._host_spread()
    spark = get_session("cc-plan-probe")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    d = tables(spark, SF_DIR)["documents"]
    pairs = minhash_cc_edges(d, "doc_id", "text")

    # === one round, built exactly like connected_components ===
    fwd = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    edges = track_cache(
        fwd.unionByName(
            pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        ).repartition("src").sortWithinPartitions("src")
    )
    ck = track_local_checkpoint(
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("comp"))
    )
    labels = ck
    msgs = edges.join(labels, edges["src"] == labels["node"]).select(
        F.col("dst").alias("node"),
        F.col("comp"),
        F.lit(None).cast("long").alias("prev"),
    )
    cand = labels.select("node", "comp", F.col("comp").alias("prev")).unionByName(msgs)
    half = cand.groupBy("node").agg(
        F.min("comp").alias("comp"), F.max("prev").alias("prev")
    )
    jump = labels.select(F.col("node").alias("jnode"), F.col("comp").alias("jcomp"))
    round_frame = (
        half.join(jump, F.col("comp") == F.col("jnode"), "left")
        .select(
            "node",
            "prev",
            F.least(F.col("comp"), F.coalesce(F.col("jcomp"), F.col("comp"))).alias(
                "comp"
            ),
        )
        .repartition("node")
    )
    plan = round_frame._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        round_frame._jdf.queryExecution(), "formatted"
    )
    aqe = spark.conf.get("spark.sql.adaptive.enabled")
    tag = "aqe_on" if aqe == "true" else "aqe_off"
    out_path = os.path.join(here, "plans", "r11", f"d96_round_sf10_{tag}.txt")
    with open(out_path, "w") as fh:
        fh.write(plan)

    # the message join's edge side must come straight off the cached,
    # src-partitioned frame: no Exchange may appear between the
    # InMemoryTableScan of the edge cache and the join above it.
    # Heuristic on the formatted plan: find the SMJ/SHJ whose left input
    # chain contains the InMemoryTableScan, and list Exchange nodes in
    # that chain.
    exchanges = len(re.findall(r"\bExchange\b", plan))
    im_scans = len(re.findall(r"InMemoryTableScan", plan))
    # executed-plan check: run the round once and inspect the final
    # (AQE-reoptimized) plan string too
    round_frame.write.format("noop").mode("overwrite").save()
    final_plan = round_frame._jdf.queryExecution().executedPlan().toString()
    with open(
        os.path.join(here, "plans", "r11", f"d96_round_sf10_{tag}_executed.txt"), "w"
    ) as fh:
        fh.write(final_plan)
    release_caches()

    # === interleaved d96/a141 walls, current session AQE setting ===
    from one_stop_cdc_ingestion_toolkit_spark.operators import load_all

    reg = load_all()
    walls = {}
    for name in ("d96_dup_clusters", "a141_cluster_retention"):
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            reg[name].fn(spark, SF_DIR).collect()
            best = min(best, time.time() - t0)
            release_caches()
        walls[name] = round(best, 3)
    spread1 = bench._host_spread()
    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "aqe": aqe,
                "plan_file": out_path,
                "exchanges_in_round_plan": exchanges,
                "inmemory_scans": im_scans,
                "walls": walls,
                "probes": [spread0, spread1],
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
