"""Round-11 optimization probe (guide §1: measure first).

For each registered query (or an explicit subset):

- capture ``explain("formatted")`` to ``plans/r11/<name>_<tag>.txt``
- time min-of-N collect() (the bench contract wall)
- count the Spark JOBS the collect triggers (statusTracker delta) —
  queries paying several scheduling round-trips (probe jobs, eager
  checkpoints, persist materializations) show up here even when each
  job is individually cheap
- record the Exchange count and join strategies from the formatted plan

Emits one JSON line per query to stdout and a summary file
``plans/r11/probe_<tag>.json``.

Usage: python tools/r11_probe.py --tag before [--reps 3] [name ...]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "8")
os.environ.setdefault("SPARK_GRAFT_AQE", "false")


def main() -> int:
    argv = sys.argv[1:]
    tag = "before"
    reps = 3
    names: list[str] = []
    plans_only = False
    i = 0
    while i < len(argv):
        if argv[i] == "--tag":
            tag = argv[i + 1]
            i += 2
        elif argv[i] == "--reps":
            reps = int(argv[i + 1])
            i += 2
        elif argv[i] == "--plans-only":
            plans_only = True
            i += 1
        else:
            names.append(argv[i])
            i += 1

    import __spark_entry__ as entry_mod
    from one_stop_cdc_ingestion_toolkit_spark.operators import release_caches
    from one_stop_cdc_ingestion_toolkit_spark.session import get_session

    import bench

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spread0 = bench._host_spread()
    spark = get_session("r11-probe")
    queries = entry_mod.queries()
    if names:
        unknown = [n for n in names if n not in queries]
        if unknown:
            print(f"unknown: {unknown}", file=sys.stderr)
            return 2
        queries = {n: queries[n] for n in names}

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plan_dir = os.path.join(here, "plans", "r11")
    os.makedirs(plan_dir, exist_ok=True)

    # warm
    try:
        next(iter(queries.values()))(spark, sf_dir).collect()
    except Exception:
        pass
    release_caches()

    tracker = spark.sparkContext.statusTracker()
    results: dict[str, dict] = {}
    for name, fn in queries.items():
        rec: dict = {}
        try:
            spark.sparkContext.setJobDescription(f"probe:{name}")
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plan_dir, f"{name}_{tag}.txt"), "w") as fh:
                fh.write(plan)
            rec["exchanges"] = len(re.findall(r"\bExchange\b", plan))
            rec["joins"] = sorted(
                set(
                    re.findall(
                        r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
                        r"BroadcastNestedLoopJoin|CartesianProduct)\b",
                        plan,
                    )
                )
            )
            rec["py_nodes"] = sorted(
                set(
                    re.findall(
                        r"\b(BatchEvalPython|ArrowEvalPython|MapInArrow|"
                        r"FlatMapGroupsInPandas|MapInPandas)\b",
                        plan,
                    )
                )
            )
            release_caches()
            if not plans_only:
                best = float("inf")
                for rep in range(reps):
                    group = f"probe:{name}:{rep}"
                    spark.sparkContext.setJobGroup(group, name)
                    t0 = time.time()
                    df2 = fn(spark, sf_dir)
                    nrows = len(df2.collect())
                    dt = time.time() - t0
                    spark.sparkContext.setJobGroup(None, None)
                    if dt < best:
                        best = dt
                        # jobs triggered by ONE construction+collect —
                        # eager probes/checkpoints during fn() are in
                        # the same group
                        rec["jobs"] = len(
                            tracker.getJobIdsForGroup(group) or []
                        )
                    release_caches()
                    rec["rows"] = nrows
                rec["wall_s"] = round(best, 3)
        except Exception as exc:  # noqa: BLE001
            rec["err"] = f"{type(exc).__name__}: {exc}"[:300]
            release_caches()
        finally:
            spark.sparkContext.setJobDescription(None)
        results[name] = rec
        print(json.dumps({name: rec}), flush=True)

    spread1 = bench._host_spread()
    summary = {
        "tag": tag,
        "sf_dir": sf_dir,
        "reps": reps,
        "probes": [spread0, spread1],
        "results": results,
    }
    with open(os.path.join(plan_dir, f"probe_{tag}.json"), "w") as fh:
        json.dump(summary, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(
        json.dumps(
            {
                "probes": [spread0, spread1],
                "n": len(results),
                "total_wall": round(
                    sum(r.get("wall_s", 0.0) for r in results.values()), 3
                ),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
