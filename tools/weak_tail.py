"""Same-sitting weak-tail timer (VERDICT r5 ask #1 protocol).

For each named query: engine wall (min-of-3, full collect) and its DuckDB
oracle (min-of-3) measured interleaved IN THE SAME PROCESS WINDOW, with the
bench.py host-spread probe before and after — the only comparison the
host-noise protocol trusts (memory: bench-host-noise).

Usage: python tools/weak_tail.py [sf_dir] [query ...]
       (default sf_dir /root/testdata/sf0.1; default queries = the r5
        weak-tail five)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

DEFAULT = [
    "a119_bloom_prefilter",
    "a107_hybrid_rrf",
    "a004_containment_pairs",
    "c88_decontaminate",
    "a138_span_dedup",
]


def main() -> None:
    argv = sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"
    names = argv[1:] or DEFAULT

    # Bench-identical session config (shuffle=8, AQE off at toy scale).
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "8")
    os.environ.setdefault("SPARK_GRAFT_AQE", "false")

    import bench  # noqa: E402 — reuse its probe
    import __spark_entry__ as entry_mod  # noqa: E402
    from one_stop_cdc_ingestion_toolkit_spark.catalog import TABLES  # noqa: E402
    from one_stop_cdc_ingestion_toolkit_spark.operators import (  # noqa: E402
        release_caches,
    )
    from one_stop_cdc_ingestion_toolkit_spark.session import get_session  # noqa: E402

    spread0 = bench._host_spread()
    print(f"host_spread before: {spread0}")

    spark = get_session("weak-tail")
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    # warm JVM + parquet footers
    queries[names[0]](spark, sf_dir).collect()
    release_caches()

    rows = []
    for name in names:
        e_best, o_best = float("inf"), float("inf")
        for _ in range(3):
            t0 = time.time()
            queries[name](spark, sf_dir).collect()
            e_best = min(e_best, time.time() - t0)
            release_caches()
            t0 = time.time()
            con.execute(oracles[name]).fetchall()
            o_best = min(o_best, time.time() - t0)
        rows.append((name, e_best, o_best))

    spread1 = bench._host_spread()
    print(f"host_spread after: {spread1}\n")
    print("| query | engine (s) | oracle (s) | ratio |")
    print("|---|---|---|---|")
    for name, e, o in rows:
        print(f"| {name} | {e:.3f} | {o:.3f} | {e / o:.1f}x |")


if __name__ == "__main__":
    main()
