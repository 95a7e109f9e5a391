"""Quick iteration harness: verify a subset of registered queries against
the DuckDB oracle at a given SF (default sf0.01), same compare as
tools/verify_oracle.py but filtered by name prefix/list.

Usage: python tools/check_new.py a117 a118 ...   (prefixes ok)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from one_stop_cdc_ingestion_toolkit_spark.operators import release_caches  # noqa: E402
from one_stop_cdc_ingestion_toolkit_spark.oracle import compare  # noqa: E402
from one_stop_cdc_ingestion_toolkit_spark.session import get_session  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    prefixes = sys.argv[1:]
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = [
        n
        for n in sorted(queries)
        if not prefixes or any(n.startswith(p) for p in prefixes)
    ]
    spark = get_session("check-new")
    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    n_fail = 0
    for name in names:
        try:
            sdf = queries[name](spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            if name not in oracles:
                print(f"ROWS-ONLY {name} ({len(srows)} rows)")
                continue
            res = duck.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            problems = compare(sdf.columns, srows, dcols, drows)
            if problems:
                n_fail += 1
                print(f"FAIL {name}:")
                for p in problems[:6]:
                    print("   ", p)
            else:
                print(f"PASS {name} ({len(srows)} rows)")
        except Exception as exc:  # noqa: BLE001
            n_fail += 1
            print(f"ERROR {name}: {type(exc).__name__}: {str(exc)[:400]}")
        finally:
            release_caches()
    print(f"\n{len(names) - n_fail} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
