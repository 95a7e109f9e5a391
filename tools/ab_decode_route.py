"""Interleaved A/B: per-table envelope decode, full-parse-then-filter vs
route-then-parse (r10 streaming pipeline change).

Shape A (old apply_batch): every declared table runs from_json with the
full envelope schema over the WHOLE batch, then filters its own rows out
of the decoded stream — each row pays N_tables full parses.

Shape B (shipped): a get_json_object on the raw value routes rows to
their table first; each row is full-parsed once, by its own schema.

Methodology per the house rules: one process window, alternating A/B,
min-of-N, identical collected output asserted once up front. Timed
action is a noop-format write (guide §1.4) over the flattened change
rows, the same projection apply_batch feeds to the merge.

Usage: python tools/ab_decode_route.py [--rows=200000] [--tables=4] [--reps=5]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import types as T

from one_stop_cdc_ingestion_toolkit_spark.session import get_session
from one_stop_cdc_ingestion_toolkit_spark.sources.debezium import decode_json


def main() -> None:
    rows = 200_000
    tables = 4
    reps = 5
    for a in sys.argv[1:]:
        if a.startswith("--rows="):
            rows = int(a.split("=")[1])
        elif a.startswith("--tables="):
            tables = int(a.split("=")[1])
        elif a.startswith("--reps="):
            reps = int(a.split("=")[1])

    spark = get_session(app_name="ab_decode_route")
    names = [f"t{i}" for i in range(tables)]
    row_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("amount", T.DoubleType()),
            T.StructField("note", T.StringType()),
        ]
    )

    # Deterministic synthetic envelope batch, built distributed and
    # persisted so both shapes read the same in-memory rows (matching
    # apply_batch, which always runs off a persisted source batch).
    base = spark.range(rows)
    payload = F.to_json(
        F.struct(
            F.col("id"),
            F.concat(F.lit("name-"), F.col("id")).alias("name"),
            (F.col("id") * 1.5).alias("amount"),
            F.repeat(F.lit("x"), 64).alias("note"),
        )
    )
    tbl = F.concat(F.lit("t"), (F.col("id") % tables).cast("string"))
    env = F.concat(
        F.lit('{"before": null, "after": '),
        payload,
        F.lit(', "op": "c", "ts_ms": '),
        (F.lit(1_700_000_000_000) + F.col("id")).cast("string"),
        F.lit(', "source": {"db": "benchdb", "table": "'),
        tbl,
        F.lit('", "pos": '),
        F.col("id").cast("string"),
        F.lit("}}"),
    )
    data = base.select(
        F.col("id").cast("string").alias("key"), env.alias("value")
    ).persist()
    data.count()

    def flatten(decoded):
        return decoded.select(
            "key", "op", "ts_ms", F.col("after.id"), F.col("after.amount")
        )

    def shape_a():
        for name in names:
            decoded = decode_json(data, row_schema, keep_raw=True)
            mine = decoded.filter(F.col("source.table") == name)
            flatten(mine).write.format("noop").mode("overwrite").save()

    def shape_b():
        for name in names:
            slice_raw = data.filter(
                F.get_json_object(F.col("value").cast("string"), "$.source.table")
                == name
            )
            decoded = decode_json(slice_raw, row_schema, keep_raw=True)
            flatten(decoded).write.format("noop").mode("overwrite").save()

    # equality check once: same rows either way
    for name in names[:1]:
        a_rows = sorted(
            flatten(
                decode_json(data, row_schema, keep_raw=True).filter(
                    F.col("source.table") == name
                )
            ).collect()
        )
        b_rows = sorted(
            flatten(
                decode_json(
                    data.filter(
                        F.get_json_object(
                            F.col("value").cast("string"), "$.source.table"
                        )
                        == name
                    ),
                    row_schema,
                    keep_raw=True,
                )
            ).collect()
        )
        assert a_rows == b_rows, "shapes disagree"

    shape_a()  # warm
    shape_b()
    walls = {"a": [], "b": []}
    for _ in range(reps):
        for tag, fn in (("a", shape_a), ("b", shape_b)):
            t0 = time.monotonic()
            fn()
            walls[tag].append(round(time.monotonic() - t0, 3))
    out = {
        "rows": rows,
        "tables": tables,
        "reps": reps,
        "full_parse_then_filter_s": min(walls["a"]),
        "route_then_parse_s": min(walls["b"]),
        "all_a": walls["a"],
        "all_b": walls["b"],
        "speedup": round(min(walls["a"]) / max(min(walls["b"]), 1e-9), 2),
    }
    print(json.dumps(out))
    data.unpersist()


if __name__ == "__main__":
    main()
