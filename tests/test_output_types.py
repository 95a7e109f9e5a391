"""Output-type hygiene gate for every registered query.

Round-1 driver forensics (CORRECTNESS_r01.json): q13/q45/q47 failed ONLY on
hash_match. Root cause — the driver compares results through a pandas-style
conversion where Spark DECIMAL survives as ``decimal.Decimal`` (``'126074.00'``)
but DuckDB DECIMAL/HUGEINT collapse to float64 (``'126074.0'``), so any
integral-valued DECIMAL sum hash-diverges. q18/q27 passed round 1 only
because price cents in the fixture data never end in zero.

Rule enforced here: a registered query's output schema may contain ONLY
types whose pandas rendering is engine-invariant — integers, double,
string, date, timestamp, boolean, and arrays/structs thereof. No DECIMAL
on the Spark side; no DECIMAL/HUGEINT on the DuckDB oracle side; and the
numeric class (int vs float) of every shared column must agree.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from one_stop_cdc_ingestion_toolkit_spark.catalog import TABLES

SF_DIR = "/root/testdata/sf0.001"


def _klass(t: str) -> str:
    t = t.lower()
    if "decimal" in t or "hugeint" in t or "int128" in t:
        return "forbidden"
    if "interval" in t:
        return "interval"
    if "timestamp" in t:
        # Spark timestamp_ntz ≡ DuckDB TIMESTAMP: both wall-clock µs,
        # identical pandas rendering.
        return "timestamp"
    if any(k in t for k in ("tinyint", "smallint", "bigint", "int", "long", "short", "byte")):
        return "int"
    if any(k in t for k in ("float", "double", "real")):
        return "float"
    if any(k in t for k in ("varchar", "string", "text", "char")):
        return "str"
    return t


@pytest.fixture(scope="module")
def duck():
    from one_stop_cdc_ingestion_toolkit_spark.oracle import duck_connect

    return duck_connect(SF_DIR, TABLES)


@pytest.fixture(scope="module")
def all_specs():
    return entry_mod.queries(), entry_mod.oracle_sql()


def test_no_ambiguous_output_types(spark, duck, all_specs):
    queries, oracles = all_specs
    problems: list[str] = []
    for name, fn in sorted(queries.items()):
        sdf = fn(spark, SF_DIR)
        stypes = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
        for c, t in stypes.items():
            if _klass(t) == "forbidden":
                problems.append(f"{name}: spark output {c} is {t}")
        if name not in oracles:
            continue
        res = duck.execute(f"DESCRIBE ({oracles[name].rstrip(';')})")
        dtypes = {r[0]: r[1] for r in res.fetchall()}
        for c, t in dtypes.items():
            if _klass(t) == "forbidden":
                problems.append(f"{name}: oracle output {c} is {t}")
        for c in stypes:
            if c in dtypes and _klass(stypes[c]) != _klass(dtypes[c]):
                problems.append(
                    f"{name}: {c} class mismatch spark={stypes[c]} "
                    f"duck={dtypes[c]}"
                )
    assert not problems, "\n".join(problems)
