"""t2-style correctness: every registered query hash-matches DuckDB at
sf0.001 (the driver's gate runs the same compare at sf0.01)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from one_stop_cdc_ingestion_toolkit_spark.oracle import compare
from tests.conftest import SF_DIR

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_oracle_covers_queries():
    # every query either has an oracle or is a documented rows-only op
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    sdf = QUERIES[name](spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    if name not in ORACLES:
        assert srows is not None  # rows-only smoke: query executes
        return
    res = duck.execute(ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    problems = compare(sdf.columns, srows, dcols, drows)
    assert not problems, f"{name}: " + "\n".join(problems)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["o_orderkey", "rev"]
