"""CDC decode+merge across the full Spark type surface (SURVEY §1.3):
decimals, timestamps, dates, arrays, nested structs — the types Debezium
emits for real MySQL sources beyond the person fixture's string/int."""

from __future__ import annotations

import datetime
import decimal
import json

from pyspark.sql import types as T

from one_stop_cdc_ingestion_toolkit_spark.operators.cdc import apply_changes, snapshot
from one_stop_cdc_ingestion_toolkit_spark.sources.debezium import (
    decode_json,
    flatten_changes,
)

RICH_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("price", T.DecimalType(18, 2), True),
        T.StructField("created", T.TimestampType(), True),
        T.StructField("day", T.DateType(), True),
        T.StructField("tags", T.ArrayType(T.StringType()), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("source", T.StringType(), True),
                    T.StructField("score", T.DoubleType(), True),
                ]
            ),
            True,
        ),
    ]
)


def _env(op, pos, before=None, after=None):
    return (
        str(((after or before) or {}).get("id")),
        json.dumps(
            {
                "before": before,
                "after": after,
                "op": op,
                "ts_ms": 1_700_000_000_000 + pos,
                "source": {"db": "d", "table": "rich", "pos": pos, "server_id": 1},
            }
        ),
    )


def test_rich_types_round_trip(spark, tmp_path):
    rows = [
        _env("c", 1, after={
            "id": 1, "price": "19.99", "created": "2024-03-01T10:30:00.123456",
            "day": "2024-03-01", "tags": ["a", "b"],
            "meta": {"source": "web", "score": 0.75},
        }),
        _env("c", 2, after={
            "id": 2, "price": "5.50", "created": "2024-03-02T00:00:00",
            "day": "2024-03-02", "tags": [], "meta": None,
        }),
        _env("u", 3, before={"id": 1}, after={
            "id": 1, "price": "21.00", "created": "2024-03-01T10:30:00.123456",
            "day": "2024-03-01", "tags": ["a", "b", "c"],
            "meta": {"source": "web", "score": 0.9},
        }),
    ]
    raw = spark.createDataFrame(rows, "key string, value string")
    changes = flatten_changes(decode_json(raw, RICH_SCHEMA), ["id"])
    state = apply_changes(None, changes, ["id"])

    # persist through the store and read back (parquet round-trip)
    from one_stop_cdc_ingestion_toolkit_spark.streaming.table_store import TableStore

    store = TableStore(tmp_path)
    store.write(state, "rich")
    got = {r["id"]: r for r in snapshot(store.read(spark, "rich")).collect()}

    assert got[1]["price"] == decimal.Decimal("21.00")
    assert got[1]["created"] == datetime.datetime(2024, 3, 1, 10, 30, 0, 123456)
    assert got[1]["day"] == datetime.date(2024, 3, 1)
    assert got[1]["tags"] == ["a", "b", "c"]
    assert got[1]["meta"]["score"] == 0.9
    assert got[2]["price"] == decimal.Decimal("5.50")
    assert got[2]["tags"] == []
    assert got[2]["meta"] is None
