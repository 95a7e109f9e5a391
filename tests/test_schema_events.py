"""Schema-change event stream (A5): Debezium DDL payloads drive the
schema store through the reference's exact evolution truth table."""

from __future__ import annotations

import json

from pyspark.sql import types as T

from one_stop_cdc_ingestion_toolkit_spark.sources.schema_events import (
    apply_schema_changes,
    parse_schema_change,
)
from one_stop_cdc_ingestion_toolkit_spark.streaming.schema_store import SchemaStore


def _event(ddl: str, columns: list[dict], change_type: str = "ALTER") -> str:
    return json.dumps(
        {
            "source": {"db": "cdc_test_db"},
            "databaseName": "cdc_test_db",
            "ddl": ddl,
            "tableChanges": [
                {
                    "type": change_type,
                    "id": '"cdc_test_db"."person"',
                    "table": {
                        "primaryKeyColumnNames": ["firstName"],
                        "columns": columns,
                    },
                }
            ],
        }
    )


C_FIRST = {"name": "firstName", "typeName": "VARCHAR", "length": 155, "optional": True}
C_LAST = {"name": "lastName", "typeName": "VARCHAR", "length": 155, "optional": True}
C_AGE = {"name": "age", "typeName": "INT", "optional": False}
C_EMAIL = {"name": "email", "typeName": "VARCHAR", "length": 155, "optional": True}
C_ADDR = {"name": "address", "typeName": "VARCHAR", "length": 155, "optional": False}


def test_parse_schema_change():
    changes = parse_schema_change(
        _event("CREATE TABLE person (...)", [C_FIRST, C_LAST, C_AGE], "CREATE")
    )
    assert len(changes) == 1
    ch = changes[0]
    assert ch["db"] == "cdc_test_db" and ch["table"] == "person"
    assert ch["primary_key"] == ["firstName"]
    assert ch["schema"] == T.StructType(
        [
            T.StructField("firstName", T.StringType(), True),
            T.StructField("lastName", T.StringType(), True),
            T.StructField("age", T.IntegerType(), False),
        ]
    )


def test_reference_ddl_truth_table(tmp_path):
    """README.md:466-479 replayed as DDL events: drop ✓, add nullable ✓,
    add NOT NULL ✗ (recorded as error, store unchanged)."""
    store = SchemaStore(tmp_path, "BACKWARD")
    events = [
        _event("CREATE TABLE person", [C_FIRST, C_LAST, C_AGE], "CREATE"),
        _event("ALTER TABLE person DROP COLUMN lastName", [C_FIRST, C_AGE]),
        _event("ALTER TABLE person ADD COLUMN email varchar(155) NULL",
               [C_FIRST, C_AGE, C_EMAIL]),
        _event("ALTER TABLE person ADD COLUMN address varchar(155) NOT NULL",
               [C_FIRST, C_AGE, C_EMAIL, C_ADDR]),
    ]
    results = apply_schema_changes(store, events)
    assert [r[1] for r in results] == [1, 2, 3, None]
    assert results[3][2] is not None and "address" in results[3][2]
    # store did not advance past the rejected DDL
    assert len(store.versions("person")) == 3
    assert "email" in store.latest("person").fieldNames()
    assert "address" not in store.latest("person").fieldNames()


def test_decimal_and_unknown_types():
    cols = [
        {"name": "price", "typeName": "DECIMAL", "length": 18, "scale": 2, "optional": True},
        {"name": "weird", "typeName": "GEOMETRY", "optional": True},
    ]
    ch = parse_schema_change(_event("ALTER", cols))[0]
    assert ch["schema"]["price"].dataType == T.DecimalType(18, 2)
    assert ch["schema"]["weird"].dataType == T.StringType()  # safe fallback
