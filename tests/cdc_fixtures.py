"""Debezium envelope fixtures for the ``cdc_test_db.person`` table
(reference schema: /root/reference/README.md:457-462 — firstName/lastName
nullable varchar, age int NOT NULL; PK emulated via firstName)."""

from __future__ import annotations

import json

from pyspark.sql import types as T

PERSON_SCHEMA = T.StructType(
    [
        T.StructField("firstName", T.StringType(), True),
        T.StructField("lastName", T.StringType(), True),
        T.StructField("age", T.IntegerType(), False),
    ]
)

DB = "cdc_test_db"
TABLE = "person"


def envelope(
    op: str,
    pos: int,
    before: dict | None = None,
    after: dict | None = None,
    ts_ms: int | None = None,
) -> dict:
    """One Kafka-like record: string key (stringified PK) + JSON value."""
    key_row = after if op != "d" else before
    return {
        "key": str((key_row or {}).get("firstName")),
        "value": json.dumps(
            {
                "before": before,
                "after": after,
                "op": op,
                "ts_ms": ts_ms if ts_ms is not None else 1_700_000_000_000 + pos,
                "source": {"db": DB, "table": TABLE, "pos": pos, "server_id": 1},
            }
        ),
    }


def person(first: str, last: str | None, age: int) -> dict:
    return {"firstName": first, "lastName": last, "age": age}


#: canonical replay: snapshot reads, inserts, updates, deletes —
#: delivered with a duplicate and out of order (at-least-once).
CANONICAL_EVENTS = [
    envelope("r", 1, after=person("alice", "smith", 30)),
    envelope("r", 2, after=person("bob", "jones", 40)),
    envelope("c", 3, after=person("carol", "white", 25)),
    envelope("u", 5, before=person("alice", "smith", 30), after=person("alice", "brown", 31)),
    # out-of-order: pos=4 arrives after pos=5 (must NOT win over pos=5)
    envelope("u", 4, before=person("alice", "smith", 30), after=person("alice", "green", 30)),
    envelope("d", 6, before=person("bob", "jones", 40)),
    # duplicate delivery of pos=3 (at-least-once)
    envelope("c", 3, after=person("carol", "white", 25)),
    envelope("c", 7, after=person("dave", None, 55)),
]

#: state after replaying CANONICAL_EVENTS, keyed by firstName
GOLDEN_STATE = {
    "alice": ("alice", "brown", 31),
    "carol": ("carol", "white", 25),
    "dave": ("dave", None, 55),
}


def schema_change_event(
    columns: list[tuple[str, str, bool]],
    db: str = DB,
    table: str = TABLE,
    ddl: str = "ALTER TABLE person ...",
    change_type: str = "ALTER",
) -> dict:
    """One Debezium 2.x schema-change record (include.schema.changes=true):
    ``columns`` is (name, mysql typeName, optional)."""
    return {
        "key": db,
        "value": json.dumps(
            {
                "databaseName": db,
                "ddl": ddl,
                "tableChanges": [
                    {
                        "type": change_type,
                        "id": f'"{db}"."{table}"',
                        "table": {
                            "primaryKeyColumnNames": ["firstName"],
                            "columns": [
                                {"name": n, "typeName": t, "optional": opt}
                                for n, t, opt in columns
                            ],
                        },
                    }
                ],
            }
        ),
    }


def write_stream_files(path, events, files: int = 1) -> None:
    """Write events as JSON-lines files (the file-source change stream)."""
    import math
    from pathlib import Path

    Path(path).mkdir(parents=True, exist_ok=True)
    per = math.ceil(len(events) / files)
    for i in range(files):
        chunk = events[i * per : (i + 1) * per]
        if not chunk:
            continue
        with open(Path(path) / f"batch-{i:04d}.json", "w") as f:
            for e in chunk:
                f.write(json.dumps(e) + "\n")
