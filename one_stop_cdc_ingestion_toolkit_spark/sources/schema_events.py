"""Schema-change event stream (SURVEY §2.1 A5/A6).

The reference enables ``include.schema.changes=true``
(`/root/reference/bin/mskc-connector.sh:399`) so Debezium emits DDL
events to the prefix topic, alongside the schema-history topic
(`:407-408`). The public Debezium 2.x schema-change payload carries
``databaseName``, the raw ``ddl`` string, and structured
``tableChanges[]`` with the full post-DDL column list.

The engine consumes the STRUCTURED side: each table change maps to a
Spark ``StructType`` and registers into the :class:`SchemaStore`, where
the BACKWARD gate accepts/rejects it (the reference's registry behavior,
observed truth table `README.md:466-479`). The raw DDL text is kept only
for the audit log.
"""

from __future__ import annotations

import json

from pyspark.sql import types as T

from one_stop_cdc_ingestion_toolkit_spark.streaming.schema_store import SchemaStore

#: Debezium/MySQL typeName → Spark type (public Debezium mapping for the
#: types the reference's fixtures exercise; extend as sources demand).
TYPE_MAP: dict[str, T.DataType] = {
    "TINYINT": T.ByteType(),
    "SMALLINT": T.ShortType(),
    "INT": T.IntegerType(),
    "INTEGER": T.IntegerType(),
    "BIGINT": T.LongType(),
    "FLOAT": T.FloatType(),
    "DOUBLE": T.DoubleType(),
    "VARCHAR": T.StringType(),
    "CHAR": T.StringType(),
    "TEXT": T.StringType(),
    "BOOLEAN": T.BooleanType(),
    "DATE": T.DateType(),
    "DATETIME": T.TimestampType(),
    "TIMESTAMP": T.TimestampType(),
    "BLOB": T.BinaryType(),
    "VARBINARY": T.BinaryType(),
}


def column_to_field(col: dict) -> T.StructField:
    type_name = col["typeName"].upper()
    if type_name == "DECIMAL":
        # `or` both attributes: Debezium serializes UNSET attributes as
        # explicit nulls, so .get(key, default) returns None when the
        # key is present — DecimalType(None, 0) is a broken schema that
        # escapes apply_schema_changes' error handling (review r7)
        dtype: T.DataType = T.DecimalType(
            col.get("length") or 10, col.get("scale") or 0
        )
    else:
        dtype = TYPE_MAP.get(type_name, T.StringType())
    return T.StructField(col["name"], dtype, bool(col.get("optional", True)))


def parse_schema_change(value: str | dict) -> list[dict]:
    """One Debezium schema-change payload → a list of
    ``{db, table, type, ddl, schema: StructType, primary_key: [..]}``."""
    doc = json.loads(value) if isinstance(value, str) else value
    out = []
    for change in doc.get("tableChanges", []):
        table_doc = change.get("table") or {}
        fields = [column_to_field(c) for c in table_doc.get("columns", [])]
        ident = change.get("id", "").replace('"', "")
        table = ident.split(".")[-1] if ident else None
        out.append(
            {
                "db": doc.get("databaseName"),
                "table": table,
                "type": change.get("type"),
                "ddl": doc.get("ddl"),
                "schema": T.StructType(fields),
                "primary_key": table_doc.get("primaryKeyColumnNames", []),
            }
        )
    return out


def apply_schema_changes(
    store: SchemaStore, events: list[str | dict]
) -> list[tuple[str, int | None, str | None]]:
    """Register each schema-change event; returns
    ``(table, version_or_None, error_or_None)`` per change — the engine's
    schema-history record (A6). Incompatible DDL is recorded and skipped,
    not raised: the reference's registry rejects the write while the
    connector keeps running (`README.md:476-479`)."""
    from one_stop_cdc_ingestion_toolkit_spark.streaming.schema_store import (
        IncompatibleSchemaError,
    )

    results = []
    for ev in events:
        for change in parse_schema_change(ev):
            if change["type"] == "DROP" or change["table"] is None:
                results.append((change["table"], None, None))
                continue
            try:
                v = store.register(change["table"], change["schema"])
                results.append((change["table"], v, None))
            except IncompatibleSchemaError as e:
                results.append((change["table"], None, str(e)))
    return results
