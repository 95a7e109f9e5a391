"""Minimal pure-Python Avro *binary* codec (Apache Avro 1.11 spec,
https://avro.apache.org/docs/current/specification/ — public format).

Why this exists: the reference's core serde is Debezium-Avro through a
schema registry (``/root/reference/bin/mskc-connector.sh:434-459``). The
Spark-native fast path is ``from_avro`` (spark-avro package), which this
container does not ship — so the engine provides an executable fallback:
decode Avro bodies executor-side with this codec (Arrow-batched, see
``debezium.avro_to_json``) and re-enter the common JSON envelope path.
On a real cluster with spark-avro on the classpath, ``decode_avro``
stays the JVM path; the fallback keeps the feature testable and usable
anywhere.

Supported types: null, boolean, int, long, float, double, bytes, string,
record, enum, array, map, union, fixed — everything a Debezium envelope
uses. Encoding helpers exist so tests can hand-craft golden bytes.
"""

from __future__ import annotations

import io
import json
import struct


class AvroCodecError(ValueError):
    pass


def parse_schema(schema: str | dict | list) -> dict | list | str:
    """Normalize a schema (JSON string or parsed) and index named types."""
    if isinstance(schema, str) and schema.lstrip().startswith(("{", "[", '"')):
        schema = json.loads(schema)
    return schema


def _resolve(schema, names: dict):
    """Follow named-type references ("com.x.Rec" after first definition)."""
    if isinstance(schema, str) and schema in names:
        return names[schema]
    return schema


def _register(schema: dict, names: dict) -> None:
    name = schema.get("name")
    if name:
        full = f"{schema['namespace']}.{name}" if schema.get("namespace") else name
        names[full] = schema
        names[name] = schema


def _collect_names(schema, names: dict) -> None:
    """Pre-register every named type so forward/cross references resolve
    even when the defining occurrence sits in an unvisited union branch
    (e.g. ``before: [null, Value]`` encoded as null, then ``after``
    referencing "Value")."""
    if isinstance(schema, list):
        for branch in schema:
            _collect_names(branch, names)
    elif isinstance(schema, dict):
        t = schema.get("type")
        if t in ("record", "enum", "fixed"):
            _register(schema, names)
        if t == "record":
            for f in schema.get("fields", []):
                _collect_names(f["type"], names)
        elif t == "array":
            _collect_names(schema.get("items"), names)
        elif t == "map":
            _collect_names(schema.get("values"), names)


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def _write_varint(out: io.BytesIO, n: int) -> None:
    """Zigzag + base-128 varint (spec: 'int and long values are written
    using variable-length zig-zag coding')."""
    n = (n << 1) ^ (n >> 63)  # zigzag for 64-bit
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            return


def _read_varint(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        raw = buf.read(1)
        if not raw:
            raise AvroCodecError("truncated varint")
        b = raw[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)  # un-zigzag


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


def encode(schema: str | dict | list, value, names: dict | None = None) -> bytes:
    schema = parse_schema(schema)
    names = names if names is not None else {}
    _collect_names(schema, names)
    out = io.BytesIO()
    _encode(schema, value, out, names)
    return out.getvalue()


def _encode(schema, value, out: io.BytesIO, names: dict) -> None:
    schema = _resolve(schema, names)
    if isinstance(schema, list):  # union: long index + encoded value
        for i, branch in enumerate(schema):
            if _matches(_resolve(branch, names), value):
                _write_varint(out, i)
                _encode(branch, value, out, names)
                return
        raise AvroCodecError(f"no union branch for {value!r} in {schema}")
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return
    if t == "boolean":
        out.write(b"\x01" if value else b"\x00")
    elif t in ("int", "long"):
        _write_varint(out, int(value))
    elif t == "float":
        out.write(struct.pack("<f", float(value)))
    elif t == "double":
        out.write(struct.pack("<d", float(value)))
    elif t in ("bytes", "string"):
        data = value.encode("utf-8") if t == "string" else bytes(value)
        _write_varint(out, len(data))
        out.write(data)
    elif t == "fixed":
        _register(schema, names)
        out.write(bytes(value))
    elif t == "enum":
        _register(schema, names)
        _write_varint(out, schema["symbols"].index(value))
    elif t == "record":
        _register(schema, names)
        for f in schema["fields"]:
            _encode(f["type"], value.get(f["name"]), out, names)
    elif t == "array":
        if value:
            _write_varint(out, len(value))
            for item in value:
                _encode(schema["items"], item, out, names)
        _write_varint(out, 0)
    elif t == "map":
        if value:
            _write_varint(out, len(value))
            for k, v in value.items():
                _encode("string", k, out, names)
                _encode(schema["values"], v, out, names)
        _write_varint(out, 0)
    else:
        raise AvroCodecError(f"unsupported type: {t}")


def _matches(schema, value) -> bool:
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return value is None
    if value is None:
        return False
    if t == "boolean":
        return isinstance(value, bool)
    if t in ("int", "long"):
        return isinstance(value, int) and not isinstance(value, bool)
    if t in ("float", "double"):
        return isinstance(value, (int, float)) and not isinstance(value, bool)
    if t == "string":
        return isinstance(value, str)
    if t in ("bytes", "fixed"):
        return isinstance(value, (bytes, bytearray))
    if t == "enum":
        return isinstance(value, str)
    if t == "record":
        return isinstance(value, dict)
    if t == "array":
        return isinstance(value, list)
    if t == "map":
        return isinstance(value, dict)
    return False


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def decode(schema: str | dict | list, data: bytes, names: dict | None = None):
    """``names``: optional PREBUILT name index (from ``_collect_names``).
    Passing one skips the per-call schema-tree walk — a per-record
    caller (debezium.avro_to_json) builds it once per schema id instead
    of once per Kafka record (review r7)."""
    schema = parse_schema(schema)
    if names is None:
        names = {}
        _collect_names(schema, names)
    buf = io.BytesIO(bytes(data))
    return _decode(schema, buf, names)


def _read_exact(buf: io.BytesIO, n: int, what: str) -> bytes:
    """Read exactly ``n`` bytes or raise. A lenient read on corrupt input
    decodes silently wrong values (truncated boolean → False, negative
    length → the rest of the buffer) instead of failing the record so
    the DLQ can catch it (review r7)."""
    if n < 0:
        raise AvroCodecError(f"negative {what} length: {n}")
    data = buf.read(n)
    if len(data) != n:
        raise AvroCodecError(f"truncated {what}: wanted {n}, got {len(data)}")
    return data


def _decode(schema, buf: io.BytesIO, names: dict):
    schema = _resolve(schema, names)
    if isinstance(schema, list):  # union
        idx = _read_varint(buf)
        if not 0 <= idx < len(schema):
            raise AvroCodecError(f"union index {idx} out of range")
        return _decode(schema[idx], buf, names)
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return None
    if t == "boolean":
        return _read_exact(buf, 1, "boolean") == b"\x01"
    if t in ("int", "long"):
        return _read_varint(buf)
    if t == "float":
        return struct.unpack("<f", _read_exact(buf, 4, "float"))[0]
    if t == "double":
        return struct.unpack("<d", _read_exact(buf, 8, "double"))[0]
    if t == "bytes":
        return _read_exact(buf, _read_varint(buf), "bytes")
    if t == "string":
        return _read_exact(buf, _read_varint(buf), "string").decode("utf-8")
    if t == "fixed":
        _register(schema, names)
        return _read_exact(buf, schema["size"], "fixed")
    if t == "enum":
        _register(schema, names)
        idx = _read_varint(buf)
        symbols = schema["symbols"]
        if not 0 <= idx < len(symbols):
            raise AvroCodecError(f"enum index {idx} out of range")
        return symbols[idx]
    if t == "record":
        _register(schema, names)
        return {f["name"]: _decode(f["type"], buf, names) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = _read_varint(buf)
            if n == 0:
                return out
            if n < 0:  # block with byte-size prefix
                n = -n
                _read_varint(buf)
            for _ in range(n):
                out.append(_decode(schema["items"], buf, names))
    if t == "map":
        out = {}
        while True:
            n = _read_varint(buf)
            if n == 0:
                return out
            if n < 0:
                n = -n
                _read_varint(buf)
            for _ in range(n):
                k = _decode("string", buf, names)
                out[k] = _decode(schema["values"], buf, names)
    raise AvroCodecError(f"unsupported type: {t}")
