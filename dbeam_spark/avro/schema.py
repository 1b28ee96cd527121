"""Spark schema → Avro schema, with dbeam's type-conversion contract.

Re-expresses reference avro/JdbcAvroSchema.java and
docs/type-conversion.md. dbeam maps java.sql.Types from JDBC metadata;
our source is a Spark DataFrame whose Catalyst types came from the
same JDBC metadata (or parquet), so the mapping composes to the same
Avro types:

  LongType→long, Integer/Short/Byte→int, Timestamp/Date→long
  (logicalType timestamp-millis when use_logical_types),
  Boolean→boolean, Binary→bytes, Double→double, Float→float,
  String→string, Decimal→string (dbeam renders high-precision
  numerics as strings), Array→array (or bytes under arrayMode=bytes).

Every column becomes a ["null", T] union with null default, like
dbeam. Record-level props tableName/connectionUrl and field-level
typeName props are preserved for metadata parity.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import types as T


def _avro_primitive(dt: T.DataType, use_logical_types: bool) -> Any:
    if isinstance(dt, T.LongType):
        return "long"
    if isinstance(dt, (T.IntegerType, T.ShortType, T.ByteType)):
        return "int"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        if use_logical_types:
            return {"type": "long", "logicalType": "timestamp-millis"}
        return "long"
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, T.BinaryType):
        return "bytes"
    if isinstance(dt, T.DoubleType):
        return "double"
    if isinstance(dt, T.FloatType):
        return "float"
    if isinstance(dt, T.DecimalType):
        return "string"
    if isinstance(dt, T.StringType):
        return "string"
    raise ValueError(f"Unsupported Spark type for Avro export: {dt}")


def _field_type(
    dt: T.DataType,
    use_logical_types: bool,
    array_mode: str,
    nullable_array_items: bool,
) -> Any:
    if isinstance(dt, T.ArrayType):
        if array_mode == "bytes":
            return "bytes"
        item = _avro_primitive(dt.elementType, use_logical_types)
        if nullable_array_items:
            item = ["null", item]
        return {"type": "array", "items": item}
    return _avro_primitive(dt, use_logical_types)


def spark_schema_to_avro(
    schema: T.StructType,
    schema_name: str = "no_table_name",
    namespace: str = "dbeam_generated",
    doc: str = "Generate schema from JDBC ResultSet metadata",
    connection_url: str = "",
    table_name: str | None = None,
    use_logical_types: bool = False,
    array_mode: str = "typed_first_row",
    nullable_array_items: bool = False,
    logical_type_hints: dict[str, str] | None = None,
) -> dict:
    """Build the Avro record schema (as a JSON-able dict).

    ``logical_type_hints`` maps column name -> source SQL type name for
    types Spark's JDBC reader erases (e.g. Postgres ``uuid`` arrives as
    StringType): with ``use_logical_types``, a ``uuid`` hint annotates
    the string field with ``logicalType: uuid``, mirroring reference
    JdbcAvroSchema.java:304-305 / :349-351.
    """
    fields = []
    hints = logical_type_hints or {}
    for f in schema.fields:
        avro_type = _field_type(
            f.dataType, use_logical_types, array_mode, nullable_array_items
        )
        if (
            use_logical_types
            and hints.get(f.name) == "uuid"
            and avro_type == "string"
        ):
            avro_type = {"type": "string", "logicalType": "uuid"}
        fields.append(
            {
                "name": _normalize_for_avro(f.name),
                "type": ["null", avro_type],
                "default": None,
                "doc": f"From sparkType {f.dataType.simpleString()}",
                "columnName": f.name,
                "typeName": f.dataType.simpleString().upper(),
            }
        )
    return {
        "type": "record",
        "name": _normalize_for_avro(schema_name),
        "namespace": namespace,
        "doc": doc,
        "tableName": table_name or schema_name,
        "connectionUrl": connection_url,
        "fields": fields,
    }


def _normalize_for_avro(name: str) -> str:
    out = "".join(c if c.isalnum() or c == "_" else "_" for c in name)
    if not out or not (out[0].isalpha() or out[0] == "_"):
        out = "_" + out
    return out


def merge_input_schema(generated: dict, input_schema: dict) -> dict:
    """Propagate doc/namespace/field-docs from a user-provided Avro
    schema into the generated one (ref BeamJdbcAvroSchema —
    'Following fields will be propagated': record.doc,
    record.namespace, record.field.doc)."""
    out = dict(generated)
    if "doc" in input_schema:
        out["doc"] = input_schema["doc"]
    if "namespace" in input_schema:
        out["namespace"] = input_schema["namespace"]
    in_docs = {
        f["name"]: f.get("doc")
        for f in input_schema.get("fields", [])
        if f.get("doc") is not None
    }
    out["fields"] = [
        {**f, **({"doc": in_docs[f["name"]]} if f["name"] in in_docs else {})}
        for f in generated["fields"]
    ]
    return out


def to_json(schema: dict, pretty: bool = True) -> str:
    return json.dumps(schema, indent=2 if pretty else None)
