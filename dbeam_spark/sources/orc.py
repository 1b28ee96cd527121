"""Schema-enforced ORC source.

ORC files carry their own schema, so unlike the JSONL/CSV sources the
failure mode isn't malformed rows — it's SCHEMA DRIFT between what the
pipeline expects and what landed: a column dropped upstream, a type
widened, stray extra columns. Spark's default behavior silently
null-fills missing columns and prunes extras, which turns an upstream
contract break into a column of NULLs discovered weeks later.

`read_orc` makes the policy explicit, mirroring the Avro reader-schema
resolution in `sources/avro.py`:

- expected columns are SELECTed in schema order (extra file columns
  pruned — column-pruned at the scan, they are never read);
- a missing expected column FAILS by default with a field-level
  message, or null-fills under `on_missing="null_fill"` (the Avro
  "reader schema with defaults" analogue);
- a type mismatch fails unless the file type upcasts losslessly to
  the expected type (int→long, float→double — the same widening
  rules Avro schema resolution allows).

Scale notes: ORC is a first-class columnar Spark source — predicate
pushdown and column pruning reach the stripe/row-group level exactly
like parquet (tests assert PushedFilters on the scan), so the
enforcement layer costs nothing at read time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# lossless widenings, Avro-resolution style
_WIDENS: dict[tuple[str, str], bool] = {
    ("integer", "long"): True,
    ("short", "integer"): True,
    ("short", "long"): True,
    ("byte", "short"): True,
    ("byte", "integer"): True,
    ("byte", "long"): True,
    ("float", "double"): True,
    ("integer", "double"): True,
    ("date", "timestamp"): True,
}


def read_orc(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    on_missing: str = "fail",
) -> DataFrame:
    """Read ORC at `path` enforced against `schema` (see module doc).

    Returns a frame with exactly schema's columns, in schema order,
    cast to schema's types.
    """
    if on_missing not in ("fail", "null_fill"):
        raise ValueError(f"on_missing must be fail|null_fill: {on_missing}")
    df = spark.read.orc(path)
    file_types = {f.name: f.dataType for f in df.schema.fields}
    cols = []
    problems = []
    for field in schema.fields:
        have = file_types.get(field.name)
        if have is None:
            if on_missing == "fail":
                problems.append(f"missing column: {field.name}")
            else:
                cols.append(
                    F.lit(None).cast(field.dataType).alias(field.name)
                )
            continue
        if have == field.dataType or _WIDENS.get(
            (have.typeName(), field.dataType.typeName())
        ):
            cols.append(
                F.col(field.name).cast(field.dataType).alias(field.name)
            )
        else:
            problems.append(
                f"type mismatch: {field.name} is {have.simpleString()} "
                f"in the file, expected {field.dataType.simpleString()} "
                "(no lossless widening)"
            )
    if problems:
        raise ValueError(
            "ORC schema enforcement failed: " + "; ".join(problems)
        )
    return df.select(*cols)
