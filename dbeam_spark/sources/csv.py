"""Schema-enforced CSV source with corrupt-record quarantine.

The CSV twin of sources/json.py: delimited exports (database dumps,
partner feeds) carry the same malformed-line reality at scale —
unescaped delimiters, ragged rows, encoding damage. PERMISSIVE parsing
keeps good rows flowing, captures every bad line verbatim in a corrupt
column, and quarantines them for offline replay instead of failing the
job or silently dropping data.

Scale notes: the declared schema skips inference (a full extra pass
over the data); the read is a plain distributed text scan and the
quarantine write is map-only over the cached parse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    quarantine_path: str | None = None,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """Read CSV with `schema`; return only well-formed rows.

    Malformed lines are captured verbatim in `_corrupt_record`
    (PERMISSIVE mode) and, when `quarantine_path` is given, written
    there as text before being dropped from the result."""
    full_schema = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    df = (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .option("sep", delimiter)
        .csv(path)
    )
    df = df.cache()
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    if quarantine_path is not None:
        bad.write.mode("overwrite").text(quarantine_path)
    return df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
