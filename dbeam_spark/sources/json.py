"""Schema-enforced JSONL source with corrupt-record quarantine.

Web-scale training corpora arrive as JSON lines, and at 100 TB some
lines are ALWAYS malformed (truncated uploads, encoding damage, schema
drift). Failing the job (FAILFAST) or silently nulling rows
(DROPMALFORMED) both lose information; the production pattern is
PERMISSIVE parsing with the raw text of every bad line captured in a
corrupt-record column, good rows flowing on, and bad rows quarantined
to a side location for offline inspection/replay.

Scale notes: the read is a plain distributed text scan — declaring the
schema up front skips Spark's whole-file inference pass (which reads
everything once BEFORE the real scan at exactly the wrong time for
100 TB). The quarantine write is a second pass over the cached parse,
map-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    quarantine_path: str | None = None,
) -> DataFrame:
    """Read JSONL with `schema`; return only well-formed rows.

    Malformed lines are captured verbatim in `_corrupt_record`
    (PERMISSIVE mode) and, when `quarantine_path` is given, written
    there as text before being dropped from the result.

    The parsed frame is cached while both halves are split off —
    Spark refuses to filter on the corrupt column of an uncached
    JSON scan (the raw line is gone after parsing otherwise).
    """
    full_schema = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    df = (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    df = df.cache()
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    if quarantine_path is not None:
        bad.write.mode("overwrite").text(quarantine_path)
    return df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
