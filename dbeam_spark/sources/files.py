"""Parquet table loaders for the star-schema testdata.

At 100 TB these would be partitioned/bucketed catalog tables; here the
contract is the same — `load_table` returns a lazily-scanned DataFrame
whose filters/projections Catalyst pushes into the parquet scan
(verify with ``df.explain('formatted')`` → PushedFilters / ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Dimension tables small enough to broadcast at any realistic scale
# (region/nation are bounded by geography; supplier/part stay MB-scale
# relative to fact tables).
BROADCAST_DIMS = {"region", "nation", "supplier", "part"}


# (session, sf_dir, name) -> lazy DataFrame. spark.read.parquet pays
# footer/schema inference on EVERY call (~0.1s of driver time per
# table per query); the testdata tables are immutable within a
# session, so the lazy plan is reusable. A new session is a new key,
# so restarted-session tests never see a stale plan.
_TABLE_CACHE: dict = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (spark, sf_dir, name)
    df = _TABLE_CACHE.get(key)
    if df is None:
        if name == "events":
            df = _load_events(spark, sf_dir)
        else:
            df = spark.read.parquet(
                os.path.join(sf_dir, f"{name}.parquet")
            )
        _TABLE_CACHE[key] = df
    return df


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet's `ts` physical type varies by generator version:
    TIMESTAMP(NANOS) (rejected by Spark unless read nanos-as-long),
    TIMESTAMP_NTZ (micros, no zone), or a plain UTC timestamp.
    Normalize all three to a session-UTC TimestampType so every
    downstream query sees one contract (micros, UTC — matching DuckDB's
    reading of the same file)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):  # nanos-as-long
        return df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts DIV 1000").cast("long"))
        )
    if isinstance(ts_type, T.TimestampNTZType):
        # Wall time with no zone: the oracle (DuckDB) reads it naive;
        # session is pinned UTC, so a plain cast is the identity map.
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}
