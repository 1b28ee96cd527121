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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores TIMESTAMP(NANOS), which Spark's reader
    rejects; read nanos as long and convert to a microsecond timestamp
    (matching DuckDB's nanosecond→datetime truncation)."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return df.withColumn(
        "ts", F.timestamp_micros(F.expr("ts DIV 1000").cast("long"))
    )


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}
