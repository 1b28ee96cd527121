"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def rebalance_for_arrow(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin rebalance an input so an Arrow-batched Python stage
    gets cluster-wide parallelism.

    At 100 TB a scan arrives in thousands of input splits and this is
    a NO-OP (it never adds an exchange when the input already has
    enough partitions). On a small local input — one parquet file →
    one partition — the downstream mapInPandas would otherwise run as
    ONE task regardless of cores, serializing the entire Python
    compute; the round-robin exchange moves only the projected rows
    and unlocks N-way parallelism (measured: the sf0.1 MinHash
    signature stage alone dropped 3.6s → 0.5s on local[32])."""
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
