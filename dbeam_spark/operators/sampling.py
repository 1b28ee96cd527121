"""Deterministic sampling + chunking for training-data pipelines.

Random sampling (`df.sample`) is not reproducible across engines or
even across Spark task retries with different partitioning; a training
pipeline needs samples that are stable under re-runs, backfills, and
engine swaps. These operators therefore key every decision off
`md5(content)` — a pure column function both Spark and DuckDB compute
identically — so the SAME rows are selected no matter the engine,
partitioning, or cluster size.

100 TB posture: all three operators are map-only over the scan (the
stratified variant adds one window shuffle on the stratum key) — no
driver state, no collect, no RNG seeds to coordinate across executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Hex chars of md5's first nibble to keep: 3/16 = 18.75 % sample.
DEFAULT_KEEP_NIBBLES = ("0", "1", "2")


def sample_by_hash(
    df: DataFrame,
    content_col: str = "text",
    keep_nibbles: tuple[str, ...] = DEFAULT_KEEP_NIBBLES,
) -> DataFrame:
    """Keep rows whose md5(content) starts with one of `keep_nibbles`.

    Selection rate = len(keep_nibbles)/16. The predicate is pure
    column math: it survives predicate pushdown reordering, needs no
    shuffle, and selects identical rows in any engine with md5.
    """
    return df.filter(
        F.substring(F.md5(F.col(content_col)), 1, 1).isin(*keep_nibbles)
    )


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    n_per_stratum: int,
    content_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic top-N rows per stratum, ordered by md5(content).

    md5 order is uniform-pseudorandom but stable, so this is a
    reproducible stratified sample: exactly min(N, |stratum|) rows per
    stratum, the same ones every run. One window shuffle on the
    stratum key; skewed strata are bounded because only N rows per
    stratum survive the rank filter (the window itself streams — no
    full materialization per group).
    """
    w = Window.partitionBy(stratum_col).orderBy(F.md5(F.col(content_col)), id_col)
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= n_per_stratum)
    )


def chunk_documents(
    df: DataFrame,
    chunk_size: int = 200,
    stride: int = 150,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into overlapping fixed-size character chunks.

    chunk k covers [1 + k*stride, 1 + k*stride + chunk_size); with
    stride < chunk_size consecutive chunks overlap by
    (chunk_size - stride) chars — the standard training-window shape.

    Spark-first: `sequence` + `explode` + `substring` stay entirely in
    whole-stage codegen (no HOF lambdas, no Python). Map-only: chunking
    N docs into M chunks is a flatMap the optimizer can pipeline into
    the scan; output partitioning inherits the input's.
    """
    start = F.explode(
        F.sequence(F.lit(1), F.length(F.col(text_col)), F.lit(stride))
    ).alias("chunk_start")
    chunk = F.substring(F.col(text_col), F.col("chunk_start"), chunk_size)
    return (
        df.select(F.col(id_col), F.col(text_col), start)
        .select(
            F.col(id_col),
            ((F.col("chunk_start") - 1) / stride).cast("long").alias("chunk_idx"),
            F.length(chunk).cast("long").alias("chunk_len"),
            F.md5(chunk).alias("chunk_hash"),
        )
    )
