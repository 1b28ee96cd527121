"""Diff two dbeam-style export runs by primary key.

The operational question after every export cadence: what actually
changed since the last run? (Did the CDC window drop rows? Did a
backfill rewrite history?) dbeam itself answers this with eyeballs on
`_METRICS.json` row counts; this job computes the real row-level
answer: added / removed / changed / unchanged keys between two export
directories, plus an optional materialized diff for downstream
incremental consumers.

Spark-first shape: both sides stream through the distributed Avro
reader (one task per OCF file), non-key columns collapse to a single
content fingerprint map-side, and the diff is ONE full outer join on
the key — shuffle volume is (rows × ~2 small columns), never the full
payload. At 100 TB the join co-partitions on the key; payloads are
re-read only for the (small) changed/added subset when materializing.

Reference: jobs/JdbcAvroJob.java writes `_METRICS.json` recordCount —
this is the row-level refinement of that signal (beyond reference).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbeam_spark.sources.avro import read_avro


@dataclass(frozen=True)
class DiffStats:
    added: int
    removed: int
    changed: int
    unchanged: int

    @property
    def total_delta(self) -> int:
        return self.added - self.removed


def _fingerprinted(df: DataFrame, key_col: str) -> DataFrame:
    payload = [c for c in df.columns if c != key_col]
    # NULL-safe content hash: hash() skips NULL args, so interpose the
    # column name and a NULL marker to keep (a=NULL,b=1) ≠ (a=1,b=NULL)
    parts: list = []
    for c in payload:
        parts.append(F.lit(c))
        parts.append(F.coalesce(F.col(c).cast("string"), F.lit("\x00")))
    return df.select(
        F.col(key_col).alias("k"), F.xxhash64(*parts).alias("fp")
    )


def diff_exports(
    spark: SparkSession,
    old_dir: str,
    new_dir: str,
    key_col: str,
) -> tuple[DataFrame, DiffStats]:
    """Classify every key across two export dirs.

    Returns (diff frame, stats): the frame has (k, status) with
    status in added|removed|changed|unchanged."""
    old = _fingerprinted(read_avro(spark, old_dir), key_col)
    new = _fingerprinted(read_avro(spark, new_dir), key_col)
    j = old.withColumnRenamed("fp", "fp_old").join(
        new.withColumnRenamed("fp", "fp_new"), "k", "full_outer"
    )
    status = (
        F.when(F.col("fp_old").isNull(), "added")
        .when(F.col("fp_new").isNull(), "removed")
        .when(F.col("fp_old") != F.col("fp_new"), "changed")
        .otherwise("unchanged")
    )
    diff = j.select("k", status.alias("status"))
    counts = {
        r["status"]: r["n"]
        for r in diff.groupBy("status").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    stats = DiffStats(
        added=counts.get("added", 0),
        removed=counts.get("removed", 0),
        changed=counts.get("changed", 0),
        unchanged=counts.get("unchanged", 0),
    )
    return diff, stats


def materialize_diff(
    spark: SparkSession,
    old_dir: str,
    new_dir: str,
    key_col: str,
    output_dir: str,
) -> DiffStats:
    """Write the changed+added rows (new payload) and removed keys as
    parquet under output_dir/{upserts,deletes} — the input a
    downstream MERGE INTO (operators.bucketing.merge_into) consumes.

    Payload rows are re-read ONLY for the affected keys: the semi
    join pushes the (usually small) affected-key set at the full
    exports, so the materialize cost scales with the delta."""
    diff, stats = diff_exports(spark, old_dir, new_dir, key_col)
    new_full = read_avro(spark, new_dir)
    affected = diff.filter(F.col("status").isin("added", "changed"))
    upserts = new_full.join(
        affected.select(F.col("k").alias(key_col)), key_col, "left_semi"
    )
    upserts.write.mode("overwrite").parquet(f"{output_dir}/upserts")
    removed = diff.filter(F.col("status") == "removed").select(
        F.col("k").alias(key_col)
    )
    removed.write.mode("overwrite").parquet(f"{output_dir}/deletes")
    return stats
