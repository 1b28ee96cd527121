"""Scale-safe global ranking.

A global ``row_number() OVER (ORDER BY ...)`` with no PARTITION BY
collapses the whole input into ONE window partition (Spark even logs
``WindowExec: No Partition Defined`` for it) — a single-task sort that
OOMs at fact scale. ``global_ranked`` computes the identical rank with
a range-partitioned plan instead:

1. ``repartitionByRange`` on the sort key (every row in partition i
   sorts strictly before every row in partition i+1 — the sort key
   must be a total order, so callers pass a unique tie-break column),
2. per-partition ``row_number`` (bounded sorts, one per partition),
3. cumulative partition offsets (|partitions| rows, computed once and
   folded back as a literal map).

The partitioned frame is persisted before the count pass so the
range boundaries (which Spark derives by sampling, nondeterministic
across recomputations) are pinned between the offset pass and the
rank pass.

This mirrors the classic zipWithIndex-on-sorted-RDD trick, expressed
at the DataFrame layer so column pruning and pushdown still apply.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def global_ranked(
    df: DataFrame,
    order_by: list[Column],
    rank_col: str = "_rank",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Attach a 1-based global dense row number over a TOTAL order.

    ``order_by`` must define a total order (include a unique tie-break
    column) — otherwise ranks across range-partition boundaries are
    still correct but tie order within a partition is nondeterministic.

    Returns ``(df_with_rank, total_rows)``. The input frame is
    persisted (MEMORY_AND_DISK) for the duration of the computation;
    callers consuming the result in the same action need no cleanup —
    Spark evicts on pressure and the context GC unpersists.
    """
    from pyspark import StorageLevel
    from pyspark.sql import Window

    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    parted = (
        df.repartitionByRange(num_partitions, *order_by)
        .withColumn("_gr_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = {
        r["_gr_pid"]: r["cnt"]
        for r in parted.groupBy("_gr_pid")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    total = sum(counts.values())
    if not counts:
        return (
            parted.withColumn(rank_col, F.lit(None).cast("long")).drop("_gr_pid"),
            0,
        )
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_map = F.create_map(
        *[F.lit(v) for pid in sorted(offsets) for v in (pid, offsets[pid])]
    )
    w = Window.partitionBy("_gr_pid").orderBy(*order_by)
    ranked = parted.withColumn(
        rank_col,
        (F.row_number().over(w).cast("long") + off_map[F.col("_gr_pid")]).cast(
            "long"
        ),
    ).drop("_gr_pid")
    return ranked, total


def global_prefix_max(
    df: DataFrame,
    order_by: list[Column],
    value: Column,
    out_col: str = "_pmax",
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach, to each row, the MAX of ``value`` over all rows strictly
    BEFORE it in the global ``order_by`` order (NULL for the first row)
    — the running-max primitive behind sweep-line algorithms (skyline,
    envelope, high-water-mark audits), computed WITHOUT the
    single-partition global window:

    1. ``repartitionByRange`` on the order key (partition i sorts
       strictly before partition i+1),
    2. per-partition prefix max (a PARTITIONED window — bounded sorts),
    3. per-partition totals (|partitions| rows) folded back as a
       carry-in literal map: partition i's carry is the max over all
       partitions < i.

    Same contract as ``global_ranked``: the partitioned frame is
    persisted so sampled range boundaries stay pinned between the
    carry pass and the output pass.
    """
    from pyspark import StorageLevel
    from pyspark.sql import Window

    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    parted = (
        df.repartitionByRange(num_partitions, *order_by)
        .withColumn("_pm_pid", F.spark_partition_id())
        .withColumn("_pm_val", value)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    maxes = {
        r["_pm_pid"]: r["mx"]
        for r in parted.groupBy("_pm_pid").agg(F.max("_pm_val").alias("mx")).collect()
    }
    carry: dict[int, object] = {}
    acc = None
    for pid in sorted(maxes):
        carry[pid] = acc
        if maxes[pid] is not None and (acc is None or maxes[pid] > acc):
            acc = maxes[pid]
    pairs = [
        v
        for pid in sorted(carry)
        if carry[pid] is not None
        for v in (F.lit(pid), F.lit(carry[pid]))
    ]
    w = (
        Window.partitionBy("_pm_pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = F.max("_pm_val").over(w)
    if pairs:
        carried = F.create_map(*pairs)[F.col("_pm_pid")]
        out = F.greatest(local, carried)  # greatest skips NULLs
    else:
        out = local
    return parted.withColumn(out_col, out).drop("_pm_pid", "_pm_val")


def ntile_from_rank(rank: Column, total: int, n_buckets: int) -> Column:
    """ntile(n_buckets) recomputed from an exact global rank.

    SQL ntile semantics: with ``total`` rows, the first ``total %
    n_buckets`` buckets hold ``total // n_buckets + 1`` rows, the rest
    hold ``total // n_buckets``. Pure arithmetic on the rank — no
    window, evaluated map-side.
    """
    q, rem = divmod(total, n_buckets)
    if q == 0:
        # fewer rows than buckets: bucket i holds row i
        return rank.cast("long")
    threshold = rem * (q + 1)
    big = F.ceil(rank / F.lit(q + 1))
    small = F.lit(rem) + F.ceil((rank - F.lit(threshold)) / F.lit(q))
    return F.when(rank <= F.lit(threshold), big).otherwise(small).cast("long")


def global_cumsum(
    df: DataFrame,
    order_by: list[Column],
    cols: list[str],
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach, to each row, the INCLUSIVE running sum of each column in
    ``cols`` over the global ``order_by`` order (as ``_cum_<col>``) —
    the prefix-sum primitive behind ECDFs, KS statistics, Lorenz
    curves, and watermark ledgers, computed WITHOUT the
    single-partition global window:

    1. ``repartitionByRange`` on the order key (partition i sorts
       strictly before partition i+1 — pass a unique tie-break so the
       order is total),
    2. per-partition running sums (PARTITIONED windows — bounded
       sorts),
    3. per-partition totals (|partitions| × |cols| scalars) folded
       back as carry-in literal maps: partition i's carry is the sum
       over all partitions < i.

    Same contract as ``global_ranked``: the partitioned frame is
    persisted so sampled range boundaries stay pinned between the
    carry pass and the output pass. Sums are computed in LONG — the
    caller keeps inputs integral (the repo-wide exactness idiom).
    """
    from pyspark import StorageLevel
    from pyspark.sql import Window

    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(
            spark.conf.get("spark.sql.shuffle.partitions", "32")
        )

    parted = (
        df.repartitionByRange(num_partitions, *order_by)
        .withColumn("_cs_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    totals = parted.groupBy("_cs_pid").agg(
        *[F.sum(c).cast("long").alias(c) for c in cols]
    ).collect()
    by_pid = {r["_cs_pid"]: r for r in totals}
    out = parted
    w = (
        Window.partitionBy("_cs_pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in cols:
        carry: dict[int, int] = {}
        acc = 0
        for pid in sorted(by_pid):
            carry[pid] = acc
            acc += by_pid[pid][c] or 0
        if carry:
            cmap = F.create_map(
                *[
                    F.lit(v)
                    for pid in sorted(carry)
                    for v in (pid, carry[pid])
                ]
            )
            carry_in = F.coalesce(cmap[F.col("_cs_pid")], F.lit(0))
        else:  # empty input: create_map() has VOID keys, carry is 0
            carry_in = F.lit(0)
        out = out.withColumn(
            f"_cum_{c}",
            (F.sum(c).over(w).cast("long") + carry_in).cast("long"),
        )
    return out.drop("_cs_pid")
