"""Similarity search over embedding columns (`array<float>`).

- `cosine` is a pure Catalyst expression (zip_with/aggregate): the
  math runs JVM-side in codegen, no Python, no UDF.
- `knn_bruteforce`: broadcast the (small) query set, score map-only
  across the base table, per-query top-k. Zero shuffle on the base
  table — the plan that scales to 100 TB of vectors.
- `knn_ivf`: inverted-file ANN — broadcast coarse centroids, assign
  rows to cells (map-only), probe the nprobe nearest cells per query.
  Cuts scored candidates by ~ncells/nprobe at the cost of recall.
- `embedding_dedup_pairs`: exact pairwise cosine >= threshold; the
  documented scale path buckets by random-hyperplane signs first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _sum_arr(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, v: acc + v)


def dot(a: Column, b: Column) -> Column:
    return _sum_arr(F.zip_with(a, b, lambda x, y: x * y))


def norm(a: Column) -> Column:
    return F.sqrt(_sum_arr(F.transform(a, lambda x: x * x)))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity dot/(|a|*|b|) in double precision."""
    return dot(a, b) / (norm(a) * norm(b))


def _as_double(df: DataFrame, vec_col: str) -> DataFrame:
    return df.withColumn(vec_col, F.col(vec_col).cast("array<double>"))


def knn_bruteforce(
    base: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for every query vector.

    Returns (query_id, neighbor_id, sim, rank); similarity rounded to
    6 dp before ranking so ordering is reproducible across engines.
    """
    base = _as_double(base, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("v_base")
    )
    queries = _as_double(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("v_q")
    )
    sim = F.round(cosine(F.col("v_q"), F.col("v_base")), 6)
    scored = (
        base.join(F.broadcast(queries))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def knn_ivf(
    base: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 10,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN: coarse-quantize the base table into `n_cells` cells
    (deterministic seed vectors as centroids), probe the `n_probe`
    closest cells per query, exact top-k within the probed subset.

    At scale the cell assignment is a one-pass map with broadcast
    centroids and the base table can be *stored* partitioned by cell,
    making each query touch only nprobe/ncells of the data.
    """
    based = _as_double(base, vec_col)
    # Deterministic coarse centroids: first row of every id-stride.
    centroids = (
        based.withColumn(
            "cell", F.pmod(F.col(id_col), F.lit(n_cells)).cast("int")
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("cell").orderBy(F.col(id_col))
            ),
        )
        .filter(F.col("rn") == 1)
        .select("cell", F.col(vec_col).alias("centroid"))
    )
    # Assign every base row to its nearest centroid (map-only).
    assigned = (
        based.join(F.broadcast(centroids))
        .withColumn("csim", cosine(F.col(vec_col), F.col("centroid")))
        .withColumn(
            "crn",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy(F.desc("csim"), "cell")
            ),
        )
        .filter(F.col("crn") == 1)
        .select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("v_base"), "cell")
    )
    # Each query probes its n_probe nearest cells.
    qd = _as_double(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("v_q")
    )
    probed = (
        qd.join(F.broadcast(centroids))
        .withColumn("csim", cosine(F.col("v_q"), F.col("centroid")))
        .withColumn(
            "crn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.desc("csim"), "cell")
            ),
        )
        .filter(F.col("crn") <= n_probe)
        .select("query_id", "v_q", "cell")
    )
    sim = F.round(cosine(F.col("v_q"), F.col("v_base")), 6)
    scored = (
        assigned.join(F.broadcast(probed), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def embedding_dedup_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Pairs with cosine >= threshold (exact all-pairs).

    100 TB note: replace the open self-join with a random-hyperplane
    LSH pre-bucket (sign-bits of h random projections → band join)
    and keep this exact cosine as the verification step.
    """
    d = _as_double(df, vec_col)
    a = d.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"))
    b = d.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"))
    sim = cosine(F.col("v_a"), F.col("v_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("sim", F.round(sim, 4))
        .filter(sim >= threshold)
        .select("id_a", "id_b", "sim")
    )
