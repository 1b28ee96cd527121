"""Distributed graph algorithms beyond connected components
(operators/dedup.py hosts those): PageRank over an edge DataFrame.

The Spark formulation is the textbook one — ranks and edges are
co-partitioned DataFrames, each iteration is ONE join (ship rank mass
along out-edges) plus ONE groupBy (gather at the destination), with
`localCheckpoint` lineage truncation every few rounds so the plan
doesn't grow linearly with iterations (the same discipline
`dedup.connected_components` uses).

Engine-exact determinism: rank mass is carried as INTEGER micro-units
(1e-6 of total mass) and every transfer is integer division, so the
per-iteration sums are associative-exact — the result is bit-identical
across partitionings, retries and cluster sizes, which a float
formulation cannot promise (float groupBy sums are order-dependent).
The floor division leaks a sub-ppm of mass per hop (never gained), a
deliberate trade: reproducibility over exact mass conservation —
relative ranking, the signal consumers use, is unaffected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000  # micro-units of rank mass per node at init


def pagerank(
    edges: DataFrame,
    n_iter: int = 15,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int = 5,
) -> DataFrame:
    """PageRank over a directed edge list. Returns (id, rank_q6) with
    rank in integer micro-units (sum ≈ n_nodes × 1e6).

    Nodes appearing only as destinations (no out-edges) are dangling;
    their mass is redistributed uniformly each iteration — computed as
    a 1-row aggregate broadcast back, so no skewed shuffle. At 100 TB
    scale the per-iteration cost is one hash join on src + one
    aggregation on dst, both partitioned by node id; iterations are
    bounded and lineage is truncated."""
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    )
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    nodes = nodes.repartition("id").localCheckpoint(eager=True)
    n_nodes = nodes.count()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # out-degree table co-partitioned with ranks; dangling nodes get
    # deg NULL via the left join below
    d_num = int(round(damping * SCALE))  # damping in micro-units

    ranks = nodes.withColumn("r", F.lit(int(SCALE)))
    base = int((1.0 - damping) * SCALE)  # teleport mass per node
    # dangling nodes (no out-edges) are known up front; only their
    # MASS varies per iteration. When there are none — e.g. a k-NN
    # graph, where every node emits exactly k edges — the whole
    # dangling branch vanishes and each iteration is exactly one join
    # + one aggregation, fully lazy between checkpoints (no
    # per-iteration driver action).
    n_dangling = nodes.join(
        deg, nodes["id"] == deg["src"], "left_anti"
    ).count()
    for it in range(n_iter):
        with_deg = ranks.join(deg, ranks["id"] == deg["src"], "left").select(
            ranks["id"], "r", "deg"
        )
        contribs = (
            with_deg.filter(F.col("deg").isNotNull())
            .join(e, with_deg["id"] == e["src"])
            .select(F.col("dst").alias("id"), F.expr("r DIV deg").alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("inflow"))
        )
        if n_dangling:
            # per-node dangling share as a lazy 1-row scalar broadcast
            # (BroadcastNestedLoopJoin of one row — the same pattern
            # the scalar-subquery queries use), never a collect
            dm = (
                with_deg.filter(F.col("deg").isNull())
                .agg(
                    F.expr(f"COALESCE(SUM(r), 0) DIV {n_nodes}").alias("dsh")
                )
            )
            new = (
                nodes.join(contribs, "id", "left")
                .crossJoin(F.broadcast(dm))
                .select(
                    "id",
                    F.expr(
                        f"{base} + (COALESCE(inflow, 0) + dsh)"
                        f" * {d_num} DIV {SCALE}"
                    ).cast("long").alias("r"),
                )
            )
        else:
            new = nodes.join(contribs, "id", "left").select(
                "id",
                F.expr(
                    f"{base} + COALESCE(inflow, 0)"
                    f" * {d_num} DIV {SCALE}"
                ).cast("long").alias("r"),
            )
        ranks = new
        if (it + 1) % checkpoint_every == 0 or it == n_iter - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("id", F.col("r").alias("rank_q6"))
