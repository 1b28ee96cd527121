"""PageRank operator (operators/graph.py): structure sanity +
determinism on crafted graphs."""

from __future__ import annotations

from dbeam_spark.operators.graph import SCALE, pagerank


def _ranks(spark, edges, **kw):
    e = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["id"]: r["rank_q6"] for r in pagerank(e, **kw).collect()
    }


def test_star_hub_dominates(spark):
    # 1..5 all point at 0; 0 points back at 1 — the hub must rank first
    edges = [(i, 0) for i in range(1, 6)] + [(0, 1)]
    r = _ranks(spark, edges)
    assert max(r, key=r.get) == 0
    assert r[0] > 3 * r[2]


def test_cycle_is_uniform(spark):
    # a 4-cycle: perfect symmetry, every node identical rank
    edges = [(0, 1), (1, 2), (2, 3), (3, 0)]
    r = _ranks(spark, edges)
    assert len(set(r.values())) == 1
    # mass ≈ n × SCALE (integer floors only ever leak mass downward)
    assert 0.9 * 4 * SCALE < sum(r.values()) <= 4 * SCALE


def test_dangling_mass_redistributed(spark):
    # 2 has no out-edges: its mass must be spread, not lost
    edges = [(0, 1), (1, 2)]
    r = _ranks(spark, edges)
    assert r[2] > r[1] > 0
    assert sum(r.values()) > 0.8 * 3 * SCALE


def test_deterministic_across_partitionings(spark):
    edges = [(i, (i * 7 + 3) % 11) for i in range(11) for _ in (0,)]
    e1 = spark.createDataFrame(edges, "src long, dst long").repartition(1)
    e8 = spark.createDataFrame(edges, "src long, dst long").repartition(8)
    r1 = {r["id"]: r["rank_q6"] for r in pagerank(e1, n_iter=8).collect()}
    r8 = {r["id"]: r["rank_q6"] for r in pagerank(e8, n_iter=8).collect()}
    assert r1 == r8  # integer math: bit-identical regardless of layout


def test_covariance_exact_matches_numpy(spark):
    import numpy as np

    from dbeam_spark.operators.similarity import covariance_exact

    rng = np.random.RandomState(7)
    X = rng.randn(200, 6) * 0.3
    rows = [(i, [float(v) for v in X[i]]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cov, mean, n = covariance_exact(df)
    assert n == 200
    # quantization at 1e-6 units: agreement to ~1e-5 absolute
    Q = np.floor(X * 1_000_000) / 1_000_000
    ref = np.cov(Q, rowvar=False, bias=True)
    assert np.abs(cov - ref).max() < 1e-9
    assert np.abs(mean - Q.mean(axis=0)).max() < 1e-9


def test_covariance_partitioning_invariant(spark):
    import numpy as np

    from dbeam_spark.operators.similarity import covariance_exact

    rng = np.random.RandomState(11)
    X = rng.randn(100, 4)
    rows = [(i, [float(v) for v in X[i]]) for i in range(100)]
    d1 = spark.createDataFrame(rows, "vec_id long, embedding array<double>").repartition(1)
    d7 = spark.createDataFrame(rows[::-1], "vec_id long, embedding array<double>").repartition(7)
    c1, m1, _ = covariance_exact(d1)
    c7, m7, _ = covariance_exact(d7)
    # integer sufficient statistics: BIT-identical, any layout/order
    assert (c1 == c7).all() and (m1 == m7).all()
