"""Ad-hoc SQL entry point: arbitrary statements over the registered
views, with the optional DuckDB cross-check (the gate contract applied
to user-written SQL)."""

from __future__ import annotations

from dbeam_spark.sql import main, register_views

SF_DIR = "/root/testdata/sf0.001"


def test_sql_runs_and_matches_duckdb(spark, capsys):
    rc = main(
        [
            "SELECT o_orderpriority, COUNT(*) AS n FROM orders"
            " GROUP BY 1 ORDER BY 1",
            "--sf-dir",
            SF_DIR,
            "--check-duckdb",
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0 and '"duckdb": "match"' in out


def test_sql_mismatch_detected(spark, capsys):
    # engines disagree on purpose: DuckDB SUM(int)->HUGEINT->float64
    # vs Spark long (the documented gate hazard) — the checker must
    # flag it, proving the hash compare is live
    rc = main(
        [
            "SELECT SUM(o_orderkey) AS s FROM orders",
            "--sf-dir",
            SF_DIR,
            "--check-duckdb",
        ]
    )
    out = capsys.readouterr().out
    assert rc == 1 and "MISMATCH" in out


def test_register_views_lazy(spark):
    register_views(spark, SF_DIR)
    assert spark.sql("SELECT COUNT(*) FROM region").collect()[0][0] == 5


def test_pyproject_entry_points_resolve():
    """Packaging contract: pyproject.toml parses and every declared
    console script resolves to an importable callable (an actual
    `pip install` needs the wheel package, absent in this sandbox —
    the metadata and targets are what we can and do pin)."""
    import importlib
    import tomllib
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent
    cfg = tomllib.loads((root / "pyproject.toml").read_text())
    scripts = cfg["project"]["scripts"]
    assert len(scripts) >= 5
    for name, target in scripts.items():
        mod, fn = target.split(":")
        assert callable(getattr(importlib.import_module(mod), fn)), name
    assert cfg["project"]["name"] == "dbeam-spark"
