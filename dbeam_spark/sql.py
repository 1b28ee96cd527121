"""Ad-hoc SQL entry point: run ANY SQL statement over the dataset's
tables (registered as temp views), the way a reference user runs their
own queries — not just the pre-registered SURVEY §2 inventory.

    python -m dbeam_spark.sql "SELECT COUNT(*) FROM lineitem"
    python -m dbeam_spark.sql "SELECT ... " --sf-dir /data/sf1 --explain
    python -m dbeam_spark.sql "SELECT o_orderpriority, COUNT(*) n
                               FROM orders GROUP BY 1 ORDER BY 1" \
        --check-duckdb

`--check-duckdb` executes the SAME statement in DuckDB over the same
parquet files and compares row count + column names + the gate's
order-insensitive value hash — ad-hoc cross-engine verification for
any query written in the shared SQL dialect (the full §2 inventory is
the curated, per-operator version of this check).

Catalyst still plans everything: views are lazy `load_table` frames,
so predicate pushdown / column pruning reach the parquet scans exactly
as in the registered queries.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def register_views(spark, sf_dir: str) -> None:
    """Register every dataset table as a temp view (lazy — unread
    tables cost nothing)."""
    from dbeam_spark.sources.files import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="dbeam_spark.sql")
    ap.add_argument("statement", help="SQL to run (tables: see TESTDATA.md)")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--explain", action="store_true", help="print the physical plan"
    )
    ap.add_argument(
        "--check-duckdb",
        action="store_true",
        help="run the same SQL in DuckDB and hash-compare",
    )
    ap.add_argument("--limit", type=int, default=20, help="rows to print")
    args = ap.parse_args(argv)

    from dbeam_spark.session import ensure_utc, get_spark

    spark = get_spark("dbeam-sql")
    spark.sparkContext.setLogLevel("ERROR")
    ensure_utc(spark)
    register_views(spark, args.sf_dir)

    df = spark.sql(args.statement)
    if args.explain:
        df.explain("formatted")
        return 0
    t0 = time.monotonic()
    rows = df.collect()
    elapsed = time.monotonic() - t0
    for r in rows[: args.limit]:
        print(r)
    if len(rows) > args.limit:
        print(f"... ({len(rows) - args.limit} more rows)")
    summary = {"rows": len(rows), "sec": round(elapsed, 3)}

    if args.check_duckdb:
        import duckdb

        tools_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
        )
        sys.path.insert(0, tools_dir)
        from check_correctness import canon_hash

        from dbeam_spark.sources.files import TABLES

        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS "
                f"SELECT * FROM '{args.sf_dir}/{t}.parquet'"
            )
        opdf = con.execute(args.statement).df()
        spdf = df.toPandas()
        match = (
            len(spdf) == len(opdf)
            and sorted(spdf.columns) == sorted(opdf.columns)
            and canon_hash(spdf) == canon_hash(opdf)
        )
        summary["duckdb"] = "match" if match else "MISMATCH"
    print(json.dumps(summary))
    return 0 if summary.get("duckdb") != "MISMATCH" else 1


if __name__ == "__main__":
    raise SystemExit(main())
