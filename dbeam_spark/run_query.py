"""CLI runner for the query registry: the user-facing way to execute
any SURVEY.md §2 capability by name against a parquet dataset dir.

    python -m dbeam_spark.run_query --list
    python -m dbeam_spark.run_query q1_pricing_summary
    python -m dbeam_spark.run_query dedup_minhash_lsh --sf-dir /data/sf1
    python -m dbeam_spark.run_query q5_local_supplier_volume --explain
    python -m dbeam_spark.run_query q3_shipping_priority --check-oracle

`--check-oracle` runs the registered DuckDB oracle over the same
parquet files and compares row count + order-insensitive value hash —
the same contract the correctness gate enforces.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="dbeam_spark.run_query")
    ap.add_argument("name", nargs="?", help="registered query name")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--list", action="store_true", help="list queries")
    ap.add_argument(
        "--explain", action="store_true", help="print the physical plan"
    )
    ap.add_argument(
        "--check-oracle",
        action="store_true",
        help="also run the DuckDB oracle and compare",
    )
    ap.add_argument("--limit", type=int, default=20, help="rows to show")
    args = ap.parse_args(argv)

    from dbeam_spark.queries import ORACLES, QUERIES

    if args.list or not args.name:
        for name in sorted(QUERIES):
            kind = "sql-oracle" if name in ORACLES else "rows-only"
            print(f"{name:32s} {kind}")
        return 0
    if args.name not in QUERIES:
        print(f"unknown query: {args.name} (use --list)", file=sys.stderr)
        return 43

    from dbeam_spark.session import get_spark

    spark = get_spark(f"run-{args.name}")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.monotonic()
    df = QUERIES[args.name](spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    rows = df.collect()
    elapsed = time.monotonic() - t0
    for r in rows[: args.limit]:
        print(r)
    if len(rows) > args.limit:
        print(f"... ({len(rows) - args.limit} more rows)")
    summary = {"query": args.name, "rows": len(rows), "sec": round(elapsed, 3)}

    if args.check_oracle:
        if args.name not in ORACLES:
            summary["oracle"] = "rows-only (no SQL oracle registered)"
        else:
            import os

            import duckdb

            tools_dir = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "tools",
            )
            sys.path.insert(0, tools_dir)
            from check_correctness import canon_hash

            con = duckdb.connect()
            from dbeam_spark.sources.files import TABLES

            for t in TABLES:
                con.execute(
                    f"CREATE VIEW {t} AS "
                    f"SELECT * FROM '{args.sf_dir}/{t}.parquet'"
                )
            opdf = con.execute(ORACLES[args.name]).df()
            spdf = df.toPandas()
            match = (
                len(spdf) == len(opdf)
                and sorted(spdf.columns) == sorted(opdf.columns)
                and canon_hash(spdf) == canon_hash(opdf)
            )
            summary["oracle"] = "match" if match else "MISMATCH"
    print(json.dumps(summary))
    return 0 if summary.get("oracle") != "MISMATCH" else 1


if __name__ == "__main__":
    raise SystemExit(main())
