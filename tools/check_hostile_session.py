"""Driver-fidelity correctness gate: run every registered query under
a VANILLA SparkSession with a hostile (non-UTC) timezone and none of
`dbeam_spark.session.get_spark`'s engine confs — exactly the
environment the round driver builds. Catches queries that silently
depend on session defaults (`ensure_utc` inside each query fn is what
keeps this green).

Usage: python tools/check_hostile_session.py [sf_dir] [query ...]
(query names restrict the run; default is every registered query)

Set SPARK_GRAFT_HOSTILE_PARTITIONS (default 16) to stress a different
shuffle-partition count — hash-gated queries must be partitioning-
invariant (a prime like 7 shakes out range-partition boundary
assumptions in global_ranked / global_prefix_max and float-sum
ordering leaks).
"""

from __future__ import annotations

import os
import sys

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from check_correctness import canon_hash  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config(
            "spark.sql.shuffle.partitions",
            os.environ.get("SPARK_GRAFT_HOSTILE_PARTITIONS", "16"),
        )
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as entrymod
    from dbeam_spark.sources.files import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    if len(sys.argv) > 2:
        want = set(sys.argv[2:])
        unknown = want - set(qs)
        if unknown:
            print(f"unknown queries: {sorted(unknown)}")
            return 1
        qs = {k: v for k, v in qs.items() if k in want}
    fails = []
    for name, fn in qs.items():
        try:
            spdf = fn(spark, sf_dir).toPandas()
            if name not in oracles:
                canon_hash(spdf)  # array-typed cols would crash the driver
                print(f"ok   {name}: rows-only rows={len(spdf)}")
                continue
            opdf = con.execute(oracles[name]).df()
            ok = (
                len(spdf) == len(opdf)
                and sorted(spdf.columns) == sorted(opdf.columns)
                and canon_hash(spdf) == canon_hash(opdf)
            )
            print(("ok   " if ok else "FAIL ") + name)
            if not ok:
                fails.append(name)
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"FAIL {name}: {str(e)[:200]}")
            fails.append(name)
    print(f"\n{len(qs) - len(fails)}/{len(qs)} passing under hostile session")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
