"""Dump `.explain("formatted")` for a named list of queries to files.

Usage: python tools/dump_query_plans.py OUT_DIR SUFFIX QUERY [QUERY...]

Writes OUT_DIR/<query>_<SUFFIX>.txt for each query. Streaming queries
(stream_*) are skipped — their plans are per-micro-batch.
Used to produce the plans/rNN before/after evidence files.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from dbeam_spark.queries import QUERIES
    from dbeam_spark.session import get_spark

    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)

    for name in names:
        if name.startswith("stream_"):
            print(f"skip {name}: streaming (per-micro-batch plan)")
            continue
        if name not in QUERIES:
            print(f"skip {name}: not registered")
            continue
        df = QUERIES[name](spark, sf_dir)
        plan = spark.sparkContext._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
