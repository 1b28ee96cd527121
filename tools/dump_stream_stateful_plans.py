"""Dump `explain`-style plans for the stateful streaming pipelines.

Streaming queries are excluded from tools/dump_query_plans.py (their
real plans are per-micro-batch), but the round-9 §4.1 projection fix
is visible in the UNSTARTED stream's plan: the Project node above the
file-source relation (and hence the pruned ReadSchema once the scan
is planned) carries the 2-3 columns the stateful kernel reads instead
of the full 6-column events schema (props included). This tool
rebuilds each affected query's pre-boundary frame exactly as the
query function does — via the same module-level column constants the
queries select — and writes plans/r09/<name>_{before,after}.txt.

Usage: python tools/dump_stream_stateful_plans.py <suffix>
  e.g. `... before` on the pre-change tree (no constants defined ->
  full-width plan), `... after` on HEAD.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    "r09",
)

# The three stateful queries whose Python-boundary input was
# full-width before r9; the constant names are defined next to the
# query bodies in queries/streaming.py (absent on the pre-change
# tree, in which case the before-dump shows the full relation).
KEYS = {
    "stream_throttle": "_THROTTLE_COLS",
    "stream_stateful_user_stats": "_USER_STATS_COLS",
    "stream_markov_stationary": "_MARKOV_COLS",
}


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "after"
    from dbeam_spark.session import get_spark
    from dbeam_spark.queries import streaming as st

    spark = get_spark("stream-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT_DIR, exist_ok=True)
    for name, const in KEYS.items():
        df = st._events_stream(spark, SF_DIR)
        cols = getattr(st, const, None)
        if cols:
            df = df.select(*cols)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain(extended=True)
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
