"""Targeted scale probe: time a named subset of PROBES at sf0.1 vs the
10x replica (reuses tools/scale_probe.py's replica + timing logic).

Usage:
  python tools/probe_subset.py lorenz_deciles_customers cuped_adjusted_lift
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tools.scale_probe as sp


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    if not names:
        print("usage: probe_subset.py <query> [query ...]")
        sys.exit(2)
    sp.PROBES = names

    from dbeam_spark.session import get_spark

    spark = get_spark(
        "probe-subset", extra_conf={"spark.driver.memory": "24g"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    sp.ensure_replica(spark)

    from dbeam_spark.queries import QUERIES

    for name in sp.ARTIFACT_WARM:
        if name in names:
            QUERIES[name](spark, sp.BASE).collect()
            QUERIES[name](spark, sp.OUT).collect()
            sp.drop_stream_sinks(spark)

    print(f"{'query':28s} {'sf0.1':>8s} {sp.COPIES:>6d}x {'ratio':>6s}"
          "  rows(big)", flush=True)
    for name in names:
        QUERIES[name](spark, "/root/testdata/sf0.001").collect()
        b, _ = sp.time_one(spark, sp.BASE, name)
        g, nrows = sp.time_one(spark, sp.OUT, name)
        ratio = g / b if b else float("nan")
        print(f"{name:28s} {b:8.2f} {g:8.2f} {ratio:6.1f}  {nrows}",
              flush=True)
        sp._update_scale_json(name, b, g, nrows, sp.COPIES)
    spark.stop()


if __name__ == "__main__":
    main()
