"""Demonstrate bench.py's host-calibration: run the calibration
kernels plus a few headline queries and print raw vs host-normalized
seconds. Run once normally and once under a synthetic slowdown, e.g.

    python tools/calib_demo.py
    taskset -c 0-15 python tools/calib_demo.py   # ~2x CPU contention

The claim being demonstrated (round-7 directive #2): a host slowdown
moves every RAW key together AND moves host_factor by the same
ratio, so the NORMALIZED keys stay within the same-host spread —
which is what makes BENCH_r{N} totals comparable across rounds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEMO_KEYS = [
    "q1_pricing_summary",
    "q5_local_supplier_volume",
    "q21_waiting_suppliers",
    "dedup_minhash_lsh",
]


def main() -> None:
    import bench
    from dbeam_spark.queries import QUERIES
    from dbeam_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("calib-demo")
    spark.sparkContext.setLogLevel("ERROR")
    calibration = bench.run_calibration(spark)
    # same hygiene as bench.py: untimed warm pass per key
    for name in DEMO_KEYS:
        QUERIES[name](spark, sf_dir).collect()
    raw: dict[str, float] = {}
    calib_reads: list[float] = []
    for _ in range(3):
        # interleave the kernel with the keys so factor and keys
        # sample the same load window (mirrors bench.py)
        calib_reads.append(round(bench.calib_spark_once(spark), 3))
        for name in DEMO_KEYS:
            t0 = time.monotonic()
            QUERIES[name](spark, sf_dir).collect()
            el = round(time.monotonic() - t0, 3)
            raw[name] = min(raw.get(name, el), el)
    calibration["spark_sec_interleaved"] = min(calib_reads)
    calibration["host_factor"] = round(
        min(calib_reads) / bench.CALIB_NOMINAL_SPARK_SEC, 3
    )
    factor = calibration["host_factor"]
    print(json.dumps({
        "cpus_visible": len(os.sched_getaffinity(0)),
        "calibration": calibration,
        "raw": raw,
        "raw_total": round(sum(raw.values()), 3),
        "normalized": {k: round(v / factor, 3) for k, v in raw.items()},
        "normalized_total": round(sum(raw.values()) / factor, 3),
    }))


if __name__ == "__main__":
    main()
