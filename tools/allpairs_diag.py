"""Stage decomposition of the exact-Jaccard AllPairs tier across the
uniform replica decades (r8 judge directive #4): dedup_survivorship
(b=1.22), training_corpus (b=1.17) and dedup_clusters (b=1.08) all
share ngram_jaccard_pairs' candidate stage, and the verdict suspects
candidate volume grows with corpus DENSITY the way interval matches
did in r7. This tool MEASURES the grain instead of asserting it:
per replica size, the deterministic stage counts

  shingle rows -> prefix rows -> prefix-join candidates (pre/post
  the PPJoin positional bound) -> verified pairs

plus each stage's wall, written to SCALE.json["allpairs_stages"].
A super-linear candidate count between decades NAMES the super-linear
grain; a linear one moves the suspicion to sort/shuffle constants.

Usage: python tools/allpairs_diag.py [--copies 10,30,100]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tools.scale_probe as sp
import tools.skew_probe as skp


def main() -> None:
    copies = [10, 30, 100]
    if "--copies" in sys.argv:
        copies = [
            int(c)
            for c in sys.argv[sys.argv.index("--copies") + 1].split(",")
        ]

    from dbeam_spark.session import get_spark

    spark = get_spark(
        "allpairs-diag", extra_conf={"spark.driver.memory": "24g"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    blocks: dict = {}
    for c in copies:
        d = f"/tmp/scale{c}"
        if not os.path.exists(os.path.join(d, "documents.parquet")):
            print(f"skip {c}x: {d} missing (build via scale_probe)")
            continue
        t0 = time.monotonic()
        stats = skp.shingle_cap_stats(spark, data_dir=d)
        stats["wall_counts_s"] = round(time.monotonic() - t0, 1)
        # verified-pair stage wall at tau=0.5 (the tier the three
        # queries consume), timed separately from the counts above
        from dbeam_spark.operators.dedup import ngram_jaccard_pairs
        from dbeam_spark.sources.files import load_table

        t0 = time.monotonic()
        n_pairs = ngram_jaccard_pairs(
            load_table(spark, d, "documents"), 0.5
        ).count()
        stats["pairs_tau05"] = {
            "n": n_pairs, "wall_s": round(time.monotonic() - t0, 1),
        }
        sp.drop_stream_sinks(spark)
        blocks[f"{c}x"] = stats
        print(f"{c}x: {json.dumps(stats)}", flush=True)

    data = {}
    if os.path.exists(sp.SCALE_JSON):
        with open(sp.SCALE_JSON) as fh:
            data = json.load(fh)
    merged = data.get("allpairs_stages") or {}
    merged.update(blocks)
    data["allpairs_stages"] = merged
    tmp = sp.SCALE_JSON + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(data, fh, indent=1, sort_keys=True)
    os.replace(tmp, sp.SCALE_JSON)
    print("allpairs_stages written to SCALE.json")


if __name__ == "__main__":
    main()
