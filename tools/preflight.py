"""Round-start preflight: detect testdata regeneration drift BEFORE
chasing phantom bugs.

The driver regenerates /root/testdata between rounds and has already
changed physical types once (events.ts went TIMESTAMP(NANOS) →
micros TIMESTAMP_NTZ between r1 and r2 — 18 queries went red
overnight from the data alone). This script reads every table's
parquet schema at all three SFs and diffs it against the expected
shape: hard-fails on missing/renamed columns, warns on type changes
(the loaders normalize the known-variant ones).

Usage: python tools/preflight.py   # exit 0 clean, 1 on hard drift
"""

from __future__ import annotations

import sys

import pyarrow.parquet as pq

EXPECTED = {
    "region": ["r_regionkey", "r_name"],
    "nation": ["n_nationkey", "n_name", "n_regionkey"],
    "customer": ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    "supplier": ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
    "part": ["p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"],
    "orders": ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"],
    "events": ["event_id", "ts", "user_id", "event_type", "value", "props"],
    "documents": ["doc_id", "text", "lang", "source", "n_chars"],
    "embeddings": ["vec_id", "embedding", "label"],
}

# columns whose physical type is KNOWN to vary by generator version;
# sources/files.load_table normalizes them — type changes here are
# informational, not failures
TYPE_VARIANT = {("events", "ts")}


def check_probe_replicas(
    pattern: str | None = None, base: str | None = None
) -> int:
    """Hard-fail on STALE scale-probe replicas: a replica directory
    whose `_SOURCE_KEY` is missing or doesn't match the live source
    signature was built from last round's (regenerated) testdata —
    probing it would quietly flatten every ratio. scale_probe rebuilds
    on mismatch itself; this check catches replicas created or kept by
    any other path. Returns the number of stale replicas found."""
    import glob
    import os
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scale_probe import source_key

    base = base or os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    pattern = pattern or os.environ.get(
        "SCALE_REPLICA_GLOB", "/tmp/scale*"
    )
    want = source_key(base)
    stale = 0
    for d in sorted(glob.glob(pattern)):
        if not os.path.isdir(d) or not os.path.exists(
            os.path.join(d, "lineitem.parquet")
        ):
            continue
        key_file = os.path.join(d, "_SOURCE_KEY")
        have = open(key_file).read() if os.path.exists(key_file) else None
        if have != want:
            print(
                f"HARD  probe replica {d} is STALE vs {base} "
                "(missing/mismatched _SOURCE_KEY) — delete it or rerun "
                "tools/scale_probe.py (it rebuilds on mismatch)"
            )
            stale += 1
    if not stale:
        print("ok    probe replicas: none stale")
    return stale


def main() -> int:
    hard = 0
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        for table, want in EXPECTED.items():
            path = f"/root/testdata/{sf}/{table}.parquet"
            try:
                schema = pq.read_schema(path)
            except Exception as e:  # noqa: BLE001
                print(f"HARD  {sf}/{table}: unreadable: {e}")
                hard += 1
                continue
            have = {f.name: str(schema.field(f.name).type) for f in schema}
            missing = [c for c in want if c not in have]
            extra = [c for c in have if c not in want]
            if missing:
                print(f"HARD  {sf}/{table}: missing columns {missing}")
                hard += 1
            if extra:
                print(f"info  {sf}/{table}: new columns {extra}")
        # row-count sanity on the anchor table
        n = pq.ParquetFile(f"/root/testdata/{sf}/documents.parquet").metadata.num_rows
        print(f"ok    {sf}: schemas checked, documents rows={n}")
    ts_types = {
        sf: str(
            pq.read_schema(f"/root/testdata/{sf}/events.parquet").field("ts").type
        )
        for sf in ("sf0.001", "sf0.01", "sf0.1")
    }
    print(f"info  events.ts physical types (loader-normalized): {ts_types}")
    hard += check_probe_replicas()
    if hard:
        print(f"\n{hard} HARD drift(s) — fix loaders/queries before gating")
        return 1
    print("\npreflight clean")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
