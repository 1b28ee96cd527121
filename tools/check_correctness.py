"""Local stand-in for the driver's correctness gate: run every
`queries()` entry on Spark and its `oracle_sql()` on DuckDB over the
same sf dir, compare row count, schema shape, and an order-insensitive
value hash.

Mirrors the driver's pandas canonicalization path: Spark results via
toPandas(), DuckDB via .df(), rows sorted with pandas sort_values and
cells stringified WITH their pandas dtype repr. That dtype sensitivity
is deliberate — e.g. an uncast DuckDB SUM(int) comes back HUGEINT →
float64 ("123.0") while Spark gives int64 ("123"), and the driver
flags exactly that, so we must too. Array-typed output columns make
sort_values raise (unhashable list) just like the driver's _canon.

Usage: python tools/check_correctness.py [sf_dir] [name ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb

sys.path.insert(0, ".")


def norm_cell(v) -> str:
    import datetime

    import pandas as pd

    if v is None:
        return "NULL"
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass  # arrays etc. — sort_values will have raised already
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        ts = pd.Timestamp(v)
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        return ts.isoformat()
    return str(v)


def canon_hash(pdf) -> str:
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
    lines = [
        "\x1f".join(norm_cell(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from dbeam_spark.session import get_spark
    from dbeam_spark.sources.files import TABLES

    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        el = time.time() - t0
        if name not in oracles:
            # rows-only queries still go through the driver's pandas
            # canonicalizer — make sure it doesn't choke (array cols).
            try:
                canon_hash(spdf)
            except Exception as e:
                print(f"FAIL {name}: rows-only canon error: {type(e).__name__}: {e}")
                failures.append(name)
                continue
            print(f"ok   {name}: rows-only rows={len(spdf)} ({el:.1f}s)")
            if len(spdf) == 0:
                print(f"WARN {name}: zero rows")
            continue
        try:
            opdf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        problems = []
        if len(spdf) != len(opdf):
            problems.append(f"rows {len(spdf)} vs {len(opdf)}")
        if sorted(spdf.columns) != sorted(opdf.columns):
            problems.append(
                f"cols {sorted(spdf.columns)} vs {sorted(opdf.columns)}"
            )
        else:
            try:
                sh, oh = canon_hash(spdf), canon_hash(opdf)
            except Exception as e:
                problems.append(f"canon error: {type(e).__name__}: {e}")
            else:
                if sh != oh:
                    problems.append("value-hash mismatch")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)} ({el:.1f}s)")
            failures.append(name)
        else:
            print(f"ok   {name}: rows={len(spdf)} hash match ({el:.1f}s)")
    n_run = len(only) if only else len(qs)
    print(f"\n{n_run - len(failures)}/{n_run} passing")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
