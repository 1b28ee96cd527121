"""Whole-schema export: every table in the source database in ONE
run — table discovery via JDBC DatabaseMetaData, then the standard
per-table export (jobs/jdbc_avro_job.run_export) into
`<output>/<table>/`, with a fleet-level `_SCHEMA_METRICS.json` +
`_SUCCESS` at the root.

The reference runs one dbeam invocation per table (e2e/e2e.sh loops
in shell); this job is that loop as a first-class citizen: shared
SparkSession (one JVM spin-up, one connection-pool warmup), identical
per-table output layout (a user can point existing per-table
consumers at `<output>/<table>/` unchanged), and per-table isolation —
a failing table records its error and exit code without aborting the
remaining tables (`--failFast` restores abort semantics).

CLI:
  python -m dbeam_spark.jobs.schema_export \
      --connectionUrl=jdbc:postgresql://host/db --output=/path/out \
      [--tables=t1,t2] [--failFast] [any jdbc_avro_job flag]

Scale note: tables export SEQUENTIALLY, each using the full executor
fleet (queryParallelism governs the per-table JDBC split). At 100 TB
the biggest table dominates wall-clock either way; sequential keeps
source-DB connection pressure at one table's parallelism instead of
sum-of-all.
"""

from __future__ import annotations

import json
import sys
import time
from dataclasses import replace
from pathlib import Path

from pyspark.sql import SparkSession

from dbeam_spark.errors import exit_code
from dbeam_spark.jobs.jdbc_avro_job import run_export
from dbeam_spark.options import JdbcExportOptions, parse_args
from dbeam_spark.passwords import read_password
from dbeam_spark.sources.jdbc import list_tables


def run_schema_export(
    spark: SparkSession,
    opts: JdbcExportOptions,
    tables: list[str] | None = None,
    fail_fast: bool = False,
) -> dict:
    """Export every discovered (or named) table; returns the fleet
    report: per-table metrics/errors plus rollup counts."""
    out_root = Path(opts.output)
    out_root.mkdir(parents=True, exist_ok=True)
    if not tables:
        password = read_password(
            opts.password, opts.passwordFile, opts.passwordFileKmsEncrypted
        )
        tables = list_tables(
            spark, opts.connectionUrl, opts.username, password
        )
    if not tables:
        raise ValueError("no tables discovered to export")

    report: dict = {"tables": {}, "ok": 0, "failed": 0}
    t0 = time.monotonic()
    for table in tables:
        t_opts = replace(
            opts, table=table, output=str(out_root / table.lower())
        )
        try:
            metrics = run_export(spark, t_opts)
            report["tables"][table] = {"status": "ok", "metrics": metrics}
            report["ok"] += 1
        except Exception as e:  # noqa: BLE001 - per-table isolation
            report["tables"][table] = {
                "status": "failed",
                "error": f"{type(e).__name__}: {e}",
                "exit_code": exit_code(e),
            }
            report["failed"] += 1
            if fail_fast:
                break
    report["elapsed_sec"] = round(time.monotonic() - t0, 3)
    (out_root / "_SCHEMA_METRICS.json").write_text(
        json.dumps(report, indent=2, default=str)
    )
    if report["failed"] == 0:
        (out_root / "_SUCCESS").write_text("")
    return report


def main(argv: list[str] | None = None) -> int:
    from dbeam_spark.session import get_spark

    args = list(argv if argv is not None else sys.argv[1:])
    tables: list[str] | None = None
    fail_fast = False
    passthrough = []
    for a in args:
        if a.startswith("--tables="):
            tables = [t for t in a.split("=", 1)[1].split(",") if t]
        elif a == "--failFast":
            fail_fast = True
        else:
            passthrough.append(a)
    try:
        # table is per-iteration; satisfy the single-table validator
        # with a placeholder that run_schema_export always replaces
        opts = parse_args(passthrough + ["--table=placeholder"])
        spark = get_spark("dbeam-schema-export")
        report = run_schema_export(
            spark, opts, tables=tables, fail_fast=fail_fast
        )
    except Exception as e:  # noqa: BLE001 - CLI boundary
        print(f"Failure: {type(e).__name__}: {e}", file=sys.stderr)
        return exit_code(e)
    print(json.dumps(report, default=str))
    return 0 if report["failed"] == 0 else 49


if __name__ == "__main__":
    sys.exit(main())
