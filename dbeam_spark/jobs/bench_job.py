"""Benchmark variant of the export job.

Re-expresses reference jobs/BenchJdbcAvroJob.java: run the same export
`--executions` times into numbered subfolders and report per-run and
aggregate metrics (the reference prints Beam metrics per run; we emit
one JSON object).
"""

from __future__ import annotations

import json
import statistics
import sys
from dataclasses import replace

from pyspark.sql import SparkSession

from dbeam_spark.jobs.jdbc_avro_job import run_export
from dbeam_spark.options import JdbcExportOptions, parse_args


def run_bench(
    spark: SparkSession, opts: JdbcExportOptions, executions: int = 3
) -> dict:
    runs = []
    for i in range(executions):
        run_opts = replace(opts, output=f"{opts.output.rstrip('/')}/run_{i}")
        runs.append(run_export(spark, run_opts))
    elapsed = [r["writeElapsedMs"] for r in runs]
    return {
        "executions": executions,
        "recordCount": runs[0]["recordCount"],
        "writeElapsedMs": elapsed,
        "meanWriteElapsedMs": round(statistics.mean(elapsed), 1),
        "minWriteElapsedMs": min(elapsed),
        "runs": runs,
    }


def main(argv: list[str] | None = None) -> int:
    from dbeam_spark.session import get_spark

    argv = list(argv if argv is not None else sys.argv[1:])
    executions = 3
    for a in list(argv):
        if a.startswith("--executions="):
            executions = int(a.split("=", 1)[1])
            argv.remove(a)
    opts = parse_args(argv)
    print(json.dumps(run_bench(get_spark("dbeam-bench"), opts, executions)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
