"""Avro → JDBC load job: the return leg of the export path.

The reference is export-only (jobs/JdbcAvroJob.java reads JDBC, writes
Avro); restoring an export into a database is left to other tools.
Here the same engine does both directions: read an export directory
(schema from `_AVRO_SCHEMA.avsc`, data from `part-*.avro`, distributed
one-file-per-task) and append/overwrite it into a JDBC table through
Spark's JDBC writer — each partition opens its own connection and
batch-inserts, so load parallelism = partition count, the mirror image
of the ranged-scan export.

CLI:
  python -m dbeam_spark.jobs.avro_load_job \
      --connectionUrl=jdbc:... --table=t --input=/exports/t \
      [--mode=append|overwrite] [--batchSize=10000]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

from pyspark.sql import SparkSession

from dbeam_spark.sources.avro import read_avro
from dbeam_spark.sources.jdbc import driver_for_url


def run_load(
    spark: SparkSession,
    input_dir: str,
    connection_url: str,
    table: str,
    username: str = "dbeam-extractor",
    password: str | None = None,
    mode: str = "append",
    batch_size: int = 10000,
) -> int:
    """Load an export directory into a JDBC table; returns row count."""
    src = Path(input_dir)
    if not (src / "_SUCCESS").exists():
        raise ValueError(
            f"{input_dir} has no _SUCCESS marker — refusing to load a "
            "possibly-incomplete export"
        )
    df = read_avro(spark, str(src))
    n = df.count()
    writer = (
        df.write.format("jdbc")
        .option("url", connection_url)
        .option("dbtable", table)
        .option("user", username)
        .option("batchsize", str(batch_size))
        .mode(mode)
    )
    if password:
        writer = writer.option("password", password)
    driver = driver_for_url(connection_url)
    if driver:
        writer = writer.option("driver", driver)
    writer.save()
    return n


def main(argv: list[str] | None = None) -> int:
    from dbeam_spark.errors import exit_code
    from dbeam_spark.session import get_spark

    args = {}
    for a in list(argv) if argv is not None else sys.argv[1:]:
        if a.startswith("--") and "=" in a:
            k, v = a[2:].split("=", 1)
            args[k] = v
    for req in ("connectionUrl", "table", "input"):
        if req not in args:
            print(f"--{req} is required")
            return 43
    spark = get_spark("dbeam-avro-load")
    try:
        n = run_load(
            spark,
            args["input"],
            args["connectionUrl"],
            args["table"],
            username=args.get("username", "dbeam-extractor"),
            password=args.get("password"),
            mode=args.get("mode", "append"),
            batch_size=int(args.get("batchSize", "10000")),
        )
        print(json.dumps({"rowsLoaded": n, "table": args["table"]}))
        return 0
    except Exception as exc:  # noqa: BLE001 — CLI boundary, map to exit codes
        print(f"avro load failed: {exc}")
        return exit_code(exc)


if __name__ == "__main__":
    raise SystemExit(main())
