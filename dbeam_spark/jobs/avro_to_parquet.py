"""Avro export → Parquet lake conversion (A40).

dbeam's exports land as Avro OCF (the reference's only output format);
every downstream analytical consumer here wants parquet (column
pruning, predicate pushdown, page/row-group statistics — none of
which row-major Avro can offer a scan). This job converts an export
directory into a parquet dataset, optionally hive-partitioned, as one
distributed pass: Avro files read one-per-task (the same distributed
reader the load job uses), written through Spark's parquet sink so
every executor streams its own files — no driver materialization, no
shuffle unless a partition column is requested (then one exchange
clusters rows so each output partition is written once, not once per
input task).

CLI:
  python -m dbeam_spark.jobs.avro_to_parquet \
      --input=/exports/t --output=/lake/t \
      [--partitionBy=col] [--mode=overwrite|append]
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession

from dbeam_spark.sources.avro import read_avro


def run_convert(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    partition_by: str | None = None,
    mode: str = "overwrite",
) -> dict:
    """Convert an Avro export dir to parquet; returns {rows, files}."""
    df = read_avro(spark, input_dir)
    if partition_by is not None:
        if partition_by not in df.columns:
            raise ValueError(
                f"partition column {partition_by!r} not in export schema "
                f"{df.columns}"
            )
        # cluster rows so each hive partition is written by few tasks
        # (otherwise every input task opens a file in every partition)
        df.repartition(partition_by).write.mode(mode).partitionBy(
            partition_by
        ).parquet(output_dir)
    else:
        df.write.mode(mode).parquet(output_dir)
    out = spark.read.parquet(output_dir)
    return {"rows": out.count(), "files": len(out.inputFiles())}


def main(argv: list[str] | None = None) -> int:
    args = dict(
        a.split("=", 1) for a in (argv or sys.argv[1:]) if a.startswith("--")
    )
    input_dir = args.get("--input")
    output_dir = args.get("--output")
    if not input_dir or not output_dir:
        print("usage: --input=<export dir> --output=<parquet dir>")
        return 2
    spark = SparkSession.builder.getOrCreate()
    stats = run_convert(
        spark,
        input_dir,
        output_dir,
        partition_by=args.get("--partitionBy"),
        mode=args.get("--mode", "overwrite"),
    )
    print(stats)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
