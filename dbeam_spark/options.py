"""Export options: the full dbeam CLI surface.

Re-expresses reference options/DBeamPipelineOptions.java,
options/JdbcExportPipelineOptions.java and options/OutputOptions.java
as one dataclass + argparse front-end, preserving every option name so
a dbeam invocation line works verbatim against our job
(`python -m dbeam_spark.jobs.jdbc_avro_job --connectionUrl=... --table=...`).
"""

from __future__ import annotations

import argparse
from dataclasses import dataclass, field

SUPPORTED_URL_PREFIXES = ("jdbc:postgresql:", "jdbc:mysql:", "jdbc:mariadb:", "jdbc:h2:", "jdbc:derby:")


@dataclass
class JdbcExportOptions:
    # DBeamPipelineOptions
    connectionUrl: str = ""
    table: str | None = None
    sqlFile: str | None = None
    username: str = "dbeam-extractor"
    password: str | None = None
    passwordFile: str | None = None
    passwordFileKmsEncrypted: str | None = None
    # OutputOptions
    output: str = ""
    dataOnly: bool = False
    # JdbcExportPipelineOptions
    avroCodec: str = "deflate6"
    avroDoc: str | None = None
    avroSchemaFilePath: str | None = None
    avroSchemaName: str | None = None
    avroSchemaNamespace: str = "dbeam_generated"
    exportTimeout: str = "P7D"
    fetchSize: int = 10000
    limit: int | None = None
    minPartitionPeriod: str | None = None
    minRows: int = -1
    partition: str | None = None
    partitionColumn: str | None = None
    partitionPeriod: str | None = None
    preCommand: list[str] = field(default_factory=list)
    queryParallelism: int | None = None
    skipPartitionCheck: bool = False
    splitColumn: str | None = None
    useAvroLogicalTypes: bool = False
    arrayMode: str = "typed_first_row"
    nullableArrayItems: bool = False
    # beyond reference: per-column stats metadata (A35)
    columnStats: bool = False
    # beyond reference: crash-resume — a rerun skips partitions whose
    # final part file already landed (tmp+rename makes them complete)
    resume: bool = False

    def validate(self) -> None:
        if not self.connectionUrl:
            raise ValueError("'connectionUrl' must be defined")
        if not self.connectionUrl.startswith(SUPPORTED_URL_PREFIXES):
            raise ValueError(
                "Invalid jdbc connection URL. "
                f"Expected one of {SUPPORTED_URL_PREFIXES}"
            )
        if bool(self.table) == bool(self.sqlFile):
            raise ValueError("Exactly one of --table / --sqlFile must be set")
        if (self.queryParallelism is None) != (self.splitColumn is None):
            raise ValueError(
                "Either both --queryParallelism and --splitColumn must be "
                "present or none of them"
            )
        if self.queryParallelism is not None and self.queryParallelism <= 0:
            raise ValueError("Query Parallelism must be a positive number")
        if self.partitionColumn and not self.partition:
            raise ValueError(
                "To use --partitionColumn the --partition parameter must "
                "also be configured"
            )
        if self.arrayMode not in ("bytes", "typed_first_row", "typed_postgres"):
            # ref options/ArrayHandlingMode.java:31-38 (same message)
            raise ValueError(
                f"Invalid value '{self.arrayMode}' for array handling "
                "mode. Allowed values: "
                "[bytes, typed_first_row, typed_postgres]"
            )


def _bool(v: str) -> bool:
    return str(v).lower() in ("1", "true", "yes")


def parse_args(argv: list[str]) -> JdbcExportOptions:
    p = argparse.ArgumentParser(prog="jdbc-avro-job", allow_abbrev=False)
    defaults = JdbcExportOptions()
    for f_name, f_def in defaults.__dataclass_fields__.items():
        default = getattr(defaults, f_name)
        if f_name == "preCommand":
            p.add_argument("--preCommand", action="append", default=[])
        elif isinstance(default, bool):
            # Beam PipelineOptions accepts both `--flag` and
            # `--flag=true|false` — mirror that
            p.add_argument(
                f"--{f_name}",
                type=_bool,
                default=default,
                nargs="?",
                const=True,
            )
        elif f_def.type in ("int", "int | None"):
            p.add_argument(f"--{f_name}", type=int, default=default)
        else:
            p.add_argument(f"--{f_name}", type=str, default=default)
    ns = p.parse_args(argv)
    opts = JdbcExportOptions(**vars(ns))
    opts.validate()
    return opts
