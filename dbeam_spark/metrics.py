"""Export metering.

Re-expresses reference avro/JdbcAvroMetering.java and
beam/MetricsHelper.java: the same metric names (recordCount,
writeElapsedMs, msPerMillionRows, rowsPerMinute, bytesWritten,
executeQueryElapsedMs) land in `_METRICS.json` so dashboards built on
dbeam's metrics keep working.

In Spark the per-record counter loop disappears: counts come from
Spark accumulators / the written files themselves, aggregated once per
partition instead of per row.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from pathlib import Path


@dataclass
class ExportMetrics:
    record_count: int = 0
    bytes_written: int = 0
    execute_query_elapsed_ms: int = 0
    write_elapsed_ms: int = 0
    _start_ns: int | None = field(default=None, repr=False)

    def start_write_meter(self) -> None:
        self._start_ns = time.monotonic_ns()

    def expose_execute_query_ms(self, elapsed_ms: int) -> None:
        self.execute_query_elapsed_ms += elapsed_ms

    def expose_written(self, records: int, nbytes: int) -> None:
        self.record_count += records
        self.bytes_written += nbytes

    def expose_write_elapsed(self) -> None:
        if self._start_ns is None:
            return
        self.write_elapsed_ms += (time.monotonic_ns() - self._start_ns) // 1_000_000

    def to_dict(self) -> dict[str, int]:
        out = {
            "recordCount": self.record_count,
            "writeElapsedMs": self.write_elapsed_ms,
            "executeQueryElapsedMs": self.execute_query_elapsed_ms,
            "bytesWritten": self.bytes_written,
        }
        if self.record_count > 0 and self.write_elapsed_ms > 0:
            # same derived gauges as JdbcAvroMetering.exposeWriteElapsed
            out["msPerMillionRows"] = (
                1_000_000 * self.write_elapsed_ms // self.record_count
            )
            out["rowsPerMinute"] = (
                60 * 1000 * self.record_count // self.write_elapsed_ms
            )
        return out

    def save(self, output_dir: str) -> None:
        # record the engine version alongside the metering gauges, the
        # role DBeamVersion plays in the reference (JdbcAvroJob.java:
        # configureVersion)
        from dbeam_spark import __version__

        out = {"engineVersion": __version__, **self.to_dict()}
        path = Path(output_dir) / "_METRICS.json"
        path.write_text(json.dumps(out, indent=2) + "\n")


def collect_column_stats(df) -> dict:
    """Per-column export statistics in ONE aggregate pass:
    null_count, min, max, approx distinct (HLL) — the
    Delta/Iceberg-style file-level metadata that lets consumers
    validate an export (and planners prune) without re-scanning it.
    All aggregates are map-side-combinable, so the pass costs one
    scan + a 1-row reduce at any scale.

    Values are JSON-sanitized: native for bool/int/float, ISO text
    for timestamps/dates, str() for anything else."""
    from pyspark.sql import functions as F

    def _j(v):
        if v is None or isinstance(v, (bool, int, float, str)):
            return v
        try:
            return v.isoformat()
        except AttributeError:
            return str(v)

    aggs = [F.count(F.lit(1)).alias("__rows")]
    for f in df.schema.fields:
        c = f.name
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}\x1fnulls"),
            F.min(c).alias(f"{c}\x1fmin"),
            F.max(c).alias(f"{c}\x1fmax"),
            F.approx_count_distinct(c).alias(f"{c}\x1fdistinct"),
        ]
    row = df.agg(*aggs).collect()[0].asDict()
    out = {"row_count": row["__rows"], "columns": {}}
    for f in df.schema.fields:
        c = f.name
        out["columns"][c] = {
            "type": f.dataType.simpleString(),
            "null_count": row[f"{c}\x1fnulls"] or 0,
            "min": _j(row[f"{c}\x1fmin"]),
            "max": _j(row[f"{c}\x1fmax"]),
            "approx_distinct": row[f"{c}\x1fdistinct"],
        }
    return out
