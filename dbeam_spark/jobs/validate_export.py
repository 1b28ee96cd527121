"""Standalone export validator (A37): re-verify an existing export
directory end-to-end, without the producing job.

The export layout (A11) carries everything needed to audit itself:
`_SUCCESS` (completion marker), `_AVRO_SCHEMA.avsc` (the contract),
`_METRICS.json` (claimed recordCount), and the OCF files. Consumers
routinely want this re-checked long after the export ran — before a
backfill replay, after a storage migration, when two teams disagree
about a number — so the validator is a job, not a test.

Checks, in dependency order (each failure short-circuits):
1. `_SUCCESS` exists (incomplete exports must never validate);
2. `_AVRO_SCHEMA.avsc` parses as an Avro record schema;
3. if `_CHECKSUMS.json` is present, every part file's CRC32 and size
   match the sidecar the writer computed as the bytes streamed out
   (bit-rot / truncated-copy detection, cheaper than a decode and
   able to catch flips the decoder tolerates);
4. every `part-*.avro` decodes, and its writer schema matches the
   published `_AVRO_SCHEMA.avsc` byte-for-byte after JSON
   normalization (a swapped/corrupted file fails here);
5. the decoded row count equals `_METRICS.json`'s recordCount;
6. (optional) `--minRows` floor on the recount.

Exit codes follow A24: clean = 0, any validation failure = 50
(FailedValidation), missing dir/files = 41 (IO).
"""

from __future__ import annotations

import glob
import json
import os
from dataclasses import dataclass, field


@dataclass
class ValidationReport:
    export_dir: str
    checks: list[dict] = field(default_factory=list)
    row_count: int | None = None

    def add(self, name: str, ok: bool, detail: str = "") -> bool:
        self.checks.append({"check": name, "ok": ok, "detail": detail})
        return ok

    @property
    def ok(self) -> bool:
        return all(c["ok"] for c in self.checks)

    def to_dict(self) -> dict:
        return {
            "export_dir": self.export_dir,
            "ok": self.ok,
            "row_count": self.row_count,
            "checks": self.checks,
        }


def validate_export(export_dir: str, min_rows: int = -1) -> ValidationReport:
    from dbeam_spark.avro.reader import read_avro_file

    rep = ValidationReport(export_dir)
    if not os.path.isdir(export_dir):
        raise FileNotFoundError(f"no such export dir: {export_dir}")

    if not rep.add(
        "success_marker",
        os.path.exists(os.path.join(export_dir, "_SUCCESS")),
        "_SUCCESS missing: export incomplete or failed validation",
    ):
        return rep

    schema_path = os.path.join(export_dir, "_AVRO_SCHEMA.avsc")
    published = None
    try:
        published = json.loads(open(schema_path).read())
        ok = published.get("type") == "record" and "fields" in published
        rep.add("schema_parses", ok, "" if ok else "not an Avro record schema")
    except (OSError, ValueError) as e:
        rep.add("schema_parses", False, f"{type(e).__name__}: {e}")
        return rep

    parts = sorted(glob.glob(os.path.join(export_dir, "part-*.avro")))
    if not rep.add("has_data_files", bool(parts), "no part-*.avro files"):
        return rep

    cks_path = os.path.join(export_dir, "_CHECKSUMS.json")
    if os.path.exists(cks_path):
        from dbeam_spark.avro.writer import file_crc32

        expected = json.loads(open(cks_path).read())
        bad = []
        for p in parts:
            name = os.path.basename(p)
            want = expected.get(name)
            if want is None:
                bad.append(f"{name}: not in _CHECKSUMS.json")
                continue
            got_crc = file_crc32(p)
            got_bytes = os.path.getsize(p)
            if got_crc != want["crc32"] or got_bytes != want["bytes"]:
                bad.append(
                    f"{name}: crc/bytes {got_crc}/{got_bytes}"
                    f" != recorded {want['crc32']}/{want['bytes']}"
                )
        missing = sorted(
            set(expected) - {os.path.basename(p) for p in parts}
        )
        for name in missing:
            bad.append(f"{name}: recorded but absent")
        rep.add(
            "file_checksums",
            not bad,
            "; ".join(bad) if bad else f"{len(parts)} files verified",
        )

    norm = json.dumps(published, sort_keys=True)
    total = 0
    for p in parts:
        try:
            writer_schema, rows = read_avro_file(p)
        except Exception as e:  # noqa: BLE001 - corrupt file is the finding
            rep.add("files_decode", False, f"{os.path.basename(p)}: {e}")
            return rep
        if json.dumps(writer_schema, sort_keys=True) != norm:
            rep.add(
                "writer_schema_matches",
                False,
                f"{os.path.basename(p)} written with a different schema",
            )
            return rep
        total += len(rows)
    rep.add("files_decode", True, f"{len(parts)} files")
    rep.add("writer_schema_matches", True)
    rep.row_count = total

    metrics_path = os.path.join(export_dir, "_METRICS.json")
    if os.path.exists(metrics_path):
        claimed = json.loads(open(metrics_path).read()).get("recordCount")
        rep.add(
            "row_count_matches_metrics",
            claimed == total,
            f"metrics={claimed} recount={total}",
        )
    if min_rows >= 0:
        rep.add("min_rows", total >= min_rows, f"{total} >= {min_rows}")
    return rep


def main(argv: list[str] | None = None) -> int:
    import argparse

    from dbeam_spark.errors import FailedValidationError, exit_code

    ap = argparse.ArgumentParser(description="validate an export directory")
    ap.add_argument("export_dir")
    ap.add_argument("--minRows", type=int, default=-1)
    args = ap.parse_args(argv)
    try:
        rep = validate_export(args.export_dir, args.minRows)
    except FileNotFoundError as e:
        print(f"Failure: {e}")
        return exit_code(IOError(str(e)))
    print(json.dumps(rep.to_dict(), indent=2))
    if not rep.ok:
        return exit_code(FailedValidationError("export validation failed"))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
