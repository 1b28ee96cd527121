"""Schema-drift checker between two export runs (A34).

A daily dbeam-style export pipeline breaks consumers silently when the
upstream table changes shape: a dropped column crashes readers without
defaults, an int→string flip corrupts typed loads. The reference
surfaces schema only as `_AVRO_SCHEMA.avsc` metadata per run
(reference `jobs/JdbcAvroJob.java:86-99` writes it; nothing compares
runs). This job closes that loop: given two export directories (or two
parsed Avro record schemas), classify every field change under Avro's
schema-resolution rules — can a reader holding the NEW schema still
read data files written with the OLD one?

Classification per Avro spec (schema resolution):
- field present in both, same type           -> unchanged
- field type promoted (int→long→float→double,
  string→bytes/bytes→string, widened null-union) -> promoted (ok)
- field added WITH a default                 -> added_with_default (ok)
- field added WITHOUT a default              -> added_breaking
  (new reader cannot fill the field from old data)
- field removed                              -> removed (ok for the
  new reader — old-data values are simply skipped; flagged as
  `removed` so downstream column consumers can be audited)
- any other type change                      -> type_breaking

Exit contract mirrors the export jobs: compatible drift -> 0,
breaking drift -> 50 (FailedValidation, `errors.py` A24 mapping).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path

# Avro primitive promotions a reader may apply to writer data
# (Avro 1.11 spec, "Schema Resolution"): writer type -> allowed reader
# types (beyond identity).
_PROMOTIONS: dict[str, tuple[str, ...]] = {
    "int": ("long", "float", "double"),
    "long": ("float", "double"),
    "float": ("double",),
    "string": ("bytes",),
    "bytes": ("string",),
}


def _unpack(t) -> tuple[set[str], bool]:
    """Return (non-null branch names, nullable?) for a field type that
    is a primitive, a named/complex dict, or a ["null", T] union."""
    if isinstance(t, str):
        return {t}, False
    if isinstance(t, dict):
        # complex types compare by structural identity of (type, items/
        # values); logicalType annotations don't affect resolution
        base = t.get("type")
        if base == "array":
            return {f"array<{json.dumps(t.get('items'), sort_keys=True)}>"}, False
        if base == "map":
            return {f"map<{json.dumps(t.get('values'), sort_keys=True)}>"}, False
        return {str(base)}, False
    if isinstance(t, list):
        nullable = "null" in t
        names: set[str] = set()
        for b in t:
            if b == "null":
                continue
            bn, _ = _unpack(b)
            names |= bn
        return names, nullable
    return {str(t)}, False


def _compatible_type(old_t, new_t) -> str:
    """'same' | 'promoted' | 'breaking' for old writer vs new reader."""
    old_names, old_null = _unpack(old_t)
    new_names, new_null = _unpack(new_t)
    if old_names == new_names and old_null == new_null:
        return "same"
    if old_null and not new_null:
        # reader dropped nullability: old nulls become unreadable
        return "breaking"
    if old_names == new_names:
        return "promoted"  # only nullability widened
    if len(old_names) == 1 and len(new_names) == 1:
        o, n = next(iter(old_names)), next(iter(new_names))
        if n in _PROMOTIONS.get(o, ()):
            return "promoted"
    return "breaking"


@dataclass
class DriftReport:
    unchanged: list[str] = field(default_factory=list)
    promoted: list[tuple[str, str, str]] = field(default_factory=list)
    added_with_default: list[str] = field(default_factory=list)
    added_breaking: list[str] = field(default_factory=list)
    removed: list[str] = field(default_factory=list)
    type_breaking: list[tuple[str, str, str]] = field(default_factory=list)

    @property
    def compatible(self) -> bool:
        return not self.added_breaking and not self.type_breaking

    def to_dict(self) -> dict:
        return {
            "compatible": self.compatible,
            "unchanged": self.unchanged,
            "promoted": [
                {"field": f, "from": o, "to": n} for f, o, n in self.promoted
            ],
            "added_with_default": self.added_with_default,
            "added_breaking": self.added_breaking,
            "removed": self.removed,
            "type_breaking": [
                {"field": f, "from": o, "to": n}
                for f, o, n in self.type_breaking
            ],
        }


def _fields(schema: dict) -> dict[str, dict]:
    if schema.get("type") != "record":
        raise ValueError("schema drift expects Avro record schemas")
    return {f["name"]: f for f in schema.get("fields", [])}


def diff_schemas(old: dict, new: dict) -> DriftReport:
    """Classify field-level drift from `old` (writer) to `new`
    (reader) per Avro schema-resolution rules."""
    of, nf = _fields(old), _fields(new)
    rep = DriftReport()
    for name, f in nf.items():
        if name in of:
            verdict = _compatible_type(of[name]["type"], f["type"])
            o_s = json.dumps(of[name]["type"], sort_keys=True)
            n_s = json.dumps(f["type"], sort_keys=True)
            if verdict == "same":
                rep.unchanged.append(name)
            elif verdict == "promoted":
                rep.promoted.append((name, o_s, n_s))
            else:
                rep.type_breaking.append((name, o_s, n_s))
        elif "default" in f:
            rep.added_with_default.append(name)
        else:
            rep.added_breaking.append(name)
    for name in of:
        if name not in nf:
            rep.removed.append(name)
    return rep


def load_export_schema(export_dir: str) -> dict:
    p = Path(export_dir) / "_AVRO_SCHEMA.avsc"
    if not p.exists():
        raise FileNotFoundError(f"no _AVRO_SCHEMA.avsc under {export_dir}")
    return json.loads(p.read_text())


def check_export_drift(old_dir: str, new_dir: str) -> DriftReport:
    """Compare two export runs' schema metadata (old = prior run's
    writer schema, new = current run = the reader going forward)."""
    return diff_schemas(load_export_schema(old_dir), load_export_schema(new_dir))


def main(argv: list[str] | None = None) -> int:
    import argparse

    from dbeam_spark.errors import FailedValidationError, exit_code

    ap = argparse.ArgumentParser(
        description="Avro schema drift between two export runs"
    )
    ap.add_argument("old_dir")
    ap.add_argument("new_dir")
    args = ap.parse_args(argv)
    rep = check_export_drift(args.old_dir, args.new_dir)
    print(json.dumps(rep.to_dict(), indent=2))
    if not rep.compatible:
        return exit_code(FailedValidationError("incompatible schema drift"))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
