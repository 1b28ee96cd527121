"""Minimal Avro OCF reader (pure Python) — the inverse of writer.py.

Used by tests to round-trip exported files and by `read_avro` to load
Avro exports back into Spark (distributed: one task per file).
Supports the writer's output surface: null/deflate codecs, primitive
types, arrays, ["null", T] unions.
"""

from __future__ import annotations

import io
import json
import struct
import zlib


def _read_long(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        b = buf.read(1)[0]
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _read_bytes(buf: io.BytesIO) -> bytes:
    return buf.read(_read_long(buf))


def _read_str(buf: io.BytesIO) -> str:
    return _read_bytes(buf).decode("utf-8")


def _make_decoder(avro_type):
    t = avro_type
    if isinstance(t, dict) and "logicalType" in t:
        t = t["type"]
    if isinstance(t, list):  # union — assume ["null", T]
        inner = _make_decoder(t[1])

        def dec_union(buf):
            return None if _read_long(buf) == 0 else inner(buf)

        return dec_union
    if isinstance(t, dict) and t.get("type") == "array":
        item = _make_decoder(t["items"])

        def dec_array(buf):
            out = []
            while True:
                n = _read_long(buf)
                if n == 0:
                    return out
                if n < 0:
                    _read_long(buf)  # block byte size, unused
                    n = -n
                out.extend(item(buf) for _ in range(n))

        return dec_array
    if t in ("long", "int"):
        return _read_long
    if t == "double":
        return lambda buf: struct.unpack("<d", buf.read(8))[0]
    if t == "float":
        return lambda buf: struct.unpack("<f", buf.read(4))[0]
    if t == "boolean":
        return lambda buf: buf.read(1) == b"\x01"
    if t == "bytes":
        return _read_bytes
    if t == "string":
        return _read_str
    raise ValueError(f"Unsupported Avro type: {avro_type!r}")


def _plain_type(t):
    if isinstance(t, dict) and "logicalType" in t:
        t = t["type"]
    if isinstance(t, list):  # ["null", T]
        return _plain_type(t[1])
    if isinstance(t, dict) and t.get("type") == "array":
        return "array"
    return t


# Avro spec schema-resolution promotions (writer type → allowed
# reader types, with the python-side converter applied post-decode)
_PROMOTIONS = {
    ("int", "long"): None,
    ("int", "float"): float,
    ("int", "double"): float,
    ("long", "float"): float,
    ("long", "double"): float,
    ("float", "double"): None,  # python float already
    ("string", "bytes"): lambda v: v.encode("utf-8"),
    ("bytes", "string"): lambda v: v.decode("utf-8"),
}


def _resolve(writer_fields: list, reader_fields: list):
    """Avro schema resolution (spec §Schema Resolution): match fields
    by name; writer-only fields are decoded and DISCARDED (their bytes
    must still be consumed); reader-only fields take their declared
    default (error if none — exactly the spec's failure mode); matched
    fields decode with the WRITER type and promote to the reader type
    where the spec allows. Returns (per-writer-field actions, output
    arity, defaults-by-slot)."""
    reader_slots = {f["name"]: i for i, f in enumerate(reader_fields)}
    actions = []
    for wf in writer_fields:
        dec = _make_decoder(wf["type"])
        slot = reader_slots.get(wf["name"])
        conv = None
        if slot is not None:
            wt, rt = _plain_type(wf["type"]), _plain_type(
                reader_fields[slot]["type"]
            )
            if wt != rt:
                if (wt, rt) not in _PROMOTIONS:
                    raise ValueError(
                        f"cannot resolve field {wf['name']!r}: "
                        f"writer {wt} → reader {rt}"
                    )
                conv = _PROMOTIONS[(wt, rt)]
        actions.append((dec, slot, conv))
    defaults: dict[int, object] = {}
    writer_names = {f["name"] for f in writer_fields}
    for i, rf in enumerate(reader_fields):
        if rf["name"] not in writer_names:
            if "default" not in rf:
                raise ValueError(
                    f"reader field {rf['name']!r} absent from writer "
                    "schema and has no default"
                )
            defaults[i] = rf["default"]
    return actions, len(reader_fields), defaults


def read_avro_file(
    path: str, reader_schema: dict | None = None
) -> tuple[dict, list[tuple]]:
    """Read one OCF file → (schema, rows).

    With ``reader_schema``, rows are returned in the READER's shape
    under the Avro spec's schema-resolution rules — new fields fill
    from their defaults, dropped fields are skipped, and the spec's
    numeric/string promotions apply (the contract that lets a consumer
    evolve its schema while reading years of old exports; reference
    dbeam consumers rely on the same Java Avro behavior)."""
    with open(path, "rb") as fh:
        raw = fh.read()
    buf = io.BytesIO(raw)
    assert buf.read(4) == b"Obj\x01", "not an Avro OCF"
    meta: dict[str, bytes] = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:
            _read_long(buf)
            n = -n
        for _ in range(n):
            key = _read_str(buf)
            meta[key] = _read_bytes(buf)
    sync = buf.read(16)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if reader_schema is not None:
        actions, arity, defaults = _resolve(
            schema["fields"], reader_schema["fields"]
        )
    else:
        decoders = [_make_decoder(f["type"]) for f in schema["fields"]]
    rows: list[tuple] = []
    while buf.tell() < len(raw):
        count = _read_long(buf)
        size = _read_long(buf)
        data = buf.read(size)
        if codec == "deflate":
            data = zlib.decompress(data, -15)
        elif codec == "bzip2":
            import bz2

            data = bz2.decompress(data)
        elif codec == "xz":
            import lzma

            data = lzma.decompress(data)
        elif codec == "snappy":
            import pyarrow as pa

            # block = raw snappy + 4-byte BE CRC32 of the uncompressed
            # data; raw snappy leads with the uncompressed size varint.
            body, crc = data[:-4], data[-4:]
            usize, shift, pos = 0, 0, 0
            while True:
                b = body[pos]
                usize |= (b & 0x7F) << shift
                pos += 1
                if not b & 0x80:
                    break
                shift += 7
            data = pa.Codec("snappy").decompress(
                body, decompressed_size=usize, asbytes=True
            )
            if struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF) != crc:
                raise ValueError("snappy block CRC mismatch")
        elif codec == "zstandard":
            import pyarrow as pa

            # Frame content size may be absent from the header, so use
            # pyarrow's streaming decompressor instead of Codec.
            data = pa.input_stream(
                pa.BufferReader(data), compression="zstd"
            ).read()
        elif codec != "null":
            raise ValueError(f"Unsupported avro codec: {codec}")
        assert buf.read(16) == sync, "sync marker mismatch"
        block = io.BytesIO(data)
        if reader_schema is not None:
            for _ in range(count):
                out = [None] * arity
                for i, v in defaults.items():
                    out[i] = v
                for dec, slot, conv in actions:
                    v = dec(block)
                    if slot is not None:
                        out[slot] = (
                            conv(v) if conv is not None and v is not None
                            else v
                        )
                rows.append(tuple(out))
        else:
            for _ in range(count):
                rows.append(tuple(d(block) for d in decoders))
    return (reader_schema if reader_schema is not None else schema), rows


def count_ocf_rows(path: str) -> int:
    """Row count from BLOCK HEADERS only — each OCF block leads with
    (row count, byte size) varints, so counting skips every payload
    byte (no decompression, no decoding). Used by resumable exports
    to credit already-landed files into the metrics at ~disk-seek
    cost. Raises on a malformed/truncated container, so a partial
    file (impossible under the writer's tmp+rename protocol, but
    cheap to defend against) is never silently counted."""
    with open(path, "rb") as fh:
        raw = fh.read()
    buf = io.BytesIO(raw)
    if buf.read(4) != b"Obj\x01":
        raise ValueError(f"not an Avro OCF: {path}")
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:
            _read_long(buf)
            n = -n
        for _ in range(n):
            _read_str(buf)
            _read_bytes(buf)
    sync = buf.read(16)
    total = 0
    while buf.tell() < len(raw):
        n_rows = _read_long(buf)
        size = _read_long(buf)
        if buf.seek(size, io.SEEK_CUR) > len(raw):
            raise ValueError(f"truncated OCF block in {path}")
        if buf.read(16) != sync:
            raise ValueError(f"sync marker mismatch in {path}")
        total += n_rows
    return total
