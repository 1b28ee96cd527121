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


def read_avro_file(path: str) -> tuple[dict, list[tuple]]:
    """Read one OCF file → (schema, rows)."""
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
        for _ in range(count):
            rows.append(tuple(d(block) for d in decoders))
    return schema, rows


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
