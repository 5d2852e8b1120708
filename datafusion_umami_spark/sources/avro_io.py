"""Minimal Apache Avro Object Container File writer/reader (pure Python).

Parity target: the reference ships a native Avro datasource
(reference datasource-avro/src/file_format.rs:90, avro_to_arrow/).  The
usual Spark answer is the `spark-avro` package, but that jar is not
available in this offline environment and neither is `fastavro`, so this
module implements the (public, Apache Avro 1.11 specification) container
format directly for the primitive types the test tables need:

  long / double / string / boolean / bytes, each nullable via the
  standard ["null", T] union.

Encoding rules (Avro spec "Binary encoding"):
  - long/int: zigzag then base-128 varint, little-endian groups;
  - double: 8-byte IEEE-754 little-endian;
  - string/bytes: long(length) + payload;
  - boolean: single byte 0/1;
  - union: long(branch index) + encoded value;
  - container: magic `Obj\\x01`, metadata map (avro.schema JSON,
    avro.codec null), 16-byte sync marker, then blocks of
    (long row-count, long byte-length, rows..., sync marker).

Driver-side only (like the Arrow-IPC shim in sources_sinks): fine for
dimension-sized data; a 100 TB deployment would use the spark-avro
datasource (executor-parallel splits) — the query layer is unchanged
either way.
"""

from __future__ import annotations

import io
import json
import struct
from collections.abc import Iterable, Sequence

_MAGIC = b"Obj\x01"
_SYNC = bytes(range(16))  # any 16 bytes; fixed for deterministic files
_BLOCK_ROWS = 4096

AvroType = str  # "long" | "double" | "string" | "boolean" | "bytes"
_SUPPORTED = {"long", "double", "string", "boolean", "bytes"}


# --- primitive encoders -----------------------------------------------------
def _write_long(buf: io.BytesIO, n: int) -> None:
    z = (n << 1) ^ (n >> 63)  # zigzag (python's >> is arithmetic)
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes((b | 0x80,)))
        else:
            buf.write(bytes((b,)))
            return


def _write_bytes(buf: io.BytesIO, data: bytes) -> None:
    _write_long(buf, len(data))
    buf.write(data)


def _write_value(buf: io.BytesIO, typ: AvroType, v: object) -> None:
    # nullable union ["null", typ]: branch 0 = null, 1 = value
    if v is None:
        _write_long(buf, 0)
        return
    _write_long(buf, 1)
    if typ == "long":
        _write_long(buf, int(v))
    elif typ == "double":
        buf.write(struct.pack("<d", float(v)))
    elif typ == "string":
        _write_bytes(buf, str(v).encode("utf-8"))
    elif typ == "bytes":
        _write_bytes(buf, bytes(v))
    elif typ == "boolean":
        buf.write(b"\x01" if v else b"\x00")
    else:  # pragma: no cover
        raise ValueError(f"unsupported avro type {typ!r}")


# --- primitive decoders -----------------------------------------------------
class _Reader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def read(self, n: int) -> bytes:
        out = self.data[self.pos : self.pos + n]
        if len(out) != n:
            raise EOFError("truncated avro file")
        self.pos += n
        return out

    def read_long(self) -> int:
        shift = 0
        z = 0
        while True:
            (b,) = self.read(1)
            z |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (z >> 1) ^ -(z & 1)  # un-zigzag

    def read_value(self, typ: AvroType) -> object:
        branch = self.read_long()
        if branch == 0:
            return None
        if typ == "long":
            return self.read_long()
        if typ == "double":
            return struct.unpack("<d", self.read(8))[0]
        if typ == "string":
            return self.read(self.read_long()).decode("utf-8")
        if typ == "bytes":
            return self.read(self.read_long())
        if typ == "boolean":
            return self.read(1) == b"\x01"
        raise ValueError(f"unsupported avro type {typ!r}")  # pragma: no cover


# --- container file ---------------------------------------------------------
def write_avro(
    path: str,
    fields: Sequence[tuple[str, AvroType]],
    rows: Iterable[Sequence[object]],
    record_name: str = "row",
) -> None:
    """Write rows (sequences matching `fields` order) as an Avro OCF with
    every column nullable."""
    for _, t in fields:
        if t not in _SUPPORTED:
            raise ValueError(f"unsupported avro type {t!r}")
    schema = {
        "type": "record",
        "name": record_name,
        "fields": [{"name": n, "type": ["null", t]} for n, t in fields],
    }
    with open(path, "wb") as f:
        f.write(_MAGIC)
        meta = io.BytesIO()
        _write_long(meta, 2)  # metadata map: one block of 2 entries
        _write_bytes(meta, b"avro.schema")
        _write_bytes(meta, json.dumps(schema).encode("utf-8"))
        _write_bytes(meta, b"avro.codec")
        _write_bytes(meta, b"null")
        _write_long(meta, 0)  # end of map
        f.write(meta.getvalue())
        f.write(_SYNC)

        block: list[Sequence[object]] = []

        def flush() -> None:
            if not block:
                return
            body = io.BytesIO()
            for row in block:
                for (_, typ), v in zip(fields, row):
                    _write_value(body, typ, v)
            head = io.BytesIO()
            _write_long(head, len(block))
            _write_long(head, body.tell())
            f.write(head.getvalue())
            f.write(body.getvalue())
            f.write(_SYNC)
            block.clear()

        for row in rows:
            block.append(row)
            if len(block) >= _BLOCK_ROWS:
                flush()
        flush()


def read_avro(path: str) -> tuple[list[tuple[str, AvroType]], list[tuple]]:
    """Read an OCF written by `write_avro` (null codec, nullable
    primitives). Returns (fields, rows)."""
    with open(path, "rb") as f:
        r = _Reader(f.read())
    if r.read(4) != _MAGIC:
        raise ValueError("not an avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        n = r.read_long()
        if n == 0:
            break
        if n < 0:  # negative count: block byte size follows once
            n = -n
            r.read_long()
        for _ in range(n):
            key = r.read(r.read_long()).decode("utf-8")
            meta[key] = r.read(r.read_long())
    codec = meta.get("avro.codec", b"null")
    if codec != b"null":
        raise ValueError(f"unsupported codec {codec!r}")
    schema = json.loads(meta["avro.schema"])
    fields: list[tuple[str, AvroType]] = []
    for fld in schema["fields"]:
        t = fld["type"]
        # only ["null", T] unions are supported: read_value always
        # consumes a branch index, so a plain (non-union) field would
        # silently decode from shifted offsets — fail loudly instead
        if not (isinstance(t, list) and len(t) == 2 and t[0] == "null"):
            raise ValueError(
                f"unsupported avro field type {t!r} for {fld['name']!r}: "
                "only nullable [\"null\", T] unions are supported"
            )
        typ = t[1]
        if typ not in _SUPPORTED:
            raise ValueError(f"unsupported avro type {typ!r}")
        fields.append((fld["name"], typ))
    sync = r.read(16)
    rows: list[tuple] = []
    while r.pos < len(r.data):
        count = r.read_long()
        # Object Container File data blocks always carry a non-negative
        # count (negative counts exist only in array/map block encodings);
        # a negative value here means corruption — fail loudly rather
        # than deserializing |count| records from arbitrary bytes
        if count < 0:
            raise ValueError(f"corrupt avro data block: negative count {count}")
        r.read_long()  # block byte length (unused: null codec)
        for _ in range(count):
            rows.append(tuple(r.read_value(typ) for _, typ in fields))
        if r.read(16) != sync:
            raise ValueError("sync marker mismatch (corrupt block)")
    return fields, rows
