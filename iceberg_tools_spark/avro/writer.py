"""Pure-Python Avro object-container-file writer.

The encode half of the reader in ``reader.py`` — implemented from
the Avro 1.11 container-file and binary-encoding specification, not
a translation of the Java library. Driver-side only, by the same
argument as the reader: Iceberg manifests are KB–MB planning
metadata.

Primary consumer: synthetic manifest fixtures for bound-rendering
tests (VERDICT r3 #4 — float/double/decimal/date bounds end-to-end
through the manifest pipeline) and the maintenance planners' future
rewrite-manifest path. Deterministic by construction: the sync
marker derives from the schema text, so identical inputs produce
byte-identical files.
"""

from __future__ import annotations

import hashlib
import io
import json
import struct
import zlib
from collections.abc import Iterable
from typing import Any

from .reader import NAMED, PRIMITIVES, AvroError, _branch_for, _collect_named, _resolve

MAGIC = b"Obj\x01"


class _Encoder:
    """Avro binary encoder into an in-memory buffer."""

    def __init__(self) -> None:
        self.buf = io.BytesIO()

    def getvalue(self) -> bytes:
        return self.buf.getvalue()

    def zlong(self, v: int) -> None:
        acc = (v << 1) ^ (v >> 63) if v < 0 else (v << 1)
        while True:
            byte = acc & 0x7F
            acc >>= 7
            if acc:
                self.buf.write(bytes((byte | 0x80,)))
            else:
                self.buf.write(bytes((byte,)))
                break

    def boolean(self, v: bool) -> None:
        self.buf.write(b"\x01" if v else b"\x00")

    def float_(self, v: float) -> None:
        self.buf.write(struct.pack("<f", v))

    def double(self, v: float) -> None:
        self.buf.write(struct.pack("<d", v))

    def bytes_(self, v: bytes) -> None:
        self.zlong(len(v))
        self.buf.write(v)

    def string(self, v: str) -> None:
        self.bytes_(v.encode("utf-8"))


def encode_value(schema: Any, value: Any, enc: _Encoder, names: dict[str, Any]) -> None:
    """Encode one value of `schema` into the binary stream (the
    exact inverse of ``reader.decode_value``)."""
    schema = _resolve(schema, names)
    if isinstance(schema, str):
        if schema == "null":
            if value is not None:
                raise AvroError(f"null schema got {value!r}")
            return
        if schema == "boolean":
            enc.boolean(bool(value))
        elif schema in ("int", "long"):
            enc.zlong(int(value))
        elif schema == "float":
            enc.float_(float(value))
        elif schema == "double":
            enc.double(float(value))
        elif schema == "bytes":
            enc.bytes_(bytes(value))
        elif schema == "string":
            enc.string(value)
        else:
            raise AvroError(f"unsupported primitive {schema!r}")
        return
    if isinstance(schema, list):  # union: branch index then value
        branch = _branch_for(value, schema, names)
        enc.zlong(schema.index(branch))
        encode_value(branch, value, enc, names)
        return
    t = schema["type"]
    if t in PRIMITIVES:
        encode_value(t, value, enc, names)
        return
    if t == "record":
        for f in schema["fields"]:
            if f["name"] not in value and "default" in f:
                encode_value(f["type"], f["default"], enc, names)
            else:
                encode_value(f["type"], value[f["name"]], enc, names)
        return
    if t == "enum":
        enc.zlong(schema["symbols"].index(value))
        return
    if t == "fixed":
        if len(value) != int(schema["size"]):
            raise AvroError(f"fixed[{schema['size']}] got {len(value)} bytes")
        enc.buf.write(bytes(value))
        return
    if t == "array":
        if value:
            enc.zlong(len(value))
            for item in value:
                encode_value(schema["items"], item, enc, names)
        enc.zlong(0)
        return
    if t == "map":
        if value:
            enc.zlong(len(value))
            for k, v in value.items():
                enc.string(k)
                encode_value(schema["values"], v, enc, names)
        enc.zlong(0)
        return
    raise AvroError(f"unsupported schema {schema!r}")


def write_container(
    schema: Any, records: Iterable[Any], *, codec: str = "null"
) -> bytes:
    """Serialize records into one Avro object container file
    (single block; manifests are small). Deterministic: sync marker
    = md5(schema JSON), no randomness anywhere."""
    schema_json = json.dumps(schema, separators=(",", ":"), sort_keys=True)
    sync = hashlib.md5(schema_json.encode()).digest()
    names: dict[str, Any] = {}
    _collect_named(schema, names)

    body = _Encoder()
    count = 0
    for rec in records:
        encode_value(schema, rec, body, names)
        count += 1
    block = body.getvalue()
    if codec == "deflate":
        comp = zlib.compressobj(9, zlib.DEFLATED, -15)
        block = comp.compress(block) + comp.flush()
    elif codec != "null":
        raise AvroError(f"unsupported codec {codec!r}")

    out = _Encoder()
    out.buf.write(MAGIC)
    out.zlong(2)  # file-metadata map: 2 entries
    out.string("avro.schema")
    out.bytes_(schema_json.encode())
    out.string("avro.codec")
    out.bytes_(codec.encode())
    out.zlong(0)
    out.buf.write(sync)
    if count:
        out.zlong(count)
        out.zlong(len(block))
        out.buf.write(block)
        out.buf.write(sync)
    return out.getvalue()


__all__ = ["encode_value", "write_container", "_Encoder", "NAMED"]
