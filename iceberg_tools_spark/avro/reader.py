"""Pure-Python Avro object-container-file reader.

Driver-side only, by design: Iceberg manifest/metadata files are
KB-to-MB scale, so a dependency-free reader is the right tool — the
table DATA they describe is what Spark reads in parallel. Capability
parity with the reference's manifest-reading path
(`ManifestFileReadTool.java:130-159`, which delegates to Java Avro's
`DataFileStream`), implemented from the Avro 1.11 container-file and
binary-encoding specification — not a translation of that library.

Supported: null/deflate codecs (snappy gated on import), all Avro
types (record, enum, array, map, union, fixed, primitives), named-
type references, and reader-schema projection (drop extra fields,
fill defaults, int→long→float→double promotion).
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from collections.abc import Iterator
from typing import Any, BinaryIO

MAGIC = b"Obj\x01"
PRIMITIVES = frozenset(
    ("null", "boolean", "int", "long", "float", "double", "bytes", "string")
)
NAMED = frozenset(("record", "enum", "fixed"))


class AvroError(Exception):
    pass


class _Decoder:
    """Avro binary decoder over an in-memory buffer."""

    def __init__(self, data: bytes):
        self.buf = io.BytesIO(data)

    def read(self, n: int) -> bytes:
        b = self.buf.read(n)
        if len(b) != n:
            raise AvroError(f"unexpected EOF: wanted {n} bytes, got {len(b)}")
        return b

    def at_end(self) -> bool:
        pos = self.buf.tell()
        more = self.buf.read(1)
        self.buf.seek(pos)
        return not more

    def zlong(self) -> int:
        shift, acc = 0, 0
        while True:
            byte = self.read(1)[0]
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)

    def null(self) -> None:
        return None

    def boolean(self) -> bool:
        return self.read(1)[0] != 0

    def float_(self) -> float:
        return struct.unpack("<f", self.read(4))[0]

    def double(self) -> float:
        return struct.unpack("<d", self.read(8))[0]

    def bytes_(self) -> bytes:
        return self.read(self.zlong())

    def string(self) -> str:
        return self.bytes_().decode("utf-8")


def _collect_named(schema: Any, names: dict[str, Any], namespace: str = "") -> None:
    """Register named types (by full name AND simple name) so string
    references resolve."""
    if isinstance(schema, list):
        for s in schema:
            _collect_named(s, names, namespace)
        return
    if not isinstance(schema, dict):
        return
    t = schema.get("type")
    ns = schema.get("namespace", namespace)
    if t in NAMED:
        name = schema["name"]
        full = f"{ns}.{name}" if ns and "." not in name else name
        names[full] = schema
        names[name] = schema
    if t == "record":
        for f in schema.get("fields", ()):
            _collect_named(f["type"], names, ns)
    elif t == "array":
        _collect_named(schema.get("items"), names, ns)
    elif t == "map":
        _collect_named(schema.get("values"), names, ns)
    elif isinstance(t, (dict, list)):
        _collect_named(t, names, ns)


def _resolve(schema: Any, names: dict[str, Any]) -> Any:
    """Dereference string references / unwrap {'type': 'int'} wrappers."""
    if isinstance(schema, str):
        if schema in PRIMITIVES:
            return schema
        if schema in names:
            return names[schema]
        raise AvroError(f"unknown type reference {schema!r}")
    if isinstance(schema, dict) and isinstance(schema.get("type"), str):
        if schema["type"] in PRIMITIVES and "logicalType" not in schema and schema.keys() <= {"type"}:
            return schema["type"]
    return schema


def decode_value(schema: Any, dec: _Decoder, names: dict[str, Any]) -> Any:
    """Decode one value of `schema` from the binary stream."""
    schema = _resolve(schema, names)
    if isinstance(schema, str):
        return {
            "null": dec.null,
            "boolean": dec.boolean,
            "int": dec.zlong,
            "long": dec.zlong,
            "float": dec.float_,
            "double": dec.double,
            "bytes": dec.bytes_,
            "string": dec.string,
        }[schema]()
    if isinstance(schema, list):  # union: branch index then value
        idx = dec.zlong()
        if not 0 <= idx < len(schema):
            raise AvroError(f"union index {idx} out of range")
        return decode_value(schema[idx], dec, names)
    t = schema["type"]
    if t in PRIMITIVES:
        return decode_value(t, dec, names)
    if t == "record":
        return {f["name"]: decode_value(f["type"], dec, names) for f in schema["fields"]}
    if t == "enum":
        symbols = schema["symbols"]
        i = dec.zlong()
        if not 0 <= i < len(symbols):
            raise AvroError(f"enum index {i} out of range")
        return symbols[i]
    if t == "fixed":
        return dec.read(int(schema["size"]))
    if t == "array":
        out = []
        while True:
            n = dec.zlong()
            if n == 0:
                break
            if n < 0:  # block with byte size prefix
                n = -n
                dec.zlong()
            for _ in range(n):
                out.append(decode_value(schema["items"], dec, names))
        return out
    if t == "map":
        out_m: dict[str, Any] = {}
        while True:
            n = dec.zlong()
            if n == 0:
                break
            if n < 0:
                n = -n
                dec.zlong()
            for _ in range(n):
                k = dec.string()
                out_m[k] = decode_value(schema["values"], dec, names)
        return out_m
    raise AvroError(f"unsupported schema {schema!r}")


_PROMOTIONS = {
    "int": ("int", "long", "float", "double"),
    "long": ("long", "float", "double"),
    "float": ("float", "double"),
    "double": ("double",),
    "string": ("string", "bytes"),
    "bytes": ("bytes", "string"),
}


def adapt_to_reader(value: Any, writer: Any, reader: Any, names: dict[str, Any]) -> Any:
    """Schema-resolution projection: reshape a decoded writer-schema
    value to the reader schema (name-matched record fields, defaults
    for missing fields, primitive promotion)."""
    writer = _resolve(writer, names)
    reader = _resolve(reader, names)
    if isinstance(writer, list):
        # decoded value already collapsed the union branch; adapt as
        # the branch that produced it — approximate by trying reader
        return adapt_to_reader(value, _branch_for(value, writer, names), reader, names)
    if isinstance(reader, list):
        return value  # emit-time union resolution handles labeling
    wt = writer if isinstance(writer, str) else writer["type"]
    rt = reader if isinstance(reader, str) else reader["type"]
    if wt in PRIMITIVES or rt in PRIMITIVES:
        if rt not in _PROMOTIONS.get(wt, (rt,)):
            raise AvroError(f"cannot promote {wt} to {rt}")
        if rt in ("float", "double") and isinstance(value, int):
            return float(value)
        return value
    if rt == "record":
        out = {}
        wfields = {f["name"]: f for f in writer.get("fields", ())}
        for f in reader["fields"]:
            if f["name"] in wfields:
                out[f["name"]] = adapt_to_reader(
                    value[f["name"]], wfields[f["name"]]["type"], f["type"], names
                )
            elif "default" in f:
                out[f["name"]] = f["default"]
            else:
                raise AvroError(f"no value or default for reader field {f['name']!r}")
        return out
    if rt == "array":
        return [adapt_to_reader(v, writer["items"], reader["items"], names) for v in value]
    if rt == "map":
        return {
            k: adapt_to_reader(v, writer["values"], reader["values"], names)
            for k, v in value.items()
        }
    return value


def _branch_for(value: Any, union: list, names: dict[str, Any]) -> Any:
    for b in union:
        rb = _resolve(b, names)
        t = rb if isinstance(rb, str) else rb.get("type")
        if value is None and t == "null":
            return b
        if isinstance(value, bool) and t == "boolean":
            return b
        if isinstance(value, int) and not isinstance(value, bool) and t in ("int", "long"):
            return b
        if isinstance(value, float) and t in ("float", "double"):
            return b
        if isinstance(value, str) and t in ("string", "enum"):
            return b
        if isinstance(value, bytes) and t in ("bytes", "fixed"):
            return b
        if isinstance(value, list) and t == "array":
            return b
        if isinstance(value, dict) and t in ("record", "map"):
            return b
    raise AvroError(f"cannot resolve union branch for {type(value)} in {union}")


class AvroContainerFile:
    """Parsed Avro object container file (header + block iterator)."""

    def __init__(self, src: bytes | BinaryIO):
        data = src if isinstance(src, bytes) else src.read()
        if data[:4] != MAGIC:
            raise AvroError("not an Avro object container file (bad magic)")
        dec = _Decoder(data[4:])
        self.meta: dict[str, bytes] = {}
        while True:
            n = dec.zlong()
            if n == 0:
                break
            if n < 0:
                n = -n
                dec.zlong()
            for _ in range(n):
                k = dec.string()
                self.meta[k] = dec.bytes_()
        self.sync = dec.read(16)
        self._body = dec
        self.schema = json.loads(self.meta["avro.schema"])
        self.codec = self.meta.get("avro.codec", b"null").decode()
        self.names: dict[str, Any] = {}
        _collect_named(self.schema, self.names)

    def _decompress(self, block: bytes) -> bytes:
        if self.codec == "null":
            return block
        if self.codec == "deflate":
            return zlib.decompress(block, -15)
        if self.codec == "snappy":
            try:
                import snappy  # type: ignore[import-not-found]
            except ImportError as e:  # pragma: no cover - env-dependent
                raise AvroError("snappy codec requires python-snappy") from e
            return snappy.decompress(block[:-4])  # trailing CRC32
        raise AvroError(f"unsupported codec {self.codec!r}")

    def __iter__(self) -> Iterator[Any]:
        return self.records()

    def records(self, reader_schema: Any | None = None) -> Iterator[Any]:
        dec = self._Decoder_fresh()
        r_names: dict[str, Any] = {}
        if reader_schema is not None:
            _collect_named(reader_schema, r_names)
        while not dec.at_end():
            count = dec.zlong()
            size = dec.zlong()
            block = _Decoder(self._decompress(dec.read(size)))
            sync = dec.read(16)
            if sync != self.sync:
                raise AvroError("sync marker mismatch (corrupt file)")
            for _ in range(count):
                v = decode_value(self.schema, block, self.names)
                if reader_schema is not None:
                    v = adapt_to_reader(v, self.schema, reader_schema, {**self.names, **r_names})
                yield v

    def _Decoder_fresh(self) -> _Decoder:
        d = _Decoder(b"")
        d.buf = io.BytesIO(self._body.buf.getvalue())
        d.buf.seek(self._body.buf.tell())
        return d
