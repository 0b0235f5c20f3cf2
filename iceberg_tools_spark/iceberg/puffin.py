"""Puffin file format + Iceberg v3 deletion-vector blobs.

Pure-stdlib implementation of the PUBLIC Puffin spec
(iceberg.apache.org/puffin-spec) and the v3 ``deletion-vector-v1``
blob type (Iceberg table spec v3, "Deletion vectors"):

* file layout ``Magic Blob₁ … Blobₙ Footer`` with footer
  ``Magic FooterPayload FooterPayloadSize Flags Magic``; the
  FooterPayload is the JSON FileMetadata (``blobs`` +
  ``properties``). We write uncompressed footers (flag bit clear)
  and reject compressed ones on read (no lz4 in this environment);
* blob metadata: ``type``, ``fields``, ``snapshot-id``,
  ``sequence-number``, ``offset``, ``length``, ``properties``;
* deletion-vector blob data: 4-byte big-endian length of
  (magic + vector), the magic ``D1 D3 39 64``, the vector as a
  portable 64-bit Roaring bitmap (`roaring.py`), and a big-endian
  CRC-32 of (magic + vector). Blob properties carry the REQUIRED
  ``referenced-data-file`` and ``cardinality`` keys.

Scale note: a deletion vector is KB–MB of bitmap per data file —
Iceberg's replacement for row-per-delete parquet position files
precisely because it stays small at 100 TB. Reading one is a
single ranged read (offset/length from the footer); `deletes.py`
decodes them in an Arrow-batched kernel, one task per vector.
"""

from __future__ import annotations

import json
import struct
import zlib
from typing import Any

MAGIC = b"PFA1"
FLAG_FOOTER_COMPRESSED = 0x1  # bit 0 of flag byte 0

DV_BLOB_TYPE = "deletion-vector-v1"
# the spec's magic (1681511377 little-endian — the constant real
# engines embed)
DV_MAGIC = bytes([0xD1, 0xD3, 0x39, 0x64])


# ------------------------------------------------------------ write


def encode_dv_blob(positions: list[int]) -> bytes:
    """``deletion-vector-v1`` blob data for a set of row positions:
    BE length of (magic + vector), DV magic, portable 64-bit Roaring
    vector, BE CRC-32 of (magic + vector)."""
    from .roaring import serialize_u64

    vec = serialize_u64(positions)
    body = DV_MAGIC + vec
    return struct.pack(">I", len(body)) + body + struct.pack(">I", zlib.crc32(body))


def decode_dv_blob(blob: bytes) -> list[int]:
    """Positions from a ``deletion-vector-v1`` blob, validating the
    declared length, the DV magic, and the CRC."""
    from .roaring import deserialize_u64

    if len(blob) < 12:
        raise ValueError(f"deletion-vector blob too short ({len(blob)} bytes)")
    (blen,) = struct.unpack_from(">I", blob, 0)
    body = blob[4 : 4 + blen]
    if len(body) != blen:
        raise ValueError(f"deletion-vector blob truncated: {len(body)} != {blen}")
    if body[:4] != DV_MAGIC:
        raise ValueError(f"bad deletion-vector magic {body[:4].hex()}")
    (crc,) = struct.unpack_from(">I", blob, 4 + blen)
    if crc != zlib.crc32(body):
        raise ValueError("deletion-vector CRC mismatch")
    positions, end = deserialize_u64(body, 4)
    if end != blen:
        raise ValueError(f"deletion vector has {blen - end} trailing bytes")
    return positions


def write_puffin(
    path: str,
    blobs: list[dict[str, Any]],
    properties: dict[str, str] | None = None,
) -> list[dict[str, Any]]:
    """Write a Puffin file. Each input blob dict carries ``data``
    (bytes) plus its metadata fields (``type``, optional ``fields``/
    ``snapshot-id``/``sequence-number``/``properties``); offsets and
    lengths are assigned here. Returns the final blob-metadata list
    (what the footer records — a DV writer feeds these into its
    manifest entry's ``content_offset``/``content_size_in_bytes``)."""
    out = bytearray(MAGIC)
    metas: list[dict[str, Any]] = []
    for b in blobs:
        data = b["data"]
        meta = {
            "type": b["type"],
            "fields": b.get("fields", []),
            "snapshot-id": b.get("snapshot-id", -1),
            "sequence-number": b.get("sequence-number", -1),
            "offset": len(out),
            "length": len(data),
        }
        if b.get("properties"):
            meta["properties"] = b["properties"]
        metas.append(meta)
        out += data
    payload = json.dumps(
        {"blobs": metas, **({"properties": properties} if properties else {})},
        sort_keys=True,
    ).encode("utf-8")
    out += MAGIC + payload + struct.pack("<I", len(payload)) + bytes(4) + MAGIC
    with open(path, "wb") as f:
        f.write(bytes(out))
    return metas


def write_deletion_vectors(
    path: str,
    dvs: list[tuple[str, list[int]]],
    *,
    snapshot_id: int = -1,
    sequence_number: int = -1,
) -> list[dict[str, Any]]:
    """One Puffin file holding a ``deletion-vector-v1`` blob per
    ``(referenced_data_file, positions)`` pair, with the spec's
    required ``referenced-data-file`` / ``cardinality`` properties.
    Returns the footer blob metadata (offset/length per vector)."""
    blobs = [
        {
            "type": DV_BLOB_TYPE,
            "data": encode_dv_blob(positions),
            "snapshot-id": snapshot_id,
            "sequence-number": sequence_number,
            "properties": {
                "referenced-data-file": ref,
                "cardinality": str(len(set(positions))),
            },
        }
        for ref, positions in dvs
    ]
    return write_puffin(path, blobs, properties={"created-by": "iceberg-tools-spark"})


# ------------------------------------------------------------- read


def read_puffin_footer(path: str) -> dict[str, Any]:
    """The FileMetadata JSON of a Puffin file, after validating both
    magics, the trailer structure, and the (unset) compression
    flag."""
    with open(path, "rb") as f:
        buf = f.read()
    if len(buf) < 20 or buf[:4] != MAGIC:
        raise ValueError(f"{path}: not a Puffin file (bad head magic)")
    if buf[-4:] != MAGIC:
        raise ValueError(f"{path}: truncated Puffin file (bad tail magic)")
    payload_size = struct.unpack_from("<I", buf, len(buf) - 12)[0]
    flags = buf[len(buf) - 8 : len(buf) - 4]
    if flags[0] & FLAG_FOOTER_COMPRESSED:
        raise ValueError(f"{path}: compressed footer payloads not supported")
    payload_start = len(buf) - 12 - payload_size
    if payload_start < 8 or buf[payload_start - 4 : payload_start] != MAGIC:
        raise ValueError(f"{path}: footer payload does not follow a magic")
    return json.loads(buf[payload_start : payload_start + payload_size])


def read_blob(path: str, offset: int, length: int) -> bytes:
    """One blob's bytes by footer offset/length (a ranged read — the
    access pattern object stores serve natively)."""
    with open(path, "rb") as f:
        f.seek(offset)
        data = f.read(length)
    if len(data) != length:
        raise ValueError(f"{path}: blob @{offset}+{length} truncated")
    return data


def read_deletion_vectors(path: str) -> dict[str, list[int]]:
    """``referenced_data_file → sorted positions`` for every
    ``deletion-vector-v1`` blob of a Puffin file. Raises if two
    vectors reference the same data file (v3 invariant: at most one
    DV per data file) or a declared cardinality disagrees with the
    decoded bitmap."""
    footer = read_puffin_footer(path)
    out: dict[str, list[int]] = {}
    for meta in footer.get("blobs", []):
        if meta.get("type") != DV_BLOB_TYPE:
            continue
        props = meta.get("properties", {})
        ref = props.get("referenced-data-file")
        if not ref:
            raise ValueError(f"{path}: deletion vector without referenced-data-file")
        if ref in out:
            raise ValueError(f"{path}: two deletion vectors reference {ref!r}")
        positions = decode_dv_blob(read_blob(path, meta["offset"], meta["length"]))
        card = props.get("cardinality")
        if card is not None and int(card) != len(positions):
            raise ValueError(
                f"{path}: DV for {ref!r} declares cardinality {card}, "
                f"decoded {len(positions)}"
            )
        out[ref] = positions
    return out
