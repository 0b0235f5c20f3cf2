"""Portable Roaring bitmap serialization — the storage format of
Iceberg v3 deletion vectors.

Pure-stdlib implementation of the PUBLIC RoaringFormatSpec
(github.com/RoaringBitmap/RoaringFormatSpec), both directions:

* 32-bit serialization: the ``12346`` (no run containers) and
  ``12347`` (embedded run-flag bitset) cookies, descriptive header
  (per-container 16-bit key + cardinality-1), the offset header
  (always present for 12346; present for 12347 only at
  ``size >= 4``), and all three container encodings —
  **array** (sorted uint16 values), **bitmap** (1024 × uint64
  words), **run** (n_runs × (start, length-1));
* 64-bit "portable" wrapper: uint64 bucket count, then per bucket a
  uint32 high key followed by that bucket's 32-bit serialization —
  the layout Iceberg v3 mandates for deletion vectors.

Write-side container choice is the spec's size heuristic, computed
exactly: a container is written as whichever of run / array / bitmap
serializes smallest (ties prefer the non-run encoding, matching
``runOptimize``'s "only if strictly smaller" rule), with array
limited to cardinality ≤ 4096.

Everything here is driver-or-kernel-side CPU work on KB–MB byte
strings; the positions a deletion vector yields feed the SAME
distributed anti-join `deletes.py` already runs for parquet
position deletes.
"""

from __future__ import annotations

import struct
from typing import Iterable

try:  # vectorized fast paths; the scalar code below is the
    import numpy as _np  # reference implementation and fallback
except ImportError:  # pragma: no cover - numpy is baked in here
    _np = None

SERIAL_COOKIE_NO_RUNCONTAINER = 12346
SERIAL_COOKIE = 12347
NO_OFFSET_THRESHOLD = 4
ARRAY_MAX_CARD = 4096
BITMAP_BYTES = 8192  # 1024 uint64 words


# ------------------------------------------------------------ write


def _runs(values: list[int]) -> list[tuple[int, int]]:
    """Maximal runs [(start, length), ...] of a sorted uint16 list."""
    runs: list[tuple[int, int]] = []
    start = prev = values[0]
    for v in values[1:]:
        if v == prev + 1:
            prev = v
            continue
        runs.append((start, prev - start + 1))
        start = prev = v
    runs.append((start, prev - start + 1))
    return runs


def _serialize_container(values: list[int]) -> tuple[str, bytes]:
    """(kind, payload) for one container's sorted 16-bit values,
    choosing the smallest encoding (run strictly smaller, else
    array if it fits, else bitmap)."""
    card = len(values)
    runs = _runs(values)
    run_size = 2 + 4 * len(runs)
    array_size = 2 * card if card <= ARRAY_MAX_CARD else None
    other = min(s for s in (array_size, BITMAP_BYTES) if s is not None)
    if run_size < other:
        payload = struct.pack("<H", len(runs)) + b"".join(
            struct.pack("<HH", s, l - 1) for s, l in runs
        )
        return "run", payload
    if array_size is not None and array_size <= BITMAP_BYTES:
        return "array", struct.pack(f"<{card}H", *values)
    words = [0] * 1024
    for v in values:
        words[v >> 6] |= 1 << (v & 63)
    return "bitmap", struct.pack("<1024Q", *words)


def _np_container(lo: "object") -> tuple[str, bytes]:
    """Vectorized `_serialize_container`: identical kind choice and
    byte output for one container's sorted unique uint16 values
    (``lo``: np.uint32 array)."""
    card = int(lo.size)
    d = _np.diff(lo)
    n_runs = int((d != 1).sum()) + 1
    run_size = 2 + 4 * n_runs
    array_size = 2 * card if card <= ARRAY_MAX_CARD else None
    other = min(s for s in (array_size, BITMAP_BYTES) if s is not None)
    if run_size < other:
        brk = _np.nonzero(d != 1)[0]
        starts = lo[_np.concatenate(([0], brk + 1))]
        ends = lo[_np.concatenate((brk, [card - 1]))]
        inter = _np.empty(2 * n_runs, dtype="<u2")
        inter[0::2] = starts
        inter[1::2] = ends - starts  # length - 1
        return "run", struct.pack("<H", n_runs) + inter.tobytes()
    if array_size is not None:
        return "array", lo.astype("<u2").tobytes()
    # bitmap: 1024 little-endian uint64 words == 8192 bytes in flat
    # little bit order (value x ↔ byte x>>3, bit x&7)
    bits = _np.zeros(BITMAP_BYTES, dtype=_np.uint8)
    _np.bitwise_or.at(bits, lo >> 3, _np.left_shift(1, lo & 7).astype(_np.uint8))
    return "bitmap", bits.tobytes()


def _np_serialize_u32(values: Iterable[int]) -> bytes:
    try:
        v = _np.asarray(
            values if isinstance(values, _np.ndarray) else list(values),
            dtype=_np.int64,
        )
    except (OverflowError, ValueError, TypeError) as exc:
        raise ValueError("serialize_u32: values must be uint32") from exc
    v = _np.unique(v)
    if v.size and (int(v[0]) < 0 or int(v[-1]) > 0xFFFFFFFF):
        raise ValueError("serialize_u32: values must be uint32")
    v = v.astype(_np.uint32)
    keys16 = (v >> 16).astype(_np.uint32)
    brk = _np.nonzero(_np.diff(keys16))[0] + 1
    chunks = _np.split(v & 0xFFFF, brk) if v.size else []
    keys = [int(k) for k in keys16[_np.concatenate(([0], brk))]] if v.size else []
    conts = [_np_container(c.astype(_np.uint32)) for c in chunks]
    cards = [int(c.size) for c in chunks]
    return _assemble_u32(keys, cards, conts)


def serialize_u32(values: Iterable[int]) -> bytes:
    """Standard 32-bit Roaring serialization of a set of uint32s."""
    if _np is not None:
        return _np_serialize_u32(values)
    vals = sorted(set(values))
    if any(v < 0 or v > 0xFFFFFFFF for v in vals):
        raise ValueError("serialize_u32: values must be uint32")
    buckets: dict[int, list[int]] = {}
    for v in vals:
        buckets.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(buckets)
    conts = [_serialize_container(buckets[k]) for k in keys]
    return _assemble_u32(keys, [len(buckets[k]) for k in keys], conts)


def _assemble_u32(
    keys: list[int], cards: list[int], conts: list[tuple[str, bytes]]
) -> bytes:
    size = len(keys)
    has_run = any(kind == "run" for kind, _ in conts)

    out = bytearray()
    if has_run:
        out += struct.pack("<I", SERIAL_COOKIE | ((size - 1) << 16))
        flags = bytearray((size + 7) // 8)
        for i, (kind, _) in enumerate(conts):
            if kind == "run":
                flags[i // 8] |= 1 << (i % 8)
        out += flags
    else:
        out += struct.pack("<II", SERIAL_COOKIE_NO_RUNCONTAINER, size)
    for k, card in zip(keys, cards):
        out += struct.pack("<HH", k, card - 1)
    write_offsets = (not has_run) or size >= NO_OFFSET_THRESHOLD
    if write_offsets:
        off = len(out) + 4 * size
        for _, payload in conts:
            out += struct.pack("<I", off)
            off += len(payload)
    for _, payload in conts:
        out += payload
    return bytes(out)


def serialize_u64(values: Iterable[int]) -> bytes:
    """Portable 64-bit Roaring serialization (the Iceberg v3
    deletion-vector layout): uint64 bucket count, then per bucket a
    uint32 high key + the bucket's 32-bit serialization."""
    if _np is not None:
        if isinstance(values, _np.ndarray) and _np.issubdtype(
            values.dtype, _np.integer
        ):
            # numpy<2 silently WRAPS negatives on an astype(uint64):
            # validate signed inputs before the cast
            if (
                _np.issubdtype(values.dtype, _np.signedinteger)
                and values.size
                and int(values.min()) < 0
            ):
                raise ValueError("serialize_u64: values must be uint64")
            lst = values
        else:
            lst = list(values)
        try:
            if not isinstance(lst, _np.ndarray) and lst and min(lst) < 0:
                raise OverflowError("negative value")
            v = _np.unique(_np.asarray(lst, dtype=_np.uint64))
        except (OverflowError, ValueError, TypeError) as exc:
            raise ValueError("serialize_u64: values must be uint64") from exc
        hi32 = (v >> _np.uint64(32)).astype(_np.uint32)
        brk = _np.nonzero(_np.diff(hi32))[0] + 1
        chunks = (
            _np.split((v & _np.uint64(0xFFFFFFFF)).astype(_np.uint32), brk)
            if v.size
            else []
        )
        his = hi32[_np.concatenate(([0], brk))] if v.size else []
        out = bytearray(struct.pack("<Q", len(chunks)))
        for hi, chunk in zip(his, chunks):
            out += struct.pack("<I", int(hi))
            out += _np_serialize_u32(chunk)
        return bytes(out)
    vals = sorted(set(values))
    if any(v < 0 or v >= 1 << 64 for v in vals):
        raise ValueError("serialize_u64: values must be uint64")
    buckets: dict[int, list[int]] = {}
    for v in vals:
        buckets.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    out = bytearray(struct.pack("<Q", len(buckets)))
    for hi in sorted(buckets):
        out += struct.pack("<I", hi)
        out += serialize_u32(buckets[hi])
    return bytes(out)


# ------------------------------------------------------------- read


def _read_container(
    buf: bytes, pos: int, kind: str, card: int
) -> tuple[list[int], int]:
    if kind == "array":
        vals = list(struct.unpack_from(f"<{card}H", buf, pos))
        return vals, pos + 2 * card
    if kind == "bitmap":
        words = struct.unpack_from("<1024Q", buf, pos)
        vals = [
            (i << 6) | b
            for i, w in enumerate(words)
            if w
            for b in range(64)
            if w >> b & 1
        ]
        return vals, pos + BITMAP_BYTES
    n_runs = struct.unpack_from("<H", buf, pos)[0]
    pos += 2
    vals = []
    for _ in range(n_runs):
        start, lm1 = struct.unpack_from("<HH", buf, pos)
        pos += 4
        vals.extend(range(start, start + lm1 + 1))
    return vals, pos


def _np_read_container(buf: bytes, pos: int, kind: str, card: int):
    if kind == "array":
        vals = _np.frombuffer(buf, dtype="<u2", count=card, offset=pos).astype(
            _np.uint32
        )
        return vals, pos + 2 * card
    if kind == "bitmap":
        bits = _np.frombuffer(buf, dtype=_np.uint8, count=BITMAP_BYTES, offset=pos)
        vals = _np.nonzero(_np.unpackbits(bits, bitorder="little"))[0].astype(
            _np.uint32
        )
        return vals, pos + BITMAP_BYTES
    n_runs = struct.unpack_from("<H", buf, pos)[0]
    pos += 2
    inter = _np.frombuffer(buf, dtype="<u2", count=2 * n_runs, offset=pos).astype(
        _np.int64
    )
    pos += 4 * n_runs
    starts, lens = inter[0::2], inter[1::2] + 1
    total = int(lens.sum())
    base = _np.repeat(starts, lens)
    shift = _np.cumsum(lens) - lens
    vals = (base + (_np.arange(total) - _np.repeat(shift, lens))).astype(_np.uint32)
    return vals, pos


def _deserialize_u32_core(buf: bytes, pos: int):
    """(values, next position) — values as a sorted np.uint32 array
    under numpy, else a sorted python list."""
    cookie = struct.unpack_from("<I", buf, pos)[0]
    if (cookie & 0xFFFF) == SERIAL_COOKIE:
        size = (cookie >> 16) + 1
        pos += 4
        nflag = (size + 7) // 8
        flags = buf[pos : pos + nflag]
        pos += nflag
        is_run = [bool(flags[i // 8] >> (i % 8) & 1) for i in range(size)]
        has_offsets = size >= NO_OFFSET_THRESHOLD
    elif cookie == SERIAL_COOKIE_NO_RUNCONTAINER:
        size = struct.unpack_from("<I", buf, pos + 4)[0]
        pos += 8
        is_run = [False] * size
        has_offsets = True
    else:
        raise ValueError(f"not a Roaring serialization (cookie {cookie})")
    keys, cards = [], []
    for _ in range(size):
        k, cm1 = struct.unpack_from("<HH", buf, pos)
        pos += 4
        keys.append(k)
        cards.append(cm1 + 1)
    if has_offsets:
        pos += 4 * size  # offsets enable random access; sequential here
    parts = []
    out: list[int] = []
    for i in range(size):
        if is_run[i]:
            kind = "run"
        elif cards[i] > ARRAY_MAX_CARD:
            kind = "bitmap"
        else:
            kind = "array"
        reader = _np_read_container if _np is not None else _read_container
        vals, pos = reader(buf, pos, kind, cards[i])
        if len(vals) != cards[i]:
            raise ValueError(
                f"container {i}: header cardinality {cards[i]} != "
                f"decoded {len(vals)}"
            )
        if _np is not None:
            parts.append(_np.uint32(keys[i] << 16) | vals)
        else:
            out.extend((keys[i] << 16) | v for v in vals)
    if _np is not None:
        return (
            _np.concatenate(parts) if parts else _np.empty(0, _np.uint32)
        ), pos
    return out, pos


def deserialize_u32(buf: bytes, pos: int = 0) -> tuple[list[int], int]:
    """Parse one 32-bit Roaring serialization at ``pos``; returns
    (sorted values, next position)."""
    vals, pos = _deserialize_u32_core(buf, pos)
    return (vals.tolist() if _np is not None else vals), pos


def deserialize_u64(buf: bytes, pos: int = 0) -> tuple[list[int], int]:
    """Parse one portable 64-bit Roaring serialization at ``pos``;
    returns (sorted values, next position)."""
    n_buckets = struct.unpack_from("<Q", buf, pos)[0]
    pos += 8
    parts = []
    out: list[int] = []
    last_hi = -1
    for _ in range(n_buckets):
        hi = struct.unpack_from("<I", buf, pos)[0]
        pos += 4
        if hi <= last_hi:
            raise ValueError("portable 64-bit buckets must be key-sorted")
        last_hi = hi
        vals, pos = _deserialize_u32_core(buf, pos)
        if _np is not None:
            parts.append(
                (_np.uint64(hi) << _np.uint64(32)) | vals.astype(_np.uint64)
            )
        else:
            out.extend((hi << 32) | v for v in vals)
    if _np is not None:
        return (
            _np.concatenate(parts).tolist() if parts else []
        ), pos
    return out, pos
