"""Apache DataSketches compact theta sketch — pure-stdlib writer/
reader of the PUBLIC serialized format, for cross-engine NDV interop
(VERDICT r6 #8 / Puffin spec blob type
``apache-datasketches-theta-v1``).

Sources (all public): the DataSketches "Theta Sketch Framework"
paper + the project's documented binary format (serial version 3,
family COMPACT), and MurmurHash3 x64 128 (Austin Appleby, public
domain) — the hash DataSketches uses with its default update seed
9001.

Layout written here (little-endian; ordered compact sketch):

* byte 0 preamble-longs (1 empty / 2 exact / 3 estimation),
  byte 1 serial-version = 3, byte 2 family = 3 (COMPACT),
  bytes 3-4 zero (no lgNomLongs/lgArrLongs in compact),
  byte 5 flags = READ_ONLY|COMPACT|ORDERED (|EMPTY),
  bytes 6-7 seed hash;
* preamble long 1 (exact/estimation): retained-entry count (u32) +
  sampling probability p = 1.0 (f32, bytes 12-15 — the value the
  library stores when no downsampling happened); preamble long 2
  (estimation only): thetaLong (i64);
* retained hash values as ascending int64;
* count == 1 with theta = MAX takes the library's 16-byte
  SingleItemSketch form instead (preLongs = 1, SINGLEITEM flag).

Hashing rules (DataSketches update semantics):

* ``long`` input → murmur3_128 of its 8 LE bytes;
* ``str`` input → murmur3_128 of its UTF-8 bytes;
* ``double`` input → canonicalize (-0.0 → 0.0), murmur3_128 of the
  IEEE-754 bits as 8 LE bytes;
* hash value = first 64-bit lane >>> 1; zero is rejected.

Estimation: with more than ``k`` distinct values, theta is the
(k+1)-th smallest hash and the k smaller hashes are retained (the
KMV form every theta reader accepts); estimate = count / (theta /
(2^63 - 1)).

Honesty note: the real DataSketches library is absent in this
environment, so byte-level interop is pinned by structure tests
(header fields, flags, round-trip, single-item read form), not by a
cross-library decode.
"""

from __future__ import annotations

import math
import struct
from typing import Any, Iterable

_M64 = (1 << 64) - 1
_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F

DEFAULT_UPDATE_SEED = 9001
DEFAULT_LG_K = 12  # k = 4096 — the DataSketches default nominal size
THETA_BLOB_TYPE = "apache-datasketches-theta-v1"
_LONG_MAX = (1 << 63) - 1

_FLAG_READ_ONLY = 0x02
_FLAG_EMPTY = 0x04
_FLAG_COMPACT = 0x08
_FLAG_ORDERED = 0x10
_FLAG_SINGLEITEM = 0x20
_FAMILY_COMPACT = 3
_SER_VER = 3


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix64(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _M64
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _M64
    k ^= k >> 33
    return k


def murmur3_128(data: bytes, seed: int = 0) -> tuple[int, int]:
    """MurmurHash3 x64 128 (public-domain reference algorithm),
    returning the two unsigned 64-bit lanes."""
    h1 = seed & _M64
    h2 = seed & _M64
    n = len(data)
    nblocks = n // 16
    for i in range(nblocks):
        k1, k2 = struct.unpack_from("<qq", data, i * 16)
        k1 &= _M64
        k2 &= _M64
        k1 = (k1 * _C1) & _M64
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _M64
        h1 ^= k1
        h1 = _rotl(h1, 27)
        h1 = (h1 + h2) & _M64
        h1 = (h1 * 5 + 0x52DCE729) & _M64
        k2 = (k2 * _C2) & _M64
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & _M64
        h2 ^= k2
        h2 = _rotl(h2, 31)
        h2 = (h2 + h1) & _M64
        h2 = (h2 * 5 + 0x38495AB5) & _M64
    # tail
    tail = data[nblocks * 16 :]
    k1 = k2 = 0
    t = len(tail)
    if t >= 9:
        for i in range(t - 1, 7, -1):
            k2 ^= tail[i] << ((i - 8) * 8)
        k2 = (k2 * _C2) & _M64
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & _M64
        h2 ^= k2
    if t >= 1:
        for i in range(min(t, 8) - 1, -1, -1):
            k1 ^= tail[i] << (i * 8)
        k1 = (k1 * _C1) & _M64
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _M64
        h1 ^= k1
    # finalize
    h1 ^= n
    h2 ^= n
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    return h1, h2


def compute_seed_hash(seed: int = DEFAULT_UPDATE_SEED) -> int:
    """DataSketches Util.computeSeedHash: murmur the seed itself
    (as one LE long, hash-seed 0) and keep the low 16 bits; zero is
    rejected (it marks a corrupted preamble)."""
    h = murmur3_128(struct.pack("<q", seed), 0)[0] & 0xFFFF
    if h == 0:
        raise ValueError(f"seed {seed} hashes to the reserved 0 seed-hash")
    return h


def theta_hash(value: Any, seed: int = DEFAULT_UPDATE_SEED) -> int:
    """The 63-bit theta hash of one value under DataSketches update
    semantics (type-dispatched encoding, first lane >>> 1)."""
    if isinstance(value, bool):
        raise TypeError("boolean has no defined DataSketches encoding")
    if isinstance(value, int):
        enc = struct.pack("<q", value)
    elif isinstance(value, str):
        enc = value.encode("utf-8")
    elif isinstance(value, float):
        if value == 0.0:
            value = 0.0  # canonicalize -0.0
        if math.isnan(value):
            value = math.nan
        enc = struct.pack("<q", struct.unpack("<q", struct.pack("<d", value))[0])
    elif isinstance(value, (bytes, bytearray)):
        enc = bytes(value)
    else:
        raise TypeError(f"unsupported theta input type {type(value).__name__}")
    return murmur3_128(enc, seed)[0] >> 1


def build_compact_theta(
    hashes: Iterable[int], *, lg_k: int = DEFAULT_LG_K
) -> dict[str, Any]:
    """An ordered compact sketch from pre-computed theta hashes:
    exact below k distinct hashes, else KMV — theta = the (k+1)-th
    smallest hash, the k smaller ones retained."""
    k = 1 << lg_k
    # valid hash range is (0, theta): 0 and LONG_MAX are rejected
    # exactly as the reference update path does
    hs = sorted({h for h in hashes if 0 < h < _LONG_MAX})
    if len(hs) <= k:
        return {"theta": _LONG_MAX, "hashes": hs, "empty": not hs}
    return {"theta": hs[k], "hashes": hs[:k], "empty": False}


def serialize_compact_theta(
    sketch: dict[str, Any], *, seed: int = DEFAULT_UPDATE_SEED
) -> bytes:
    """Serial-version-3 ordered compact sketch bytes."""
    seed_hash = compute_seed_hash(seed)
    theta, hs, empty = sketch["theta"], sketch["hashes"], sketch["empty"]
    flags = _FLAG_READ_ONLY | _FLAG_COMPACT | _FLAG_ORDERED
    if empty:
        return struct.pack(
            "<BBBBBBH", 1, _SER_VER, _FAMILY_COMPACT, 0, 0,
            flags | _FLAG_EMPTY, seed_hash,
        )
    if theta == _LONG_MAX and len(hs) == 1:
        # the library's 16-byte SingleItemSketch form (preLongs=1,
        # SINGLEITEM flag): what a real writer emits for count==1
        return struct.pack(
            "<BBBBBBHq", 1, _SER_VER, _FAMILY_COMPACT, 0, 0,
            flags | _FLAG_SINGLEITEM, seed_hash, hs[0],
        )
    pre_longs = 2 if theta == _LONG_MAX else 3
    out = bytearray(
        struct.pack(
            "<BBBBBBH", pre_longs, _SER_VER, _FAMILY_COMPACT, 0, 0, flags, seed_hash
        )
    )
    # preamble bytes 8-11: retained count; 12-15: sampling
    # probability p as float (always 1.0 here — no downsampling)
    out += struct.pack("<If", len(hs), 1.0)
    if pre_longs == 3:
        out += struct.pack("<q", theta)
    for h in hs:
        out += struct.pack("<q", h)
    return bytes(out)


def deserialize_compact_theta(data: bytes) -> dict[str, Any]:
    """Parse a serial-version-3 compact sketch (the general
    preLongs 1/2/3 forms plus the 16-byte single-item shortcut real
    writers may emit)."""
    if len(data) < 8:
        raise ValueError("theta sketch shorter than one preamble long")
    pre_longs, ser_ver, family, _, _, flags, seed_hash = struct.unpack_from(
        "<BBBBBBH", data, 0
    )
    if ser_ver != _SER_VER:
        raise ValueError(f"unsupported theta serial version {ser_ver}")
    if family != _FAMILY_COMPACT:
        raise ValueError(f"not a compact theta sketch (family {family})")
    if flags & _FLAG_EMPTY:
        return {"theta": _LONG_MAX, "hashes": [], "empty": True,
                "seed_hash": seed_hash}
    if pre_longs == 1:
        # single-item shortcut: one hash directly after the preamble
        (h,) = struct.unpack_from("<q", data, 8)
        return {"theta": _LONG_MAX, "hashes": [h], "empty": False,
                "seed_hash": seed_hash}
    (count,) = struct.unpack_from("<I", data, 8)
    off = 16
    theta = _LONG_MAX
    if pre_longs == 3:
        (theta,) = struct.unpack_from("<q", data, 16)
        off = 24
    hs = list(struct.unpack_from(f"<{count}q", data, off))
    return {"theta": theta, "hashes": hs, "empty": False, "seed_hash": seed_hash}


def theta_estimate(sketch: dict[str, Any]) -> float:
    """count / (theta / (2^63 - 1)) — exact when theta is MAX."""
    if sketch["empty"]:
        return 0.0
    return len(sketch["hashes"]) / (sketch["theta"] / _LONG_MAX)


def theta_hash_fixed_batch(values, width: int, seed: int = DEFAULT_UPDATE_SEED):
    """Vectorized theta hashes for a batch of FIXED-WIDTH (≤ 8 byte)
    little-endian encodings — the long/int/date/timestamp/double
    family of Iceberg single-value serialization. A width-w input is
    a single murmur3 tail block (no 16-byte body), so the whole hash
    collapses to a handful of wrapping uint64 numpy ops; verified
    element-for-element against the scalar reference by pytest.

    ``values``: int64 numpy array holding the encoding interpreted
    as a little-endian integer (for width 8 that is the value/bits
    themselves; for width 4 the low 4 bytes)."""
    import numpy as np

    with np.errstate(over="ignore"):
        v = values.astype(np.uint64)
        if width < 8:
            v &= np.uint64((1 << (8 * width)) - 1)
        c1 = np.uint64(_C1)
        c2 = np.uint64(_C2)
        h1 = np.full_like(v, np.uint64(seed))
        h2 = np.full_like(v, np.uint64(seed))
        k1 = v * c1
        k1 = (k1 << np.uint64(31)) | (k1 >> np.uint64(33))
        k1 = k1 * c2
        h1 = h1 ^ k1
        n = np.uint64(width)
        h1 = h1 ^ n
        h2 = h2 ^ n
        h1 = h1 + h2
        h2 = h2 + h1

        def fmix(k):
            k = k ^ (k >> np.uint64(33))
            k = k * np.uint64(0xFF51AFD7ED558CCD)
            k = k ^ (k >> np.uint64(33))
            k = k * np.uint64(0xC4CEB9FE1A85EC53)
            k = k ^ (k >> np.uint64(33))
            return k

        h1 = fmix(h1)
        h2 = fmix(h2)
        h1 = h1 + h2
        return (h1 >> np.uint64(1)).astype(np.int64)


def canonical_double_bits(arr):
    """IEEE-754 bits of a float64 numpy array under the scalar
    ``theta_hash`` canonicalization: -0.0 → +0.0 and every NaN
    payload → the canonical quiet NaN — so batch callers hash the
    same bytes the per-value reference path does even on
    un-normalized inputs (ADVICE r7)."""
    import numpy as np

    arr = np.where(arr == 0.0, 0.0, arr)
    arr = np.where(np.isnan(arr), np.float64("nan"), arr)
    return arr.view(np.int64)


def merge_compact_theta(
    sketches: Iterable[dict[str, Any]], *, lg_k: int = DEFAULT_LG_K
) -> dict[str, Any]:
    """Theta UNION (the operation that makes sketches maintainable
    incrementally): theta = min over inputs, retained = distinct
    input hashes below it, re-trimmed to k if the union overflows.
    Duplicates across inputs collapse — exactly why an append-only
    stats update can merge a delta sketch instead of recomputing."""
    k = 1 << lg_k
    sks = list(sketches)
    theta = min((s["theta"] for s in sks), default=_LONG_MAX)
    hs = sorted({h for s in sks for h in s["hashes"] if h < theta})
    if len(hs) > k:
        theta = hs[k]
        hs = hs[:k]
    return {"theta": theta, "hashes": hs, "empty": not hs and theta == _LONG_MAX}
