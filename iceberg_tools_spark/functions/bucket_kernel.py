"""Vectorized Iceberg bucket-transform kernels (NO ``from
__future__ import annotations``: PySpark resolves ``pandas_udf``
type hints at decoration time, so ``pd.Series`` must be a real
name in this module's globals — same constraint as
``minhash_kernel.py``).

The long-family kernel is the numpy twin of
``iceberg.transforms.murmur3_32`` over the spec's 8-byte
little-endian encoding: two 4-byte blocks, fully vectorized uint32
arithmetic (wraparound is numpy's native modular behavior), no
per-row Python. Strings hash per-row (variable length) but still
arrive Arrow-batched.

Equality with the pure-Python spec-vector-pinned implementation is
property-tested in tests/test_transforms.py.
"""

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

_C1, _C2 = 0xCC9E2D51, 0x1B873593

# pandas_udf parses the return-type DDL, which needs an active
# SparkSession — built lazily per (n, kind) on first use
_UDF_CACHE: dict = {}


def _hash_long_numpy(v: np.ndarray) -> np.ndarray:
    """murmur3_x86_32 of each int64's little-endian 8 bytes,
    vectorized; returns uint32 hashes."""
    u = v.astype(np.int64).view(np.uint64)
    k1 = (u & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    k2 = (u >> np.uint64(32)).astype(np.uint32)
    h = np.zeros(len(u), np.uint32)
    for k in (k1, k2):
        k = k * np.uint32(_C1)
        k = (k << np.uint32(15)) | (k >> np.uint32(17))
        k = k * np.uint32(_C2)
        h = h ^ k
        h = (h << np.uint32(13)) | (h >> np.uint32(19))
        h = h * np.uint32(5) + np.uint32(0xE6546B64)
    h = h ^ np.uint32(8)  # total input length: 8 bytes
    h = h ^ (h >> np.uint32(16))
    h = h * np.uint32(0x85EBCA6B)
    h = h ^ (h >> np.uint32(13))
    h = h * np.uint32(0xC2B2AE35)
    h = h ^ (h >> np.uint32(16))
    return h


def bucket_long_udf(n: int):
    key = ("long", n)
    if key not in _UDF_CACHE:

        @F.pandas_udf("int")
        def _bucket(s: pd.Series) -> pd.Series:
            if len(s) == 0:
                return pd.Series([], dtype="Int32")
            mask = s.isna().to_numpy()
            v = s.fillna(0).to_numpy(dtype=np.int64)
            h = _hash_long_numpy(v)
            out = ((h & np.uint32(0x7FFFFFFF)) % np.uint32(n)).astype("int64")
            res = pd.Series(out, dtype="Int64").astype("Int32")
            res[mask] = None
            return res

        _UDF_CACHE[key] = _bucket
    return _UDF_CACHE[key]


def bucket_string_udf(n: int):
    from ..iceberg.transforms import murmur3_32

    key = ("string", n)
    if key not in _UDF_CACHE:

        @F.pandas_udf("int")
        def _bucket(s: pd.Series) -> pd.Series:
            return pd.Series(
                [
                    None
                    if v is None
                    else (murmur3_32(v.encode("utf-8")) & 0x7FFFFFFF) % n
                    for v in s
                ],
                dtype="Int32",
            )

        _UDF_CACHE[key] = _bucket
    return _UDF_CACHE[key]


def bucket_long_col(col: Column, n: int) -> Column:
    return bucket_long_udf(n)(col)


def bucket_string_col(col: Column, n: int) -> Column:
    return bucket_string_udf(n)(col)
