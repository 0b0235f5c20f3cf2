"""Arrow-batched MinHash slot kernel.

Lives in its own module (without ``from __future__ import
annotations``) because PySpark resolves ``pandas_udf`` type hints at
definition time — stringified annotations referencing a
function-local ``pd`` import don't resolve. Importing this module is
the lazy step: ``operators.dedup`` only pulls it in when a signature
plan is actually built, so consumers that need just the oracle SQL
text never pay the numpy/pandas import.
"""

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


def make_sig_kernel(coeffs, prime):
    """hashes array<bigint> → 64 affine slot minima array<bigint>.

    ``(a_i * h + b_i) mod prime`` vectorized over (slots × words);
    a < prime < 2^31 and h < 2^28 keep every product < 2^59, so the
    int64 arithmetic is exact and bit-identical to Spark/DuckDB
    BIGINT (no overflow, no float detour).
    """
    a_vec = np.array([a for a, _ in coeffs], dtype=np.int64)
    b_vec = np.array([b for _, b in coeffs], dtype=np.int64)

    @pandas_udf("array<bigint>")
    def mh_sig(hs: pd.Series) -> pd.Series:
        out = []
        for h in hs:
            hv = np.asarray(h, dtype=np.int64)
            out.append(((a_vec[:, None] * hv[None, :] + b_vec[:, None]) % prime).min(axis=1))
        return pd.Series(out)

    return mh_sig
