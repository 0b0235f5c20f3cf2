"""Skew-mitigating salted join.

AQE's skew-join splitting (on in the session factory) handles most
skew at runtime; this is the explicit fallback for the pathological
case AQE can't fix — a fact⋈fact equi-join where ONE key holds a
double-digit percentage of all rows, so even a split partition
re-concentrates on the same executor-side hash.

Standard construction: the large (skewed) side gets a deterministic
salt in [0, n_salts) derived from a row-unique column — md5-based,
so re-runs salt identically — widening each hot key across n_salts
shuffle partitions; the smaller side is exploded n_salts× so every
(key, salt) pair finds its match. Row-for-row equivalent to the
plain join, at n_salts× replication of the smaller side (choose
n_salts ≈ hottest-key share ÷ per-partition budget).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_i64

_SALT = "__salt"

# joins where exploding `other` n_salts× stays row-equivalent: every
# `other` row only ever *matches* (or probes) — it is never *emitted*
# unmatched. right/full-outer would emit each unmatched `other` row
# once per salt.
_SAFE_HOW = {
    "inner",
    "left", "leftouter", "left_outer",
    "semi", "leftsemi", "left_semi",
    "anti", "leftanti", "left_anti",
}


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    salt_by: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``skewed ⋈ other`` on ``on``, salted ``n_salts``
    ways. ``salt_by`` is a row-unique column of the skewed side
    (its hash spreads rows uniformly across salts)."""
    if how.lower() not in _SAFE_HOW:
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, got {how!r}: "
            "right/full-outer would duplicate unmatched rows of `other` per salt"
        )
    s = skewed.withColumn(
        _SALT, (md5_i64(F.col(salt_by).cast("string"), "salt") % n_salts).cast("int")
    )
    o = other.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>"))
    )
    return s.join(o, on + [_SALT], how).drop(_SALT)
