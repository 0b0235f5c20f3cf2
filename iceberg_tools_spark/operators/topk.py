"""Generic top-k per group.

Window rank + filter: one shuffle on the group keys, rank evaluated
in-partition streaming. With AQE this is the plan Spark's own
``QUALIFY``-style rewrites produce; there is no per-group collect or
driver loop, so k and group-count scale independently.

``method``:
  * ``row_number`` — exactly k rows per group (ties broken by the
    ordering's trailing columns; add a unique id for determinism).
  * ``rank`` / ``dense_rank`` — keep ties (may exceed k rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_RANKERS = {
    "row_number": F.row_number,
    "rank": F.rank,
    "dense_rank": F.dense_rank,
}


def top_k_per_group(
    df: DataFrame,
    keys: list[str],
    order_by: list[Column | str],
    k: int,
    method: str = "row_number",
    rank_col: str = "rk",
) -> DataFrame:
    if method not in _RANKERS:
        raise ValueError(f"method must be one of {sorted(_RANKERS)}, got {method!r}")
    order = [F.col(c) if isinstance(c, str) else c for c in order_by]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn(rank_col, _RANKERS[method]().over(w).cast("bigint"))
        .filter(F.col(rank_col) <= k)
    )


def top_k_per_group_salted(
    df: DataFrame,
    keys: list[str],
    order_by: list[Column | str],
    k: int,
    *,
    salt_col: str,
    n_salts: int = 32,
    rank_col: str = "rk",
) -> DataFrame:
    """Two-stage top-k for LOW-CARDINALITY group keys (VERDICT r9
    #2): a single window partitioned by a handful of keys funnels
    every input row into that many reducers and sorts there — a
    full corpus-derived sort on |keys| partitions at scale. Stage 1
    ranks within (keys, salt) — ``n_salts`` × more partitions, each
    sorting 1/n_salts of the rows — and keeps k per salted group;
    stage 2 re-ranks only the ≤ k·n_salts survivors per group.

    Exact by construction: every global top-k row is in its salt
    partition's top-k, so stage 1 never drops a final answer. The
    salt is deterministic (``hash(salt_col) mod n_salts``), so
    reruns rank identically; ties must still be broken by trailing
    ``order_by`` columns, exactly as with :func:`top_k_per_group`.
    """
    order = [F.col(c) if isinstance(c, str) else c for c in order_by]
    salt = F.pmod(F.hash(F.col(salt_col)), F.lit(n_salts))
    w1 = Window.partitionBy(*keys, "_salt").orderBy(*order)
    survivors = (
        df.withColumn("_salt", salt)
        .withColumn("_rk1", F.row_number().over(w1))
        .filter(F.col("_rk1") <= k)
        .drop("_salt", "_rk1")
    )
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return (
        survivors.withColumn(rank_col, F.row_number().over(w2).cast("bigint"))
        .filter(F.col(rank_col) <= k)
    )
