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
