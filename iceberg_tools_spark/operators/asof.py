"""Generic as-of join, Spark-first.

Spark has no native as-of join; range-join formulations
(``l.t >= r.t`` with a later dedup) explode to O(N·M) row pairs
before the window prunes them. The scalable composition is the
union-tag trick:

1. Tag right rows 0, left rows 1, union them on aligned columns.
2. One window over (keys, time, tag) with a running
   ``last(value, ignorenulls=True)`` carries the most recent right
   row forward onto every left row.
3. Filter back to tag 1.

Cost: ONE shuffle on the join keys + an in-partition sort — exactly
the repartition+sort plan an engine-native as-of join (DuckDB's
``ASOF JOIN``, pandas ``merge_asof``) would pick, with no
intermediate pair blow-up at any scale.

Semantics match ``pandas.merge_asof`` / DuckDB ``ASOF JOIN``:
``direction="backward"`` matches the most recent right row with
``right_time <= left_time``; ``"forward"`` the nearest with
``right_time >= left_time``. ``tolerance`` (a SQL INTERVAL string,
e.g. ``"30 MINUTES"``) bounds the match distance.

If several right rows share the same (keys, time), pass
``right_tiebreak`` — the row with the greatest tiebreak value wins
(deterministic). Without it, which duplicate wins is partition-order
dependent; pass a pre-deduped right side when you need uniqueness
semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TAG = "__asof_tag"
_T = "__asof_t"
_TB = "__asof_tb"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    right_values: list[str],
    direction: str = "backward",
    tolerance: str | None = None,
    suffix: str = "_asof",
    right_tiebreak: str | None = None,
) -> DataFrame:
    """All ``left`` columns plus ``{v}{suffix}`` for each right value
    column (and ``{right_time}{suffix}``), matched as-of.

    Left rows with no match keep NULLs (left-outer semantics).
    ``right_tiebreak`` names a right column that breaks ties among
    right rows sharing (keys, time): the greatest value wins.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    carried = list(right_values) + [right_time]
    left_cols = list(left.columns)
    non_key_left = [c for c in left_cols if c not in on]

    if right_tiebreak is not None:
        tb_r = [F.col(right_tiebreak).alias(_TB)]
        tb_l = [F.lit(None).cast(right.schema[right_tiebreak].dataType).alias(_TB)]
        # greatest tiebreak sorts last among tag-0 rows at equal time,
        # so last(ignorenulls) carries its values
        tb_order = [F.col(_TB).asc_nulls_first()]
    else:
        tb_r, tb_l, tb_order = [], [], []

    r = right.select(
        *on,
        F.col(right_time).alias(_T),
        F.lit(0).alias(_TAG),
        *tb_r,
        *[F.col(v).alias(f"{v}{suffix}") for v in carried],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in non_key_left],
    )
    l = left.select(
        *on,
        F.col(left_time).alias(_T),
        F.lit(1).alias(_TAG),
        *tb_l,
        *[F.lit(None).cast(right.schema[v].dataType).alias(f"{v}{suffix}") for v in carried],
        *[F.col(c) for c in non_key_left],
    )
    un = r.unionByName(l)

    if direction == "backward":
        # right rows sort before left at equal times → "<=" matches
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col(_T).asc(), F.col(_TAG).asc(), *tb_order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col(_T).desc(), F.col(_TAG).asc(), *tb_order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    out = un.select(
        *on,
        _T,
        _TAG,
        *[F.col(c) for c in non_key_left],
        *[
            F.last(F.col(f"{v}{suffix}"), ignorenulls=True).over(w).alias(f"{v}{suffix}")
            for v in carried
        ],
    ).filter(F.col(_TAG) == 1)

    if tolerance is not None:
        tcol = F.col(f"{right_time}{suffix}")
        if direction == "backward":
            within: Column = tcol >= F.col(_T) - F.expr(f"INTERVAL {tolerance}")
        else:
            within = tcol <= F.col(_T) + F.expr(f"INTERVAL {tolerance}")
        out = out.select(
            *on,
            _T,
            *non_key_left,
            *[
                F.when(within, F.col(f"{v}{suffix}")).alias(f"{v}{suffix}")
                for v in carried
            ],
        )

    return out.select(*left_cols, *[F.col(f"{v}{suffix}") for v in carried])
