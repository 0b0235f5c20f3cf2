"""Incremental view maintenance (IVM) over the row-level CDC
changelog — keep a downstream GROUP BY aggregate current by applying
per-snapshot deltas instead of recomputing the base table.

This is the consumption-side payoff of ``changelog.py``: at 100 TB a
materialized ``GROUP BY`` over the table costs a full scan + shuffle
every refresh, but a snapshot that touched 0.1% of rows emits a
changelog of just those rows. ``maintain_grouped_agg`` folds that
changelog into the existing aggregate with one KB-to-GB-scale
aggregation and a join on the group keys — the classic
"delta-processing" identity for self-maintainable aggregates
(COUNT/SUM are self-maintainable; inserts weigh +1, deletes -1):

    agg(head) == agg(base) ⊕ agg±(changelog(base → head))

Plan shape: the changelog delta aggregate partial-aggregates
map-side (tiny result: one row per touched group), then a single
equi-join on the group keys against the maintained view — broadcast
when the delta is small, which is the whole point. No Python rows,
no collect.

Reference parity: the reference tool exposes table state as manifest
dumps (``ManifestFileReadTool``); this module composes the engine's
own changelog (same metadata increments) into the maintenance
primitive a warehouse consumer builds on top of those dumps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .changelog import VIS_CTES, changelog_between
from .deletes import MOR_DIR, MOR_METADATA, read_mor

def _weight():
    # +1 per INSERT, -1 per DELETE (built lazily: classic-mode Column
    # construction needs an active SparkContext)
    return F.when(F.col("change_type") == "INSERT", F.lit(1)).otherwise(F.lit(-1))


def grouped_agg(df: DataFrame, keys: list[str], sums: list[str]) -> DataFrame:
    """The maintained view's shape: COUNT(*) + SUM(col) per group.
    (COUNT and SUM are the self-maintainable aggregates; MIN/MAX are
    deliberately out — a delete can invalidate them without the
    changelog saying what the new extremum is.)"""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        *[F.sum(F.col(c)).cast("long").alias(f"{c}_sum") for c in sums],
    )


def maintain_grouped_agg(
    base_agg: DataFrame,
    changelog: DataFrame,
    keys: list[str],
    sums: list[str],
) -> DataFrame:
    """Fold a changelog into an existing COUNT/SUM aggregate.

    ``base_agg`` must have the :func:`grouped_agg` shape; ``changelog``
    is ``changelog_between`` output (``change_type`` + data columns).
    Groups whose maintained count reaches 0 drop out, exactly as a
    recompute would drop them.
    """
    w = _weight()
    delta = changelog.groupBy(*keys).agg(
        F.sum(w).cast("long").alias("_d_n"),
        *[F.sum(w * F.col(c)).cast("long").alias(f"_d_{c}") for c in sums],
    )
    joined = base_agg.join(delta, keys, "full_outer")
    zero = F.lit(0).cast("long")
    out = joined.select(
        *keys,
        (F.coalesce(F.col("n_rows"), zero) + F.coalesce(F.col("_d_n"), zero)).alias("n_rows"),
        *[
            (
                F.coalesce(F.col(f"{c}_sum"), zero) + F.coalesce(F.col(f"_d_{c}"), zero)
            ).alias(f"{c}_sum")
            for c in sums
        ],
    )
    return out.where(F.col("n_rows") > 0)


# ------------------------------------------------ driver-gate query


def changelog_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver gate on the MoR fixture (``sf_dir`` unused): the
    per-category COUNT/SUM(id) view is materialized at snapshot 2001
    (files A+B, 178 rows) and then maintained PURELY from the
    2001→2004 changelog — through an insert commit, a MoR delete
    commit (positional + equality), and another insert. The oracle
    recomputes the head state from the physical parquet + v2
    sequence rules in DuckDB (``VIS_CTES``) and aggregates — full
    recompute vs incremental maintenance, zero shared code."""
    base = grouped_agg(
        read_mor(spark, MOR_METADATA, 2001, MOR_DIR), ["category"], ["id"]
    )
    deltas = changelog_between(spark, MOR_METADATA, 2001, 2004, MOR_DIR)
    return maintain_grouped_agg(base, deltas, ["category"], ["id"]).orderBy(
        "category"
    )


IVM_SQL = f"""
WITH
{VIS_CTES}
SELECT category,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(id) AS BIGINT) AS id_sum
FROM vis4
GROUP BY category
ORDER BY category
"""
