"""Scan planning with min/max stats pruning.

The query-side use of the decoded bounds: given a predicate interval
on a column, skip every data file whose [lower, upper] range cannot
overlap it — the reason `manifest2json` decodes bounds at all. At
scale this prunes the file list BEFORE any executor touches data;
the pruning itself is a metadata-DataFrame filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# bounds in the metadata tables are rendered "value:<v>;type:<t>"
_VALUE_RE = r"^value:(.*);type:[^;]*$"


def bound_value(col: Column, cast_to: str = "string") -> Column:
    """Extract the typed value from a 'value:<v>;type:<t>' bound."""
    v = F.regexp_extract(col, _VALUE_RE, 1)
    return v.cast(cast_to)


def prune_files(
    entries: DataFrame,
    field_id: int,
    lo=None,
    hi=None,
    cast_to: str = "bigint",
) -> DataFrame:
    """Keep files whose [lower, upper] stats interval for `field_id`
    can intersect [lo, hi] (either side of the predicate open-ended).
    Files with missing bounds are conservatively kept."""
    lower = bound_value(F.element_at("lower_bounds", F.lit(field_id)), cast_to)
    upper = bound_value(F.element_at("upper_bounds", F.lit(field_id)), cast_to)
    keep = F.lit(True)
    if hi is not None:
        keep = keep & (lower.isNull() | (lower <= F.lit(hi)))
    if lo is not None:
        keep = keep & (upper.isNull() | (upper >= F.lit(lo)))
    return entries.filter(keep)


def pruning_stats(entries: DataFrame, field_id: int, lo=None, hi=None, cast_to: str = "bigint") -> dict:
    total = entries.count()
    kept = prune_files(entries, field_id, lo, hi, cast_to).count()
    return {"total_files": total, "kept_files": kept, "skipped_files": total - kept}
