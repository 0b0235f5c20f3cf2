"""Central registry mapping query names → (spark callable, oracle SQL).

``__spark_entry__`` (the driver contract) and the parity tests both
read from here, so a query is declared exactly once. Oracle SQL of
``None`` marks a non-SQL-expressible operator (driver falls back to
a rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .operators import (
    analytics,
    components,
    dedup,
    events,
    packing,
    probes,
    sampling,
    similarity,
    tpch,
    tpch_ext,
)
from .operators import text as text_ops

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, fn: QueryFn, sql: str | None) -> None:
    # idempotent: module re-exec (importlib.reload, harness re-import)
    # simply overwrites; a module-level dict is the single source of
    # truth either way
    _REGISTRY[name] = (fn, sql)


# ---------------------------------------------------------- §2.2 TPC-H
register("q1_pricing_summary", tpch.q1_pricing_summary, tpch.Q1_SQL)
register("q3_shipping_priority", tpch.q3_shipping_priority, tpch.Q3_SQL)
register("q4_order_priority", tpch.q4_order_priority, tpch.Q4_SQL)
register("q5_local_supplier_volume", tpch.q5_local_supplier_volume, tpch.Q5_SQL)
register("q6_revenue_change", tpch.q6_revenue_change, tpch.Q6_SQL)
register("q7_volume_shipping", tpch.q7_volume_shipping, tpch.Q7_SQL)
register("q9_product_type_profit", tpch.q9_product_type_profit, tpch.Q9_SQL)
register("q10_returned_items", tpch.q10_returned_items, tpch.Q10_SQL)
register("q12_priority_shipping", tpch.q12_priority_shipping, tpch.Q12_SQL)
register("q13_customer_distribution", tpch.q13_customer_distribution, tpch.Q13_SQL)
register("q14_promo_effect", tpch.q14_promo_effect, tpch.Q14_SQL)
register("q18_large_volume_customers", tpch.q18_large_volume_customers, tpch.Q18_SQL)
register("q19_discounted_revenue", tpch.q19_discounted_revenue, tpch.Q19_SQL)
register("q22_global_sales_opportunity", tpch.q22_global_sales_opportunity, tpch.Q22_SQL)
register("q2_min_cost_supplier", tpch_ext.q2_min_cost_supplier, tpch_ext.Q2_SQL)
register("q8_market_share", tpch_ext.q8_market_share, tpch_ext.Q8_SQL)
register("q11_important_part_value", tpch_ext.q11_important_part_value, tpch_ext.Q11_SQL)
register("q15_top_supplier", tpch_ext.q15_top_supplier, tpch_ext.Q15_SQL)
register("q16_supplier_part_variety", tpch_ext.q16_supplier_part_variety, tpch_ext.Q16_SQL)
register("q17_small_quantity_revenue", tpch_ext.q17_small_quantity_revenue, tpch_ext.Q17_SQL)
register("q20_promo_part_shippers", tpch_ext.q20_promo_part_shippers, tpch_ext.Q20_SQL)
register("q21_sole_fault_supplier", tpch_ext.q21_sole_fault_supplier, tpch_ext.Q21_SQL)

# ----------------------------------------------- §2.2 window/analytics
register("top_k_per_group", analytics.top_k_per_group, analytics.TOP_K_SQL)
register("rollup_revenue", analytics.rollup_revenue, analytics.ROLLUP_SQL)
register("cube_status_priority", analytics.cube_status_priority, analytics.CUBE_SQL)
# rows-only: GK sketch is engine-specific; closeness to the exact
# percentiles is pytest-asserted (tests/test_analytics_scale.py)
register("approx_percentiles_order_value", analytics.approx_percentiles_order_value, None)
register("customer_running_total", analytics.customer_running_total, analytics.RUNNING_TOTAL_SQL)
register("monthly_revenue_delta", analytics.monthly_revenue_delta, analytics.MONTHLY_DELTA_SQL)
register("pivot_status_by_priority", analytics.pivot_status_by_priority, analytics.PIVOT_SQL)
register("percentiles_order_value", analytics.percentiles_order_value, analytics.PERCENTILES_SQL)
register("decile_value_customers", analytics.decile_value_customers, analytics.DECILE_SQL)
register("orders_cume_dist", analytics.orders_cume_dist, analytics.CUME_DIST_SQL)

# ----------------------------------------------------- §2.3 events
register("sessionize_events", events.sessionize_events, events.SESSIONIZE_SQL)
register("session_window_agg", events.session_window_agg, events.SESSION_WINDOW_SQL)
register("sliding_window_agg", events.sliding_window_agg, events.SLIDING_WINDOW_SQL)
register("events_props_stats", events.events_props_stats, events.EVENTS_PROPS_SQL)
register("funnel_windowed", events.funnel_windowed, events.FUNNEL_WINDOWED_SQL)
register("retention_matrix", events.retention_matrix, events.RETENTION_MATRIX_SQL)
register("asof_join_events_orders", events.asof_join_events_orders, events.ASOF_SQL)
register("funnel_view_click_purchase", events.funnel_view_click_purchase, events.FUNNEL_SQL)
register("retention_day_n", events.retention_day_n, events.RETENTION_SQL)
register("events_dedup_exact", events.events_dedup_exact, events.EVENTS_DEDUP_SQL)

# ------------------------------------------------ §2.4 text analysis
register("text_stats", text_ops.text_stats, text_ops.TEXT_STATS_SQL)
register("text_quality", text_ops.text_quality, text_ops.TEXT_QUALITY_SQL)
register("text_langid", text_ops.text_langid, text_ops.TEXT_LANGID_SQL)
register("text_fingerprint", text_ops.text_fingerprint, text_ops.TEXT_FINGERPRINT_SQL)
register("dataset_split", sampling.dataset_split, sampling.DATASET_SPLIT_SQL)
register("stratified_sample", sampling.stratified_sample, sampling.STRATIFIED_SAMPLE_SQL)
register("token_count_histogram", sampling.token_count_histogram, sampling.TOKEN_HISTOGRAM_SQL)
# rows-only: greedy per-shard bin packing is not SQL-expressible;
# invariants are pytest-checked (tests/test_packing.py)
register("pack_sequences", packing.pack_sequences, None)
# rows-only: iterative label propagation; planted-cluster invariants
# pytest-checked (tests/test_components.py)
register("dedup_clusters", components.dedup_clusters, None)

# ------------------------------------------------------ §2.4 dedup
register("dedup_exact", dedup.dedup_exact, dedup.DEDUP_EXACT_SQL)
register("dedup_ngram_jaccard", dedup.dedup_ngram_jaccard, dedup.DEDUP_NGRAM_SQL)
register("dedup_minhash_lsh", dedup.dedup_minhash_lsh, dedup.DEDUP_MINHASH_SQL)
register("dedup_simhash", dedup.dedup_simhash, dedup.DEDUP_SIMHASH_SQL)

# ------------------------------------------------ §2.4 embeddings
register("embedding_norm_stats", similarity.embedding_norm_stats, similarity.NORM_STATS_SQL)
register("ann_topk_bruteforce", similarity.ann_topk_bruteforce, similarity.ANN_BRUTE_SQL)
register("embedding_near_dup", similarity.embedding_near_dup, similarity.NEAR_DUP_SQL)
# iterative argmin/Lloyd logic — not concisely SQL-expressible:
# rows-only driver check + recall-vs-bruteforce pytest
register("ann_ivf_topk", similarity.ann_ivf_topk, None)

# --------------------------------------------- §2.1 metadata tables
# rows-only: these introspect the reference's Iceberg fixture (the
# only Iceberg table in the environment) — not expressible over the
# DuckDB testdata views
from .iceberg import tables as meta_tables  # noqa: E402  (after operator imports)

register("meta_manifest_entries", meta_tables.meta_manifest_entries, None)
register("meta_files", meta_tables.meta_files, None)
register("meta_partitions", meta_tables.meta_partitions, None)
register("meta_snapshots", meta_tables.meta_snapshots, None)
register("meta_history", meta_tables.meta_history, None)

# --------------------------------------- hash-canonicalization probes
# (diagnostics for the driver's correctness gate — see probes.py)
register("probe_bigint", probes.probe_bigint, probes.PROBE_BIGINT_SQL)
register("probe_string", probes.probe_string, probes.PROBE_STRING_SQL)
register("probe_decimal", probes.probe_decimal, probes.PROBE_DECIMAL_SQL)
register("probe_double", probes.probe_double, probes.PROBE_DOUBLE_SQL)
register("probe_date", probes.probe_date, probes.PROBE_DATE_SQL)
register("probe_timestamp", probes.probe_timestamp, probes.PROBE_TIMESTAMP_SQL)
register("probe_boolean", probes.probe_boolean, probes.PROBE_BOOLEAN_SQL)


def queries() -> dict[str, QueryFn]:
    return {k: fn for k, (fn, _) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {k: sql for k, (_, sql) in _REGISTRY.items() if sql is not None}
