"""Headline-query benchmark — the driver's perf feedback loop.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints
exactly ONE JSON line:

    {"metric": "headline_total", "value": <sec>, "unit": "sec",
     "queries": {"q1_pricing_summary": <sec>, ...}, "sf": 0.1, ...}

Each query is materialized through the ``noop`` sink so every output
column is computed and nothing is shipped to the driver — the number
is engine time, not collect time. One warm session for the whole run
(session startup is reported separately, not folded into queries).
"""

from __future__ import annotations

import json
import os
import sys
import time


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.removeprefix("sf"))
    except ValueError:
        return -1.0


# headline set: one representative per operator family; grows as
# batteries land. Every name must exist in registry.queries().
HEADLINE = [
    # relational core
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q9_product_type_profit",
    "q8_market_share",
    "q13_customer_distribution",
    "q18_large_volume_customers",
    "q21_sole_fault_supplier",
    "top_k_per_group",
    "cube_status_priority",
    # events
    "sessionize_events",
    "asof_join_events_orders",
    "retention_day_n",
    "sliding_window_agg",
    "events_props_stats",
    # LLM pipeline
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_quality",
    "embedding_near_dup",
    "ann_topk_bruteforce",
    "pack_sequences",
    # round-4 breadth (VERDICT r3 #8): newest operator families
    "ann_ivf_topk",
    "dedup_clusters",
    "meta_manifest_entries",
    # round-5 breadth: snapshot-level planning + manifest rewrite +
    # training-pipeline decontamination/PII sweeps
    "files_at_snapshot",
    "meta_rewritten_files",
    "decontaminate_ngram",
    "pii_scrub_stats",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from iceberg_tools_spark import registry
    from iceberg_tools_spark.session import get_spark

    t0 = time.perf_counter()
    spark = get_spark("bench", cpus=cpus)
    startup = time.perf_counter() - t0

    # warm-up: touch every input table once so the first timed query
    # measures engine time, not one-time JVM/codegen/parquet-footer
    # warm-up (reported separately in warmup_sec).
    t0 = time.perf_counter()
    from iceberg_tools_spark.sources.readers import TABLES, load_table

    for tbl in TABLES:
        load_table(spark, sf_dir, tbl).write.format("noop").mode("overwrite").save()
    # also warm the Python worker pool (one trivial Arrow-batched
    # eval): several headline queries run Arrow kernels, and worker
    # fork/import is one-time session infrastructure — the same class
    # of cost as the JVM/parquet-footer warm-up above, reported in
    # warmup_sec, not attributed to whichever query runs first
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s):
        return s

    spark.range(32).select(_warm(F.col("id"))).write.format("noop").mode(
        "overwrite"
    ).save()
    warmup = time.perf_counter() - t0

    # machine-speed calibration: a fixed pure-CPU job (range sum, no
    # IO, no data dependence). Round-over-round query comparisons
    # divide by this to separate code regressions from host-speed
    # drift (the sandbox VM lands on hosts of varying speed).
    t0 = time.perf_counter()
    spark.range(200_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    calibration = time.perf_counter() - t0

    available = registry.queries()
    names = [n for n in HEADLINE if n in available]
    timings: dict[str, float] = {}
    for name in names:
        fn = available[name]
        t = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t, 3)

    # knob sweeps (VERDICT r4 #7): measured pairs-vs-knob numbers for
    # the two LSH fan-out knobs. Sweep time is reported inside each
    # row and NOT folded into the headline total (the headline set is
    # the round-over-round comparable).
    from iceberg_tools_spark.operators.dedup import lsh_candidate_pairs
    from iceberg_tools_spark.operators.similarity import near_dup_candidate_pairs

    sweep: dict[str, list] = {"near_dup_n_planes": [], "lsh_max_bucket": []}
    for n_planes in (8, 12, 16):
        t = time.perf_counter()
        row = near_dup_candidate_pairs(spark, sf_dir, n_planes=n_planes).first()
        sweep["near_dup_n_planes"].append(
            {
                "n_planes": n_planes,
                "n_buckets": row.n_buckets,
                "candidate_pairs": row.candidate_pairs,
                "sec": round(time.perf_counter() - t, 3),
            }
        )
    for max_bucket in (20, 100, 500):
        t = time.perf_counter()
        n = lsh_candidate_pairs(spark, sf_dir, max_bucket=max_bucket).count()
        sweep["lsh_max_bucket"].append(
            {
                "max_bucket": max_bucket,
                "candidate_pairs": n,
                "sec": round(time.perf_counter() - t, 3),
            }
        )

    out = {
        "metric": "headline_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": _sf_from_dir(sf_dir),
        "cpus": cpus,
        "n_queries": len(timings),
        "session_startup_sec": round(startup, 3),
        "warmup_sec": round(warmup, 3),
        "calibration_sec": round(calibration, 3),
        "knob_sweep": sweep,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
