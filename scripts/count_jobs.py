"""Spark-job count per declared query (guide §2.6: for the
scenario/latency gates the lever is job COUNT × scheduling latency,
not task parallelism — this measures the job count directly via the
status tracker).

Usage: python scripts/count_jobs.py <query> [<query> ...]
Prints one JSON line per query: {"name", "jobs", "sec": [...]}
(2 reps; the second rep's count is the steady-state one — the first
may include one-time fixture/codegen warm-up jobs).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

    from iceberg_tools_spark import registry
    from iceberg_tools_spark.session import get_spark
    from iceberg_tools_spark.sources.readers import TABLES, load_table

    spark = get_spark("count_jobs", cpus=cpus)
    for tbl in TABLES:
        load_table(spark, sf_dir, tbl).write.format("noop").mode("overwrite").save()

    sc = spark.sparkContext
    available = registry.queries()
    for name in sys.argv[1:]:
        fn = available[name]
        out = {"name": name, "jobs": [], "jobs_all_threads": [], "sec": []}

        def _next_job_id() -> int:
            # all jobs retained in the status store (default
            # retention 1000 — far above any gate's count per
            # invocation, so before/after deltas are exact here)
            return sc._jsc.sc().statusStore().jobsList(None).size()

        for rep in range(2):
            group = f"cj_{name}_{rep}"
            before = _next_job_id()
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            out["sec"].append(round(time.perf_counter() - t0, 3))
            sc.setJobGroup(None, None)
            # group-scoped count misses jobs submitted from other
            # threads (streaming micro-batches, §2.6 pools); the
            # DAGScheduler's monotone job counter catches them all
            out["jobs"].append(len(sc.statusTracker().getJobIdsForGroup(group)))
            out["jobs_all_threads"].append(_next_job_id() - before)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
