"""Per-query measurement harness for the optimization rounds.

Times one or more declared queries through the noop sink (guide
§1.4) in a warm session and writes their ``explain("formatted")``
output to ``plans/r17/<name>_<tag>.txt`` (guide §1: capture the plan
shape — Exchange count, join strategy, PushedFilters/ReadSchema,
BatchEvalPython nodes — before and after every change).

Usage:
    python scripts/measure_query.py <tag> <query> [<query> ...]
    python scripts/measure_query.py <tag> --reps 3 <query>

Prints one JSON line per query: {"name", "sec": [..], "exchanges",
"python_evals", "join_ops"}.  Not part of the driver contract; the
official comparable stays bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    args = sys.argv[1:]
    reps = 2
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i : i + 2]
    tag, names = args[0], args[1:]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

    from iceberg_tools_spark import registry
    from iceberg_tools_spark.plans.checks import plan_string
    from iceberg_tools_spark.session import get_spark

    spark = get_spark("measure", cpus=cpus)
    # same warm-up as bench.py so first-run numbers are comparable
    from iceberg_tools_spark.sources.readers import TABLES, load_table

    for tbl in TABLES:
        load_table(spark, sf_dir, tbl).write.format("noop").mode("overwrite").save()
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s):
        return s

    spark.range(32).select(_warm(F.col("id"))).write.format("noop").mode(
        "overwrite"
    ).save()

    t0 = time.perf_counter()
    spark.range(200_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    calibration = round(time.perf_counter() - t0, 3)
    print(json.dumps({"calibration_sec": calibration}))

    plans_dir = os.path.join(repo, "plans", "r17")
    os.makedirs(plans_dir, exist_ok=True)
    available = registry.queries()
    import gc

    for name in names:
        fn = available[name]
        secs = []
        for _ in range(reps):
            gc.collect()
            spark.sparkContext.setJobDescription(f"measure:{name}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            secs.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        df = fn(spark, sf_dir)
        plan = plan_string(df)
        with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print(
            json.dumps(
                {
                    "name": name,
                    "sec": secs,
                    "cal_units": [round(s / calibration, 3) for s in secs],
                    "exchanges": plan.count("Exchange"),
                    "python_evals": plan.count("EvalPython")
                    + plan.count("MapInArrow")
                    + plan.count("MapInPandas")
                    + plan.count("FlatMapGroupsInPandas"),
                    "smj": plan.count("SortMergeJoin"),
                    "bhj": plan.count("BroadcastHashJoin"),
                    "shj": plan.count("ShuffledHashJoin"),
                    "bnlj": plan.count("BroadcastNestedLoopJoin"),
                }
            )
        )


if __name__ == "__main__":
    main()
