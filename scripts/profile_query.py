"""cProfile one declared query in a warm session — driver-side wall
attribution (which collect/count/createDataFrame call dominates).
Usage: python scripts/profile_query.py <query> [<query>...]
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    from iceberg_tools_spark import registry
    from iceberg_tools_spark.session import get_spark

    spark = get_spark("profile", cpus=cpus)
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

    available = registry.queries()
    for name in sys.argv[1:]:
        fn = available[name]
        # untimed warm pass
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        pr = cProfile.Profile()
        t0 = time.perf_counter()
        pr.enable()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        pr.disable()
        wall = time.perf_counter() - t0
        s = io.StringIO()
        st = pstats.Stats(pr, stream=s).sort_stats("cumulative")
        st.print_stats(35)
        print(f"==== {name}: wall {wall:.2f}s ====")
        print("\n".join(s.getvalue().splitlines()[:60]))


if __name__ == "__main__":
    main()
