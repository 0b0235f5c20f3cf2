"""SparkSession factory.

Single place for engine configuration so local tests and a real
cluster share the same posture: AQE on (runtime coalesce + skew
join), Arrow transfers on, UTC session time, shuffle parallelism
sized to the machine instead of the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "iceberg_tools_spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the tuned local session.

    On a real cluster the same configs apply except master/memory,
    which come from the submitter; everything here is
    cluster-neutral.
    """
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # parallelism: match cores locally; AQE coalesces the rest
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        # adaptive execution: runtime re-plan, partition coalescing,
        # skew-join splitting — the 100 TB safety nets
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # joins (r17, guide §3.1, ADVICE r16): AQE rewrites a
        # planned sort-merge to shuffled-hash at runtime when every
        # MEASURED post-shuffle partition is under the threshold
        # (64m = the AQE advisory partition size). The r16 static
        # knob (preferSortMergeJoin=false) is dropped: it flipped
        # joins on size ESTIMATES, which a post-explode/filter
        # misestimate can turn into an unspillable build side; the
        # AQE path checks actual sizes, so sort-merge stays the
        # fallback and the OOM posture is genuinely unchanged.
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            os.environ.get("SPARK_GRAFT_SHJ_LOCALMAP_MAX", "64m"),
        )
        # parquet writes (r16, guide §6): zstd — smaller than snappy
        # at similar read speed; applies to every engine/gate write
        .config("spark.sql.parquet.compression.codec", "zstd")
        # scalar Python UDFs (none on data paths, but any stragglers
        # cross the boundary as Arrow batches, not pickled rows —
        # guide §4.3/§9)
        .config("spark.sql.execution.pythonUDF.arrow.enabled", "true")
        # deterministic oracle comparisons
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow for any pandas interchange (multimodal mapInPandas)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # local mode: driver is the only JVM
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        # split size: scan tasks target this many bytes per
        # partition; at cluster SF size it (with executor memory) so
        # a partition's working set fits — 128m default is the
        # right starting point, override per deployment
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "128m"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
