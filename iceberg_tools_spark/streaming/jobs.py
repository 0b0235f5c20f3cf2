"""Structured Streaming jobs — the streaming half of §2.3.

Each job is the streaming twin of a batch operator in
``operators/events.py``: tumbling/sliding windowed aggregation with
a watermark, gap-based sessionization via ``session_window``, and
idempotency dedup via ``dropDuplicatesWithinWatermark``.

The event-time column is rebuilt from the parquet nanos column like
the batch reader, but as TIMESTAMP (LTZ) because Spark watermarks
reject TIMESTAMP_NTZ; with the session pinned to UTC the two paths
agree on wall-clock values. Tests drive these with a file source
(maxFilesPerTrigger) into a memory sink via processAllAvailable().

Scale notes: watermarks bound state; the windowed aggregate's state
key is (window, event_type) — small; sessionization state is per
user; dedup state is bounded by the watermark horizon. These are
the exact operators you'd run against a Kafka source at 100 TB/day,
with checkpointing on durable storage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # nanos (read with nanosAsLong)
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def events_stream(spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1) -> DataFrame:
    """File-source stream over the events parquet with the same NTZ
    timestamp reconstruction as the batch path.

    Driver testdata has shipped ``ts`` as both TIMESTAMP(NANOS)
    (readable only as raw long via ``nanosAsLong``) and plain
    TIMESTAMP(MICROS); a cheap footer probe via the batch reader
    picks the matching declared stream schema."""
    import os

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    probe = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    ts_is_long = isinstance(probe["ts"].dataType, T.LongType)
    schema = EVENTS_RAW_SCHEMA if ts_is_long else T.StructType(
        [
            f if f.name != "ts" else T.StructField("ts", probe["ts"].dataType)
            for f in EVENTS_RAW_SCHEMA.fields
        ]
    )
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        # directory source + filename filter (a bare file path breaks
        # the source's basePath handling)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # watermarks require TIMESTAMP (with-local-tz), not NTZ — build
    # LTZ from the epoch micros (or cast NTZ wall-clock under the
    # session's UTC default; same instants either way)
    if ts_is_long:
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def windowed_counts(
    stream: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling (or sliding, when `slide` given) windowed counts and
    value sums per event type, late data bounded by the watermark."""
    win = (
        F.window("ts", window) if slide is None else F.window("ts", window, slide)
    )
    # watermark only applies to streaming frames; gating on
    # isStreaming lets the IDENTICAL job run in batch, which is how
    # the equivalence tests prove the streaming result correct
    # (stream == batch on the same data), not merely non-empty
    if stream.isStreaming:
        stream = stream.withWatermark("ts", watermark)
    return (
        stream
        .groupBy(win.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("decimal(38,2)").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def session_aggregates(
    stream: DataFrame, gap: str = "30 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Gap-based sessionization with ``session_window`` — the native
    streaming form of the batch lag/cumsum sessionizer."""
    if stream.isStreaming:
        stream = stream.withWatermark("ts", watermark)
    return (
        stream
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("decimal(38,2)").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def dedup_stream(stream: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Streaming idempotency: drop duplicate (user_id, event_type,
    ts) rows arriving within the watermark horizon."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["user_id", "event_type", "ts"]
    )


def run_to_memory(df: DataFrame, name: str, mode: str = "append") -> DataFrame:
    """Drive a streaming frame to completion into a memory sink and
    return the materialized table (test/debug harness). Use
    mode='complete' for aggregations (a static file source never
    advances the watermark past the final events, so append-mode
    would hold back the trailing windows)."""
    q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return df.sparkSession.table(name)
