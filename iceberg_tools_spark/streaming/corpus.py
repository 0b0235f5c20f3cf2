"""Streaming twin of the training-corpus intake pipeline: quality
gate + exact-dedup survivors over a DOCUMENTS stream.

The batch LLM-pipeline operators (`operators/text.py`, `dedup.py`)
assume the corpus is at rest; a production intake runs the same
logic over documents as they ARRIVE. Same-job-body discipline as
`streaming/jobs.py` (VERDICT r4): one function builds the plan, the
caller hands it either a batch or a streaming frame, and pytest
pins stream == batch row-for-row.

Dedup survivors are a streaming AGGREGATION (groupBy content-hash →
min doc_id), not ``dropDuplicates``: dropDuplicates keeps the
arbitrary/first arrival per key — nondeterministic across engines
and orders — while min-survivor is a deterministic fold, identical
batch or streamed (complete output mode; an availableNow backfill
holds state only for its own run). At 100 TB the state store is one
row per DISTINCT post-quality document hash; for unbounded streams
you would window the state by arrival time, which changes semantics
(dedup within horizon) and is the documented trade-off.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import norm_text, tokens

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

# intake quality gate: cheap, map-side, same thresholds either mode
MIN_TOKENS = 5
MAX_TOKENS = 100_000


def documents_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over the documents parquet (declared
    schema, rate-limited micro-batches)."""
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def corpus_intake_survivors(docs: DataFrame) -> DataFrame:
    """Quality-gate + exact-dedup survivors; works unchanged on a
    batch OR streaming `docs` frame.

    Output: one row per distinct normalized text that passed the
    gate — (content_hash, survivor_doc_id = min, n_copies).
    """
    n_tok = F.size(tokens("text"))
    gated = docs.filter(
        F.col("text").isNotNull()
        & (n_tok >= MIN_TOKENS)
        & (n_tok <= MAX_TOKENS)
    )
    return (
        gated.select("doc_id", F.md5(norm_text("text")).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("survivor_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def batch_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.schema(DOCS_SCHEMA).parquet(
        os.path.join(sf_dir, "documents.parquet")
    )
