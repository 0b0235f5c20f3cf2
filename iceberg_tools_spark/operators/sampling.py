"""Deterministic sampling / splitting operators for training-data
pipelines (SURVEY §2.4 extras).

Everything keys off md5 arithmetic (functions/hashing.py recipes) so
assignments are (a) reproducible run-over-run and engine-over-engine
— no RNG state, no partition-order dependence — and (b) uniformly
distributed, so split fractions hold at any scale and the hash keys
shuffle without skew. This is how production corpus pipelines pin
train/val/test membership: re-running the pipeline, adding data, or
changing parallelism never moves an existing document to another
split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import md5_i64, md5_i64_duck
from ..sources.readers import load_table

D38_6 = "decimal(38,6)"

# train/val/test = 90/5/5 by hash bucket (out of 100)
SPLIT_SALT = "split-v1"
TRAIN_CUT = 90
VAL_CUT = 95

# stratified sample: keep ~20% per language
STRATA_SALT = "strat-v1"
STRATA_PCT = 20


def dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test split of documents by
    md5(doc_id) bucket; returns per-split counts + fractions.

    Scale: assignment is a map-side column expression (no shuffle,
    no RNG); only the 3-row summary aggregates.
    """
    d = load_table(spark, sf_dir, "documents", ["doc_id"])
    bucket = md5_i64(F.col("doc_id").cast("string"), SPLIT_SALT) % 100
    split = (
        F.when(bucket < TRAIN_CUT, "train")
        .when(bucket < VAL_CUT, "val")
        .otherwise("test")
    )
    from pyspark.sql import Window

    counts = (
        d.select(split.alias("split"))
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    # the all-rows window runs over ≤3 post-aggregate rows — not a
    # scale concern, and it avoids a second pass over documents
    total = F.sum("n_docs").over(Window.partitionBy())
    return (
        counts.select(
            "split",
            "n_docs",
            (F.col("n_docs").cast("double") / total.cast("double")).cast(D38_6).alias("fraction"),
        )
        .orderBy("split")
    )


_BUCKET_DUCK = f"{md5_i64_duck('doc_id::VARCHAR', SPLIT_SALT)} % 100"

DATASET_SPLIT_SQL = f"""
WITH assigned AS (
  SELECT CASE WHEN {_BUCKET_DUCK} < {TRAIN_CUT} THEN 'train'
              WHEN {_BUCKET_DUCK} < {VAL_CUT} THEN 'val'
              ELSE 'test' END AS split
  FROM documents)
SELECT split, COUNT(*) AS n_docs,
       CAST(CAST(COUNT(*) AS DOUBLE) / CAST(SUM(COUNT(*)) OVER () AS DOUBLE) AS DECIMAL(38,6)) AS fraction
FROM assigned
GROUP BY split
ORDER BY split
"""


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~20% per-language sample: keep a document when
    md5(doc_id) mod 100 < 20, reported per stratum (kept/total).

    Scale: the keep decision is map-side; one shuffle for the
    per-language aggregate. Unlike ``df.sampleBy``, membership is
    stable across runs and engines.
    """
    d = load_table(spark, sf_dir, "documents", ["doc_id", "lang"])
    keep = (md5_i64(F.col("doc_id").cast("string"), STRATA_SALT) % 100) < STRATA_PCT
    return (
        d.select("lang", keep.cast("int").alias("kept"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum("kept").alias("n_kept"),
        )
        .select(
            "lang",
            "n_total",
            "n_kept",
            (F.col("n_kept").cast("double") / F.col("n_total").cast("double"))
            .cast(D38_6)
            .alias("kept_frac"),
        )
        .orderBy("lang")
    )


_KEEP_DUCK = f"({md5_i64_duck('doc_id::VARCHAR', STRATA_SALT)} % 100) < {STRATA_PCT}"

STRATIFIED_SAMPLE_SQL = f"""
SELECT lang, COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN {_KEEP_DUCK} THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(CAST(SUM(CASE WHEN {_KEEP_DUCK} THEN 1 ELSE 0 END) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE) AS DECIMAL(38,6)) AS kept_frac
FROM documents
GROUP BY lang
ORDER BY lang
"""


def token_count_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus length profile: documents per power-of-two token-count
    bucket (floor(log2(n_tokens))), with per-bucket token totals —
    the curve you consult before packing sequences for training.

    Scale: token count is a map-side split+size; one shuffle on the
    ~32 bucket keys.
    """
    d = load_table(spark, sf_dir, "documents", ["doc_id", "text"])
    n_tok = F.size(F.split(F.trim("text"), r"\s+"))
    bucket = F.floor(F.log2(n_tok)).cast("bigint")
    return (
        d.select(bucket.alias("log2_bucket"), n_tok.alias("n"))
        .groupBy("log2_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n").alias("n_tokens"),
            F.min("n").alias("min_tokens"),
            F.max("n").alias("max_tokens"),
        )
        .orderBy("log2_bucket")
    )


TOKEN_HISTOGRAM_SQL = """
WITH t AS (
  SELECT CAST(floor(log2(len(regexp_split_to_array(trim(text), '\\s+')))) AS BIGINT) AS log2_bucket,
         len(regexp_split_to_array(trim(text), '\\s+')) AS n
  FROM documents)
SELECT log2_bucket, COUNT(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS n_tokens,
       MIN(n) AS min_tokens, MAX(n) AS max_tokens
FROM t
GROUP BY log2_bucket
ORDER BY log2_bucket
"""


# temperature-weighted mixture: α = 1/2 (temperature 2) via integer
# sqrt so every aggregate is exact integer arithmetic — identical on
# both engines regardless of reduction order (a float sqrt SUM would
# be order-sensitive in the last ulp)
MIXTURE_BUDGET = 10_000_000  # training-token budget to allocate


def mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture planner: given per-source token counts and a
    total token budget, allocate the budget by temperature-weighted
    sampling (weight ∝ √tokens — the standard down-weighting of
    huge crawl sources vs small curated ones) and report, per
    source: docs, tokens, mixture weight, allocated tokens, and
    epochs (allocated ÷ available — >1 means the source repeats,
    the signal to watch for memorization).

    Scale: one map-side token count + one shuffle on the handful of
    source keys; the budget math is a broadcast of one total row.
    All allocations are exact integer arithmetic (floor-sqrt
    weights), so the plan is reproducible bit-for-bit anywhere.
    """
    d = load_table(spark, sf_dir, "documents", ["source", "text"])
    n_tok = F.size(F.split(F.trim("text"), r"\s+")).cast("long")
    per = (
        d.select("source", n_tok.alias("n"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n").alias("n_tokens"))
        .withColumn("s", F.floor(F.sqrt(F.col("n_tokens").cast("double"))).cast("long"))
    )
    total = per.agg(F.sum("s").alias("s_total"))
    return (
        per.crossJoin(F.broadcast(total))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            (F.col("s").cast("double") / F.col("s_total").cast("double")).alias("weight"),
            ((F.lit(MIXTURE_BUDGET) * F.col("s")) / F.col("s_total"))
            .cast("long")
            .alias("target_tokens"),
            (
                ((F.lit(MIXTURE_BUDGET) * F.col("s")) / F.col("s_total")).cast("long")
                .cast("double")
                / F.col("n_tokens").cast("double")
            ).alias("epochs"),
        )
        .orderBy("source")
    )


MIXTURE_PLAN_SQL = f"""
WITH per AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
w AS (
  SELECT *, CAST(FLOOR(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS s FROM per
),
tot AS (SELECT CAST(SUM(s) AS BIGINT) AS s_total FROM w)
SELECT source, n_docs, n_tokens,
       CAST(s AS DOUBLE) / CAST(s_total AS DOUBLE) AS weight,
       CAST({MIXTURE_BUDGET} * s // s_total AS BIGINT) AS target_tokens,
       CAST(CAST({MIXTURE_BUDGET} * s // s_total AS BIGINT) AS DOUBLE)
         / CAST(n_tokens AS DOUBLE) AS epochs
FROM w, tot
ORDER BY source
"""


GROUP_SAMPLE_K = 25
GROUP_SAMPLE_SALT = "gsample-v1"


def group_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-size per-group sample — the reservoir-
    sample shape every dataset-inspection pipeline needs ("show me
    K random docs per language"), made reproducible: rank docs
    within each language by salted md5(doc_id) and keep the first
    ``GROUP_SAMPLE_K``. Same sample across runs, engines, and
    executor counts — no RNG, no seed-ordering hazard.

    Scale: ONE shuffle on the group key; the window's per-group sort
    is by an 8-byte hash (uniform — md5 — so group skew is the data's
    own language skew, which a salted secondary key cannot fix and a
    production run would cap per group anyway). Emitting rank + hash
    keeps the certified surface exact-integer."""
    d = load_table(spark, sf_dir, "documents", ["doc_id", "lang"])
    from pyspark.sql import Window

    hk = md5_i64(F.col("doc_id").cast("string"), GROUP_SAMPLE_SALT)
    w = Window.partitionBy("lang").orderBy(F.col("hk"), F.col("doc_id"))
    return (
        d.select("lang", "doc_id", hk.alias("hk"))
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= GROUP_SAMPLE_K)
        .select("lang", "rk", "doc_id", "hk")
        .orderBy("lang", "rk")
    )


_GS_HK = md5_i64_duck("doc_id::VARCHAR", GROUP_SAMPLE_SALT)

GROUP_SAMPLE_SQL = f"""
WITH ranked AS (
  SELECT lang, doc_id, {_GS_HK} AS hk,
         CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY {_GS_HK}, doc_id)
              AS BIGINT) AS rk
  FROM documents)
SELECT lang, rk, doc_id, hk
FROM ranked
WHERE rk <= {GROUP_SAMPLE_K}
ORDER BY lang, rk
"""
