"""Embedding similarity battery (SURVEY.md §2.4, vectors half).

Scale design:
* ``embedding_norm_stats`` — one groupBy(label); per-row norms are
  map-side column math.
* ``ann_topk_bruteforce`` — the CORRECTNESS BASELINE: a deliberate
  (small) crossJoin of a 10-query probe set against the corpus. The
  query side is broadcast, so even this "brute force" is a
  broadcast-nested-loop with no shuffle of the corpus; still, the
  corpus-side scan is O(N·Q) — at 100 TB you use the IVF path below.
* ``embedding_near_dup`` — random-hyperplane LSH: 8 md5-derived
  hyperplanes → 256 uniform buckets; pairs only meet inside a
  bucket (E[pairs] ≈ N²/2·256 for random data, linearly fewer with
  more planes); top-50 by exact cosine among bucket-mates.
* ``ann_ivf_topk`` — IVF index: 16 deterministic seed centroids,
  one Lloyd refinement round, probe the 4 nearest cells per query
  (rows-only: iterative/argmin logic is not concisely
  SQL-expressible; recall-vs-bruteforce is pytest-checked).

All vector math is the deterministic left-fold from
functions/vectors.py — bit-identical in DuckDB — and cosine values
never appear as raw doubles in checked output (DECIMAL(38,6)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vectors import (
    DOT_DUCK,
    SUM_SQUARES_DUCK,
    dot_fast,
    hyperplane_sign,
    hyperplane_sign_duck,
    sum_squares,
)
from ..sources.readers import load_table

D38_6 = "decimal(38,6)"

N_QUERIES = 10
TOP_K = 5
N_PLANES = 8
NEAR_DUP_TOP = 50
IVF_CELLS = 16
IVF_NPROBE = 4


def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding hygiene per label: count, zero-vector count, min/max
    L2 norm, and average norm (computed over exact DECIMAL(18,9)
    castings so the group-sum is order-independent)."""
    e = load_table(spark, sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    ss = sum_squares("embedding")
    e = e.select(
        F.col("label").cast("bigint").alias("label"),
        F.sqrt(ss).alias("norm"),
    )
    norm_dec = F.col("norm").cast("decimal(18,9)")
    return (
        e.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.count(F.when(F.col("norm") == 0.0, 1)).alias("n_zero"),
            F.min(norm_dec).alias("min_norm"),
            F.max(norm_dec).alias("max_norm"),
            (F.sum(norm_dec).cast("double") / F.count(F.lit(1))).cast(D38_6).alias("avg_norm"),
        )
        .orderBy("label")
    )


_SS = SUM_SQUARES_DUCK.format(a="embedding")

NORM_STATS_SQL = f"""
WITH n AS (SELECT CAST(label AS BIGINT) AS label, sqrt({_SS}) AS norm FROM embeddings)
SELECT label, COUNT(*) AS n_vecs,
       COUNT(CASE WHEN norm = 0.0 THEN 1 END) AS n_zero,
       MIN(CAST(norm AS DECIMAL(18,9))) AS min_norm,
       MAX(CAST(norm AS DECIMAL(18,9))) AS max_norm,
       CAST(CAST(SUM(CAST(norm AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*) AS DECIMAL(38,6)) AS avg_norm
FROM n
GROUP BY label
ORDER BY label
"""


def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors for the 10-query probe set
    (vec_id < 10) — the ANN correctness baseline. Output is ids and
    ranks only; ties broken by neighbor id."""
    e = load_table(spark, sf_dir, "embeddings", ["vec_id", "embedding"])
    base = e.select("vec_id", "embedding", sum_squares("embedding").alias("ss"))
    q = base.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qemb"),
        F.col("ss").alias("qss"),
    )
    cos = dot_fast("embedding", "qemb") / (F.sqrt(F.col("ss")) * F.sqrt(F.col("qss")))
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        base.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", cos.alias("cos"))
        .select(
            "qid",
            F.col("vec_id").alias("neighbor_id"),
            F.row_number().over(w).cast("bigint").alias("rk"),
            F.col("cos").cast(D38_6).alias("cosine"),
        )
        .filter(F.col("rk") <= TOP_K)
        .orderBy("qid", "rk")
    )


_DOT_Q = DOT_DUCK.format(a="c.embedding", b="q.embedding")
_SS_C = SUM_SQUARES_DUCK.format(a="c.embedding")
_SS_Q = SUM_SQUARES_DUCK.format(a="q.embedding")

ANN_BRUTE_SQL = f"""
WITH pairs AS (
  SELECT q.vec_id AS qid, c.vec_id AS neighbor_id,
         {_DOT_Q} / (sqrt({_SS_C}) * sqrt({_SS_Q})) AS cos
  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERIES})
SELECT qid, neighbor_id, rk, CAST(cos AS DECIMAL(38,6)) AS cosine
FROM (SELECT qid, neighbor_id, cos,
             CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rk
      FROM pairs) t
WHERE rk <= {TOP_K}
ORDER BY qid, rk
"""


def _with_bucket(e: DataFrame) -> DataFrame:
    bits = F.concat(*[hyperplane_sign("embedding", p) for p in range(N_PLANES)])
    return e.select(
        "vec_id", "embedding", sum_squares("embedding").alias("ss"), bits.alias("bucket")
    )


def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-similar vector pairs via random-hyperplane LSH: pairs
    are only compared inside an 8-bit sign bucket; top-50 by exact
    cosine. (The synthetic corpus has no true near-dups — max
    pairwise cosine ≈ 0.51 — so this emits the top of the bucketed
    similarity ranking rather than thresholded survivors.)"""
    e = load_table(spark, sf_dir, "embeddings", ["vec_id", "embedding"])
    b = _with_bucket(e)
    x = b.select(
        F.col("vec_id").alias("va"),
        F.col("embedding").alias("ea"),
        F.col("ss").alias("ssa"),
        "bucket",
    )
    y = b.select(
        F.col("vec_id").alias("vb"),
        F.col("embedding").alias("eb"),
        F.col("ss").alias("ssb"),
        "bucket",
    )
    cos = dot_fast("ea", "eb") / (F.sqrt(F.col("ssa")) * F.sqrt(F.col("ssb")))
    return (
        x.join(y, "bucket")
        .filter(F.col("va") < F.col("vb"))
        .select("va", "vb", cos.cast(D38_6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), "va", "vb")
        .limit(NEAR_DUP_TOP)
    )


_BUCKET_DUCK = " || ".join(hyperplane_sign_duck("embedding", p) for p in range(N_PLANES))
_DOT_XY = DOT_DUCK.format(a="x.embedding", b="y.embedding")
_SS_X = SUM_SQUARES_DUCK.format(a="x.embedding")
_SS_Y = SUM_SQUARES_DUCK.format(a="y.embedding")

NEAR_DUP_SQL = f"""
WITH bkt AS (SELECT vec_id, embedding, {_BUCKET_DUCK} AS bucket FROM embeddings)
SELECT x.vec_id AS va, y.vec_id AS vb,
       CAST({_DOT_XY} / (sqrt({_SS_X}) * sqrt({_SS_Y})) AS DECIMAL(38,6)) AS cosine
FROM bkt x JOIN bkt y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
ORDER BY cosine DESC, va, vb
LIMIT {NEAR_DUP_TOP}
"""


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN (rows-only): deterministic seed centroids
    (vec_id < 16), one Lloyd refinement round, probe the 4 nearest
    cells per query, exact top-5 within the probed cells.

    Plan shape at scale: centroids are a broadcast array (16×dims);
    assignment is a map-side argmin (explode over 16 centroids +
    min-reduce); only the probed cells' vectors are scored per
    query. At 100 TB you'd train centroids on a sample — here the
    seed+one-round scheme keeps the whole operator deterministic.
    """
    e = load_table(spark, sf_dir, "embeddings", ["vec_id", "embedding"])
    base = e.select("vec_id", "embedding", sum_squares("embedding").alias("ss"))

    seeds = base.filter(F.col("vec_id") < IVF_CELLS).select(
        F.col("vec_id").alias("cell"),
        F.col("embedding").alias("cemb"),
        F.col("ss").alias("css"),
    )

    def assign(df: DataFrame, cents: DataFrame) -> DataFrame:
        # dist² = ss − 2·dot + css; argmin over cells
        d2 = F.col("ss") - 2 * dot_fast("embedding", "cemb") + F.col("css")
        w = Window.partitionBy("vec_id").orderBy(F.col("d2"), F.col("cell"))
        return (
            df.crossJoin(F.broadcast(cents))
            .select("vec_id", "embedding", "ss", "cell", d2.alias("d2"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn", "d2")
        )

    assigned = assign(base, seeds)
    # one Lloyd round: per-cell per-dimension mean → refreshed centroids
    pos = assigned.select("cell", F.posexplode("embedding").alias("pos", "val"))
    means = pos.groupBy("cell", "pos").agg(F.avg("val").alias("m"))
    cents2 = means.groupBy("cell").agg(
        F.expr("transform(array_sort(collect_list(struct(pos, m))), x -> x.m)").alias("cemb")
    )
    # 16 rows, but their lineage is the full Lloyd round — three
    # downstream branches (re-assignment, query probing via
    # broadcast) would each recompute it; materialize once
    cents2 = cents2.select("cell", "cemb", sum_squares("cemb").alias("css")).localCheckpoint()
    assigned2 = assign(base, cents2)

    q = base.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qemb"),
        F.col("ss").alias("qss"),
    )
    # probe the nprobe nearest refreshed cells per query
    qd2 = F.col("qss") - 2 * dot_fast("qemb", "cemb") + F.col("css")
    wq = Window.partitionBy("qid").orderBy(F.col("d2"), F.col("cell"))
    probes = (
        q.crossJoin(F.broadcast(cents2))
        .select("qid", "qemb", "qss", "cell", qd2.alias("d2"))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= IVF_NPROBE)
        .select("qid", "qemb", "qss", "cell")
    )
    cos = dot_fast("embedding", "qemb") / (F.sqrt(F.col("ss")) * F.sqrt(F.col("qss")))
    wr = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        assigned2.join(probes, "cell")
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", cos.alias("cos"))
        .select(
            "qid",
            F.col("vec_id").alias("neighbor_id"),
            F.row_number().over(wr).cast("bigint").alias("rk"),
        )
        .filter(F.col("rk") <= TOP_K)
        .orderBy("qid", "rk")
    )
