"""Scaled dedup corpus for the bench's scale-evidence table.

The driver ships testdata at sf ≤ 0.1; VERDICT r5 #9 asks for
measured evidence that the dedup family's DF/bucket caps deliver the
near-linear growth they promise. There is no driver sf1.0, so this
derives one mechanically from the DRIVER'S OWN sf0.1 documents table
(never from synthetic text): ``REPLICAS`` copies, each with

  * ``doc_id`` offset by ``replica * ID_STRIDE`` (keeps ids disjoint
    and the original ids recoverable as ``doc_id % ID_STRIDE``), and
  * one replica-specific token appended to ``text`` for replicas
    > 0, so copies of a document are NEAR-duplicates (word set
    differs by exactly one token), not byte-identical — the exact
    hash-groupBy must NOT collapse them, while MinHash/SimHash
    should still bucket them together. This reproduces at 10× scale
    the adversarial regime the caps exist for: every near-dup group
    becomes 10× wider.

Deterministic (no randomness), pure Spark, one job. Output parquet
lands under ``.scale/`` (gitignored); only ``documents.parquet`` is
materialized because the dedup family reads nothing else.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

REPLICAS = 10
ID_STRIDE = 100_000_000


def scaled_documents(spark: SparkSession, src_dir: str) -> DataFrame:
    base = spark.read.parquet(os.path.join(src_dir, "documents.parquet"))
    parts = []
    for r in range(REPLICAS):
        text = (
            F.col("text")
            if r == 0
            else F.concat(F.col("text"), F.lit(f" replicatoken{r}"))
        )
        parts.append(
            base.select(
                (F.col("doc_id") + F.lit(r * ID_STRIDE)).alias("doc_id"),
                text.alias("text"),
                "lang",
                "source",
                F.length(text).cast("bigint").alias("n_chars"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def scaled_embeddings(spark: SparkSession, src_dir: str) -> DataFrame:
    """REPLICAS copies of the driver's embeddings with disjoint ids;
    replicas > 0 get a tiny deterministic per-replica perturbation
    (cosine ≈ 1 − ε to the original — NOT a pure rescale, which
    cosine would ignore), so every semantic-dup cell becomes
    REPLICAS× wider: the adversarial regime SemDeDup's ``max_cell``
    cap exists for (VERDICT r8 #8)."""
    base = spark.read.parquet(os.path.join(src_dir, "embeddings.parquet"))
    parts = []
    for r in range(REPLICAS):
        emb = (
            F.col("embedding")
            if r == 0
            else F.expr(
                "transform(embedding, (x, i) -> "
                f"CAST(x + {r} * 0.0005 * cos(CAST(i AS DOUBLE)) AS FLOAT))"
            )
        )
        parts.append(
            base.select(
                (F.col("vec_id") + F.lit(r * ID_STRIDE)).alias("vec_id"),
                emb.alias("embedding"),
                "label",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def ensure_scale_dir(spark: SparkSession, src_dir: str, out_root: str) -> str:
    """Write (once) and return the scaled sf directory. Tables are
    materialized individually, so a dir cached by an older round
    gains newly-added tables on the next call."""
    out_dir = os.path.join(out_root, f"sf1.0x{REPLICAS}")
    docs = os.path.join(out_dir, "documents.parquet")
    if not os.path.exists(os.path.join(docs, "_SUCCESS")):
        scaled_documents(spark, src_dir).repartition(32).write.mode(
            "overwrite"
        ).parquet(docs)
    embs = os.path.join(out_dir, "embeddings.parquet")
    if not os.path.exists(os.path.join(embs, "_SUCCESS")):
        scaled_embeddings(spark, src_dir).repartition(8).write.mode(
            "overwrite"
        ).parquet(embs)
    marker = os.path.join(out_dir, "_DONE")
    with open(marker, "w") as f:
        f.write(f"replicas={REPLICAS} src={src_dir}\n")
    return out_dir


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from iceberg_tools_spark.session import get_spark

    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    root = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale"
    )
    spark = get_spark("gen-scale", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    print(ensure_scale_dir(spark, src, root))
