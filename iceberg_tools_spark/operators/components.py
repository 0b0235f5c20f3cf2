"""Connected components over near-duplicate pairs — the transitive
step between pairwise dedup output and "one survivor per cluster".

MinHash/SimHash emit PAIRS; dedup policy needs CLUSTERS (if A~B and
B~C, keep one of {A,B,C}). Components are computed by iterative
min-label propagation:

    label(v) ← min(label(v), min over neighbors' labels)

repeated until fixpoint. Each round is two hash-shuffles (join on
edge endpoint + min-aggregate per vertex); rounds needed =
O(log(diameter)) with the doubled edge list — near-dup clusters are
shallow (stars/chains of a few hops), so 3–6 rounds close real
corpora. `localCheckpoint` after every round truncates the lineage
(an unbounded iterative plan otherwise re-executes from the source
each round and eventually overwhelms the optimizer).

This is the canonical Spark formulation of the HashToMin /
large-star algorithm family; at 100 TB the per-round cost is two
shuffles over the EDGE list (pairs ≪ corpus after LSH capping), not
the corpus.

rows-only in the contract (iterative; not SQL-expressible);
`tests/test_components.py` checks planted clusters, fixpoint, and
invariance to edge order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import dedup_minhash_lsh

MAX_ROUNDS = 20


def connected_components(edges: DataFrame, src: str = "da", dst: str = "db") -> DataFrame:
    """(vertex, component) — component = min vertex id reachable.

    `edges` is an undirected pair list; isolated vertices absent
    from it simply keep their own id (join your full vertex set
    afterwards if you need them listed).
    """
    und = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).union(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    ).distinct().localCheckpoint()

    labels = (
        und.select(F.col("a").alias("v"))
        .distinct()
        .withColumn("label", F.col("v"))
        .localCheckpoint()
    )

    for _ in range(MAX_ROUNDS):
        neighbor_min = (
            und.join(labels, und.a == labels.v)
            .select(F.col("b").alias("v"), "label")
            .groupBy("v")
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, "v", "left")
            .select("v", F.least("label", F.coalesce("nmin", "label")).alias("label"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "v")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("v").alias("vertex"), F.col("label").alias("component"))


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters from the MinHash pair list: per cluster the
    survivor (min doc id), member count, and members array (sorted;
    bounded — LSH bucket caps bound cluster size upstream)."""
    pairs = dedup_minhash_lsh(spark, sf_dir).select("da", "db")
    comp = connected_components(pairs)
    return (
        comp.groupBy("component")
        .agg(
            F.min("vertex").alias("survivor_doc_id"),
            F.count(F.lit(1)).alias("n_members"),
            F.array_sort(F.collect_list("vertex")).alias("members"),
        )
        .select("survivor_doc_id", "n_members", "members")
        .orderBy("survivor_doc_id")
    )
