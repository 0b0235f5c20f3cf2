"""Connected components over near-duplicate pairs — the transitive
step between pairwise dedup output and "one survivor per cluster".

MinHash/SimHash emit PAIRS; dedup policy needs CLUSTERS (if A~B and
B~C, keep one of {A,B,C}). Components are computed by iterative
min-label propagation:

    label(v) ← min(label(v), min over neighbors' labels)

repeated until fixpoint. Each round is two hash-shuffles (join on
edge endpoint + min-aggregate per vertex); rounds needed =
O(diameter) for plain neighbor propagation — near-dup clusters are
shallow (stars/chains of a few hops), so 3–6 rounds close real
corpora. A chain deeper than ``MAX_ROUNDS`` raises instead of
silently returning partial labels (a >20-hop near-dup chain means
the upstream LSH caps are mis-tuned; for adversarial graphs switch
to large-star/small-star, which converges in O(log n) rounds).
`localCheckpoint` after every round truncates the lineage (an
unbounded iterative plan otherwise re-executes from the source each
round and eventually overwhelms the optimizer).

This is the canonical Spark formulation of the HashToMin /
large-star algorithm family; at 100 TB the per-round cost is two
shuffles over the EDGE list (pairs ≪ corpus after LSH capping), not
the corpus.

Oracle: DuckDB ``WITH RECURSIVE`` fixpoint (VERDICT r2 #3). The
recursive CTE generates (vertex, label) pairs where a label
propagates along any path on which it is smaller than each next
vertex; the component minimum is smaller than every member, so it
reaches all of them, and ``MIN(label)`` per vertex is exactly the
component id. Cluster members are emitted as a sorted CSV string
(hash-safe on the driver gate; arrays are not in its canonical
vocabulary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import DEDUP_MINHASH_SQL, dedup_minhash_lsh

MAX_ROUNDS = 20


def connected_components(edges: DataFrame, src: str = "da", dst: str = "db") -> DataFrame:
    """(vertex, component) — component = min vertex id reachable.

    `edges` is an undirected pair list; isolated vertices absent
    from it simply keep their own id (join your full vertex set
    afterwards if you need them listed).

    Raises ``RuntimeError`` if the fixpoint is not reached within
    ``MAX_ROUNDS`` (labels would be wrong for >MAX_ROUNDS-hop
    chains; plain neighbor propagation needs O(diameter) rounds).
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

    changed = 1
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
    if changed != 0:
        raise RuntimeError(
            f"connected_components did not converge in {MAX_ROUNDS} rounds "
            "(graph diameter exceeds the round budget; raise MAX_ROUNDS or "
            "use a large-star/small-star formulation)"
        )
    return labels.select(F.col("v").alias("vertex"), F.col("label").alias("component"))


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters from the MinHash pair list: per cluster the
    survivor (min doc id), member count, and sorted member CSV
    (bounded — LSH bucket caps bound cluster size upstream)."""
    pairs = dedup_minhash_lsh(spark, sf_dir).select("da", "db")
    comp = connected_components(pairs)
    return (
        comp.groupBy("component")
        .agg(
            F.min("vertex").alias("survivor_doc_id"),
            F.count(F.lit(1)).alias("n_members"),
            F.array_join(F.array_sort(F.collect_list("vertex")), ",").alias("members_csv"),
        )
        .select("survivor_doc_id", "n_members", "members_csv")
        .orderBy("survivor_doc_id")
    )


# The pair list is the MinHash oracle verbatim (sub-select of
# DEDUP_MINHASH_SQL), so the two oracles cannot drift apart.
DEDUP_CLUSTERS_SQL = f"""
WITH RECURSIVE pairs AS (
  SELECT da, db FROM (
{DEDUP_MINHASH_SQL}
  ) mh),
und AS (
  SELECT da AS a, db AS b FROM pairs
  UNION
  SELECT db AS a, da AS b FROM pairs),
cc(v, label) AS (
  SELECT DISTINCT a AS v, a AS label FROM und
  UNION
  SELECT u.b AS v, cc.label
  FROM cc JOIN und u ON u.a = cc.v
  WHERE cc.label < u.b),
comp AS (SELECT v, MIN(label) AS component FROM cc GROUP BY v)
SELECT MIN(v) AS survivor_doc_id,
       COUNT(*) AS n_members,
       array_to_string(list(v ORDER BY v), ',') AS members_csv
FROM comp
GROUP BY component
ORDER BY survivor_doc_id
"""
