"""Connected components over near-duplicate pairs — the transitive
step between pairwise dedup output and "one survivor per cluster".

MinHash/SimHash emit PAIRS; dedup policy needs CLUSTERS (if A~B and
B~C, keep one of {A,B,C}). Components are computed by TREE-REDUCTION
UNION-FIND (spanning-forest contraction), not iterative label
propagation:

1. **contract** — each edge partition runs union-find locally
   (Arrow-batched ``mapInPandas``) and emits its spanning STAR
   forest: one ``(vertex, local_root)`` edge per distinct vertex.
   A spanning forest preserves connectivity exactly, so this is a
   lossless contraction of E edges to ≤ V′ star edges, where V′ is
   the number of distinct vertices in the partition;
2. **reduce** — partitions are coalesced by ``fanin`` and step 1
   repeats on the star edges, shrinking the frame every level;
3. **merge** — one final task unions the surviving star forest and
   emits ``(vertex, component)``, component = min vertex id.

Why this beats iterative propagation here: label propagation costs
O(log diameter) materialized Spark jobs of ~3 shuffles each, and on
the small-after-LSH frames those jobs are pure scheduling overhead
(measured at sf0.1: ~2.5 s of stage latency for microsecond-scale
compute). The reduction is ONE lazy chain — no checkpoint, no
convergence probe, no shuffle at all (coalesce moves whole
partitions) — and is EXACT by construction rather than "converged".

At 100 TB: level 1 reads the edge list at full parallelism and
contracts each partition to its vertex set; every later level sees
only star edges over vertices that actually have duplicates. The
final merge is single-task by design — the same "bounded reduce"
shape as ``treeAggregate`` — and guarded: it raises (rather than
silently OOMing) if more than ``max_merge_rows`` star edges reach
it, the signal to add a reduce level via a smaller ``fanin``.
Component ids are min-vertex, so the output is invariant to
partitioning, edge order, and edge direction.

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

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import DEDUP_MINHASH_SQL, minhash_pairs

# reduce-tree fan-in: each level coalesces this many partitions into
# one before re-contracting. 64 keeps the per-task star-edge volume
# bounded by 64 × (largest upstream partition's vertex count).
FANIN = 64
# final-merge safety valve: more star edges than this in the single
# merge task raises instead of courting an OOM (lower `fanin` to add
# reduce levels if a corpus legitimately carries this many
# duplicate-bearing vertices).
MAX_MERGE_ROWS = 50_000_000


def _forest_kernel(max_rows: int | None):
    """Union-find over the partition's edges → its spanning star
    forest, one (vertex, root) row per distinct vertex. Roots are
    component minima (union always keeps the smaller root), so every
    level — and the final merge — labels by min id."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]  # path halving
                x = parent[x]
            return x

        n_rows = 0
        for batch in batches:
            n_rows += len(batch)
            if max_rows is not None and n_rows > max_rows:
                raise RuntimeError(
                    f"connected_components merge task received more than "
                    f"{max_rows} star edges; lower `fanin` to add reduce "
                    "levels instead of a single oversized merge"
                )
            for a, b in zip(batch["a"].to_numpy(), batch["b"].to_numpy()):
                a, b = int(a), int(b)
                if a not in parent:
                    parent[a] = a
                if b not in parent:
                    parent[b] = b
                ra, rb = find(a), find(b)
                if ra != rb:
                    if rb < ra:
                        ra, rb = rb, ra
                    parent[rb] = ra
        if parent:
            vs = sorted(parent)
            yield pd.DataFrame(
                {"a": vs, "b": [find(v) for v in vs]}, dtype="int64"
            )

    return run


def connected_components(
    edges: DataFrame,
    src: str = "da",
    dst: str = "db",
    *,
    fanin: int = FANIN,
    max_merge_rows: int = MAX_MERGE_ROWS,
) -> DataFrame:
    """(vertex, component) — component = min vertex id reachable.

    `edges` is an undirected pair list; isolated vertices absent
    from it simply keep their own id (join your full vertex set
    afterwards if you need them listed). The whole computation is
    one lazy chain (see module doc); nothing executes until the
    caller's action.

    Raises ``RuntimeError`` (from the merge task) if more than
    ``max_merge_rows`` star edges survive contraction — the guard
    against an unbounded single-task merge.
    """
    cur = edges.select(
        F.col(src).cast("bigint").alias("a"), F.col(dst).cast("bigint").alias("b")
    )
    schema = "a bigint, b bigint"
    # level 1 at input parallelism, then a fan-in ladder down to one
    # partition; the level-1 width is estimated from session configs
    # (NOT df.rdd.getNumPartitions(), which under AQE can execute
    # query stages just to answer) — the ladder only needs the right
    # order of magnitude, coalesce(parts) is exact from there down
    sc = edges.sparkSession.sparkContext
    try:
        shuffle_parts = int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        shuffle_parts = sc.defaultParallelism
    parts = max(sc.defaultParallelism, shuffle_parts)
    cur = cur.mapInPandas(_forest_kernel(None), schema=schema)
    while parts > fanin:
        parts = math.ceil(parts / fanin)
        cur = cur.coalesce(parts).mapInPandas(_forest_kernel(None), schema=schema)
    merged = cur.coalesce(1).mapInPandas(
        _forest_kernel(max_merge_rows), schema=schema
    )
    return merged.select(
        F.col("a").alias("vertex"), F.col("b").alias("component")
    )


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters from the MinHash pair list: per cluster the
    survivor (min doc id), member count, and sorted member CSV
    (bounded — LSH bucket caps bound cluster size upstream)."""
    pairs = minhash_pairs(spark, sf_dir).select("da", "db")
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


def dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship policy over the near-dup clusters: within each
    cluster KEEP the longest member (``n_chars`` desc — the
    standard keep-the-richest-copy heuristic), tie-broken by min
    doc id, and DROP the rest. Output: one row per cluster with its
    stable key (min member id), the kept doc, its length, and the
    drop count — the decision table a cleaning pipeline applies
    back to the corpus.

    Scale: clusters are LSH-bounded (bucket caps upstream), the
    doc-length join hits only clustered docs (semi-join sized), and
    the per-cluster pick is one window over cluster keys — no
    corpus-wide shuffle beyond the join.
    """
    from ..sources.readers import load_table

    pairs = minhash_pairs(spark, sf_dir).select("da", "db")
    comp = connected_components(pairs)
    docs = load_table(spark, sf_dir, "documents", ["doc_id", "n_chars"])
    members = comp.join(docs, comp["vertex"] == docs["doc_id"], "inner")

    from pyspark.sql import Window

    w = Window.partitionBy("component").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    ranked = members.select(
        "component", "doc_id", "n_chars", F.row_number().over(w).alias("rk")
    )
    return (
        ranked.groupBy("component")
        .agg(
            F.min("doc_id").alias("cluster_key"),
            F.max(F.when(F.col("rk") == 1, F.col("doc_id"))).alias("kept_doc_id"),
            F.max(F.when(F.col("rk") == 1, F.col("n_chars"))).alias("kept_chars"),
            (F.count(F.lit(1)) - F.lit(1)).alias("n_dropped"),
        )
        .select("cluster_key", "kept_doc_id", "kept_chars", "n_dropped")
        .orderBy("cluster_key")
    )


DEDUP_SURVIVORS_SQL = f"""
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
comp AS (SELECT v, MIN(label) AS component FROM cc GROUP BY v),
ranked AS (
  SELECT comp.component, d.doc_id, d.n_chars,
         ROW_NUMBER() OVER (PARTITION BY comp.component
                            ORDER BY d.n_chars DESC, d.doc_id ASC) AS rk
  FROM comp JOIN documents d ON d.doc_id = comp.v)
SELECT MIN(doc_id) AS cluster_key,
       MAX(CASE WHEN rk = 1 THEN doc_id END) AS kept_doc_id,
       MAX(CASE WHEN rk = 1 THEN n_chars END) AS kept_chars,
       COUNT(*) - 1 AS n_dropped
FROM ranked
GROUP BY component
ORDER BY cluster_key
"""
