"""Connected-components tests: planted clusters, fixpoint,
edge-order invariance, and the cluster roll-up."""

from __future__ import annotations

import random

from iceberg_tools_spark.operators.components import connected_components, dedup_clusters

from .conftest import SF_ORACLE


def _labels(spark, pairs):
    df = spark.createDataFrame(pairs, "da bigint, db bigint")
    return {
        r.vertex: r.component for r in connected_components(df).collect()
    }


def test_chain_collapses_to_min(spark):
    # 1-2-3-4-5 chain → all component 1
    got = _labels(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_separate_clusters_stay_separate(spark):
    got = _labels(spark, [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22)])
    assert got[1] == got[2] == got[3] == 1
    assert got[10] == got[11] == 10
    assert got[20] == got[21] == got[22] == 20


def test_edge_order_and_direction_invariant(spark):
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (5, 4)]
    flipped = [(b, a) for a, b in edges]
    rng = random.Random(7)
    shuffled = edges[:]
    rng.shuffle(shuffled)
    assert _labels(spark, edges) == _labels(spark, flipped) == _labels(spark, shuffled)


def test_dedup_clusters_rollup(spark):
    rows = dedup_clusters(spark, SF_ORACLE).collect()
    assert len(rows) > 0
    seen = set()
    for r in rows:
        members = [int(x) for x in r.members_csv.split(",")]
        assert members == sorted(members)
        assert r.survivor_doc_id == min(members)
        assert r.n_members == len(members) >= 2
        assert not (set(members) & seen)  # clusters are disjoint
        seen |= set(members)


def test_long_chain_exact(spark):
    # a 200-hop chain — pathological diameter for iterative schemes —
    # is exact under spanning-forest reduction
    got = _labels(spark, [(i, i + 1) for i in range(1, 201)])
    assert set(got.values()) == {1}
    assert len(got) == 201


def test_merge_guard_raises(spark):
    # the single-task merge refuses unbounded input instead of OOMing
    import pytest
    from pyspark.errors.exceptions.captured import PythonException

    df = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 26)], "da bigint, db bigint"
    )
    with pytest.raises(PythonException, match="star edges"):
        connected_components(df, max_merge_rows=3).collect()


def test_dedup_survivors_policy(spark):
    from iceberg_tools_spark.operators.components import dedup_clusters, dedup_survivors

    sfd = "/root/testdata/sf0.01"
    surv = {r["cluster_key"]: r for r in dedup_survivors(spark, sfd).collect()}
    clusters = {r["survivor_doc_id"]: r for r in dedup_clusters(spark, sfd).collect()}
    assert set(surv) == set(clusters)  # same clustering, same keys
    docs = dict(
        spark.read.parquet(f"{sfd}/documents.parquet")
        .select("doc_id", "n_chars")
        .collect()
    )
    for key, row in surv.items():
        members = [int(m) for m in clusters[key]["members_csv"].split(",")]
        assert row["n_dropped"] == len(members) - 1
        # kept doc is the longest member (ties by min id)
        best = min(members, key=lambda m: (-docs[m], m))
        assert row["kept_doc_id"] == best
        assert row["kept_chars"] == docs[best]
