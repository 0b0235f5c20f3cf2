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


def test_nonconvergence_raises(spark, monkeypatch):
    # a 25-hop chain cannot close in 2 rounds of plain propagation
    import iceberg_tools_spark.operators.components as comp

    monkeypatch.setattr(comp, "MAX_ROUNDS", 2)
    df = spark.createDataFrame([(i, i + 1) for i in range(1, 26)], "da bigint, db bigint")
    import pytest

    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df).collect()
