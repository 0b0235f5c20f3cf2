"""ANN recall and LSH sanity tests for the embeddings battery."""

from __future__ import annotations

import pytest

from iceberg_tools_spark.operators import similarity

from .conftest import SF_ORACLE


@pytest.fixture(scope="module")
def brute(spark):
    rows = similarity.ann_topk_bruteforce(spark, SF_ORACLE).collect()
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(r.qid, set()).add(r.neighbor_id)
    return out


def test_bruteforce_shape(brute):
    assert len(brute) == similarity.N_QUERIES
    assert all(len(v) == similarity.TOP_K for v in brute.values())


def test_ivf_recall_vs_bruteforce(spark, brute):
    rows = similarity.ann_ivf_topk(spark, SF_ORACLE).collect()
    ivf: dict[int, set[int]] = {}
    for r in rows:
        ivf.setdefault(r.qid, set()).add(r.neighbor_id)
    assert len(ivf) == similarity.N_QUERIES
    hits = sum(len(ivf[q] & brute[q]) for q in brute)
    total = sum(len(v) for v in brute.values())
    recall = hits / total
    # nprobe=4 of 16 cells on isotropic data: recall well above the
    # 4/16 random floor demonstrates the index actually routes
    assert recall >= 0.4, f"IVF recall@{similarity.TOP_K} = {recall:.2f}"


def test_near_dup_pairs_are_bucket_mates_and_sorted(spark):
    rows = similarity.embedding_near_dup(spark, SF_ORACLE).collect()
    assert 0 < len(rows) <= similarity.NEAR_DUP_TOP
    cosines = [float(r.cosine) for r in rows]
    assert cosines == sorted(cosines, reverse=True)
    assert all(r.va < r.vb for r in rows)


def test_near_dup_plane_knob_monotone(spark):
    """n_planes is the pairs-vs-recall knob: an n-plane bucket is a
    strict prefix-coarsening of an (n+k)-plane bucket, so fewer
    planes admit a superset of candidate pairs and the top-50 floor
    cosine can only rise."""
    fine = similarity.embedding_near_dup(spark, SF_ORACLE).collect()
    coarse = similarity.embedding_near_dup(spark, SF_ORACLE, n_planes=4).collect()
    assert len(fine) == len(coarse) == similarity.NEAR_DUP_TOP
    assert min(float(r.cosine) for r in coarse) >= min(float(r.cosine) for r in fine)
