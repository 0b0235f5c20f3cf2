"""Semantic dedup: planted near-duplicates are found and survived
correctly, clean corpus is untouched, cell cap guards degenerate
corpora, pairs gate matches its SQL oracle at smoke SF (the full
two-SF parity runs in test_oracle_parity)."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from iceberg_tools_spark.operators.semdedup import (
    dedup_semantic_stats,
    semantic_dedup,
)

from .conftest import SF_SMOKE

N_PLANT = 20


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    """sf0.001 embeddings + N_PLANT near-copies (cos ≈ 0.9999) of
    the first N_PLANT vectors, ids 10000+i."""
    t = pq.read_table(os.path.join(SF_SMOKE, "embeddings.parquet"))
    ids = t["vec_id"].to_pylist()
    embs = [np.array(e, dtype=np.float64) for e in t["embedding"].to_pylist()]
    add_ids, add_embs = [], []
    rng_free = 0
    for i in range(N_PLANT):
        e = embs[i].copy()
        e[rng_free % len(e)] *= 1.001  # tiny deterministic perturbation
        rng_free += 1
        add_ids.append(10000 + ids[i])
        add_embs.append(e.tolist())
    out = pa.table(
        {
            "vec_id": ids + add_ids,
            "embedding": t["embedding"].to_pylist() + add_embs,
        }
    )
    d = tmp_path_factory.mktemp("semdedup")
    pq.write_table(out, str(d / "embeddings.parquet"))
    return str(d)


def test_planted_dupes_deduped(spark, planted_dir):
    res = {r.vec_id: r for r in semantic_dedup(spark, planted_dir).collect()}
    found = 0
    for i in range(N_PLANT):
        a, b = res.get(i), res.get(10000 + i)
        if a.component == b.component:
            found += 1
            # exactly one of the pair is kept, and it's the min id
            assert a.kept and not b.kept
    # k-means cell boundaries may split a rare pair — SemDeDup's
    # documented recall trade; near-identical vectors almost always
    # co-assign
    assert found >= int(N_PLANT * 0.8), found
    # precision: nothing besides the planted copies gets dropped
    dropped = [v for v, r in res.items() if not r.kept]
    assert all(v >= 10000 for v in dropped)


def test_clean_corpus_untouched(spark):
    row = dedup_semantic_stats(spark, SF_SMOKE).collect()[0]
    assert row.n_vectors == 500
    assert row.n_kept == 500 and row.n_dropped == 0


def test_deterministic(spark, planted_dir):
    a = sorted(map(tuple, semantic_dedup(spark, planted_dir).collect()))
    b = sorted(map(tuple, semantic_dedup(spark, planted_dir).collect()))
    assert a == b


def test_cell_cap_bounds_pairs(spark, tmp_path):
    """A degenerate corpus (every vector identical → one giant cell)
    must yield ZERO candidate pairs under a cap, not a quadratic
    blow-up."""
    n = 600  # > SEM_MAX_CELL
    emb = [[1.0, 0.0, 0.5, 0.25]] * n
    pq.write_table(
        pa.table({"vec_id": list(range(n)), "embedding": emb}),
        str(tmp_path / "embeddings.parquet"),
    )
    from iceberg_tools_spark.operators.semdedup import (
        _assigned_capped,
        _cell_pairs,
    )

    assigned = _assigned_capped(spark, str(tmp_path), max_cell=100)
    # identical vectors all land in one cell of size 600 > cap
    assert _cell_pairs(assigned).count() == 0
