"""Tests for deterministic sampling/splitting and the salted join."""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_tools_spark.operators import sampling
from iceberg_tools_spark.operators.skew import salted_join

from .conftest import SF_ORACLE


def test_dataset_split_fractions(spark):
    rows = sampling.dataset_split(spark, SF_ORACLE).collect()
    by = {r.split: r for r in rows}
    assert set(by) == {"train", "val", "test"}
    total = sum(r.n_docs for r in rows)
    assert abs(by["train"].n_docs / total - 0.90) < 0.05
    assert abs(float(by["train"].fraction) - by["train"].n_docs / total) < 1e-6


def test_dataset_split_is_deterministic(spark):
    a = {(r.split, r.n_docs) for r in sampling.dataset_split(spark, SF_ORACLE).collect()}
    b = {(r.split, r.n_docs) for r in sampling.dataset_split(spark, SF_ORACLE).collect()}
    assert a == b


def test_stratified_sample_rates(spark):
    rows = sampling.stratified_sample(spark, SF_ORACLE).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 <= r.n_kept <= r.n_total
    # pooled rate near the 20% target
    pooled = sum(r.n_kept for r in rows) / sum(r.n_total for r in rows)
    assert abs(pooled - 0.20) < 0.05


def test_token_histogram_covers_corpus(spark):
    rows = sampling.token_count_histogram(spark, SF_ORACLE).collect()
    from iceberg_tools_spark.sources.readers import load_table

    n_docs = load_table(spark, SF_ORACLE, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert 2**r.log2_bucket <= r.min_tokens <= r.max_tokens < 2 ** (r.log2_bucket + 1)


def test_salted_join_matches_plain_join(spark):
    # one pathologically hot key (80% of rows) + a long tail
    left = spark.createDataFrame(
        [(i, "hot" if i % 5 != 0 else f"k{i}") for i in range(1000)], "row_id bigint, k string"
    )
    right = spark.createDataFrame(
        [("hot", 1.0)] + [(f"k{i}", float(i)) for i in range(0, 1000, 5)], "k string, v double"
    )
    plain = left.join(right, "k").select("row_id", "k", "v")
    salted = salted_join(left, right, ["k"], salt_by="row_id", n_salts=8).select(
        "row_id", "k", "v"
    )
    assert sorted(plain.collect()) == sorted(salted.collect())
    assert plain.count() == 1000


def test_salted_join_left_outer(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b"), (3, "zzz")], "row_id bigint, k string")
    right = spark.createDataFrame([("a", 10.0), ("b", 20.0)], "k string, v double")
    out = salted_join(left, right, ["k"], salt_by="row_id", n_salts=4, how="left").collect()
    got = {r.row_id: r.v for r in out}
    assert got == {1: 10.0, 2: 20.0, 3: None}


def test_salted_join_rejects_right_outer(spark):
    import pytest as _pt

    left = spark.createDataFrame([(1, "a")], "row_id bigint, k string")
    right = spark.createDataFrame([("a", 1.0)], "k string, v double")
    for how in ("right", "full", "full_outer", "right_outer"):
        with _pt.raises(ValueError, match="salted_join supports"):
            salted_join(left, right, ["k"], salt_by="row_id", how=how)


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    from iceberg_tools_spark.plans import checks
    from iceberg_tools_spark.sources.bucketing import read_bucketed, write_bucketed

    import shutil

    for t in ("bkt_a", "bkt_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        loc = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        shutil.rmtree(f"{loc}/{t}", ignore_errors=True)
    a = spark.range(0, 10000).selectExpr("id AS k", "id * 2 AS va")
    b = spark.range(0, 10000).selectExpr("id AS k", "id * 3 AS vb")
    write_bucketed(a, "bkt_a", ["k"], n_buckets=8)
    write_bucketed(b, "bkt_b", ["k"], n_buckets=8)
    # disable broadcast so the planner must consider the co-located
    # sort-merge path (at real scale neither side broadcasts anyway)
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = read_bucketed(spark, "bkt_a").join(read_bucketed(spark, "bkt_b"), "k")
        assert checks.shuffle_count(j) == 0, checks.plan_string(j, "simple")
        assert j.count() == 10000
        # the same join on unbucketed frames shuffles both sides
        plain = a.join(b, "k")
        assert checks.shuffle_count(plain) >= 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_mixture_plan_invariants(spark):
    from iceberg_tools_spark.operators.sampling import MIXTURE_BUDGET, mixture_plan

    rows = mixture_plan(spark, "/root/testdata/sf0.001").collect()
    assert rows, "no sources"
    wsum = sum(r["weight"] for r in rows)
    assert abs(wsum - 1.0) < 1e-9
    # integer floor-division allocation never overshoots the budget
    assert sum(r["target_tokens"] for r in rows) <= MIXTURE_BUDGET
    # each source's allocation tracks its weight to within a token
    for r in rows:
        assert abs(r["target_tokens"] - MIXTURE_BUDGET * r["weight"]) <= 1.0
        assert r["epochs"] == r["target_tokens"] / r["n_tokens"]
    # deterministic: same plan on re-run
    again = mixture_plan(spark, "/root/testdata/sf0.001").collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_group_sample_topk_mechanism(spark):
    """Per-language cap at K, deterministic across runs, and
    hash-ranked (not the first K doc_ids — the sample is spread
    across the id space)."""
    from iceberg_tools_spark.operators.sampling import (
        GROUP_SAMPLE_K,
        group_sample_topk,
    )

    sfd = "/root/testdata/sf0.01"
    rows = group_sample_topk(spark, sfd).collect()
    per = {}
    for r in rows:
        per.setdefault(r["lang"], []).append(r)
    for lang, rs in per.items():
        assert len(rs) <= GROUP_SAMPLE_K
        assert [r["rk"] for r in rs] == list(range(1, len(rs) + 1))
        hks = [r["hk"] for r in rs]
        assert hks == sorted(hks)
    again = group_sample_topk(spark, sfd).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]
    # not a head-of-table sample: sampled ids span the id range
    ids = [r["doc_id"] for r in rows]
    assert max(ids) > 10 * GROUP_SAMPLE_K
