"""Packing invariants for the sequence packer."""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_tools_spark.operators.packing import TOKEN_BUDGET, pack_sequences
from iceberg_tools_spark.sources.readers import load_table

from .conftest import SF_ORACLE


def test_every_doc_packed_exactly_once(spark):
    out = pack_sequences(spark, SF_ORACLE)
    n_docs = load_table(spark, SF_ORACLE, "documents").count()
    assert out.count() == n_docs
    assert out.select("doc_id").distinct().count() == n_docs


def test_no_pack_exceeds_budget_unless_singleton(spark):
    out = pack_sequences(spark, SF_ORACLE)
    packs = out.groupBy("pack_id").agg(
        F.sum("n_tokens").alias("tot"), F.count(F.lit(1)).alias("n")
    )
    # over-budget packs must be singletons of over-budget docs
    bad = packs.filter((F.col("tot") > TOKEN_BUDGET) & (F.col("n") > 1)).count()
    assert bad == 0
    # pack_fill column agrees with the recomputed totals
    mism = (
        out.groupBy("pack_id", "pack_fill")
        .agg(F.sum("n_tokens").alias("tot"))
        .filter(F.col("tot") != F.col("pack_fill"))
        .count()
    )
    assert mism == 0


def test_packing_is_deterministic(spark):
    a = pack_sequences(spark, SF_ORACLE).collect()
    b = pack_sequences(spark, SF_ORACLE).collect()
    assert a == b


def test_packing_efficiency(spark):
    # multi-doc packs should be mostly full: average fill of packs
    # with >1 doc above 75% of budget (greedy FFD guarantee zone)
    out = pack_sequences(spark, SF_ORACLE)
    packs = out.groupBy("pack_id").agg(
        F.sum("n_tokens").alias("tot"), F.count(F.lit(1)).alias("n")
    )
    multi = packs.filter(F.col("n") > 1)
    if multi.count() > 0:
        avg_fill = multi.agg(F.avg("tot")).first()[0]
        assert avg_fill > 0.75 * TOKEN_BUDGET, avg_fill
