"""End-to-end training-data pipeline composition: the library's
operators chained the way a corpus pipeline actually runs —

    quality filter → exact dedup → near-dup (MinHash) removal →
    deterministic split → length profile

— asserting the invariants that matter between stages (monotone
shrinkage, survivor uniqueness, split stability). This is the
integration test for operators COMPOSING, not just passing their
individual oracles."""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_tools_spark.functions.hashing import md5_i64
from iceberg_tools_spark.functions.text import norm_text
from iceberg_tools_spark.operators import dedup
from iceberg_tools_spark.operators.text import text_quality
from iceberg_tools_spark.sources.readers import load_table

from .conftest import SF_ORACLE


def test_corpus_pipeline_end_to_end(spark):
    docs = load_table(spark, SF_ORACLE, "documents", ["doc_id", "text"])
    n0 = docs.count()

    # 1. quality gate: keep docs the quality scorer marks keep=true
    quality = text_quality(spark, SF_ORACLE).select("doc_id", "keep")
    kept = docs.join(quality.filter(F.col("keep") == 1), "doc_id").select("doc_id", "text")
    n1 = kept.count()
    assert 0 < n1 <= n0

    # 2. exact dedup: one survivor per normalized-content hash
    survivors = (
        kept.select("doc_id", F.md5(norm_text("text")).alias("h"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    n2 = survivors.count()
    assert 0 < n2 <= n1
    # survivor doc_ids unique
    assert survivors.select("doc_id").distinct().count() == n2

    # 3. near-dup removal: drop the higher doc_id of each MinHash pair
    pairs = dedup.dedup_minhash_lsh(spark, SF_ORACLE).select("da", "db")
    to_drop = pairs.join(
        survivors.select(F.col("doc_id").alias("da")), "da"
    ).select(F.col("db").alias("doc_id")).distinct()
    final = survivors.join(to_drop, "doc_id", "left_anti")
    n3 = final.count()
    assert 0 < n3 <= n2

    # 4. deterministic split of the final corpus
    bucket = md5_i64(F.col("doc_id").cast("string"), "split-v1") % 100
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )
    split_counts = dict(
        final.select(split.alias("s")).groupBy("s").count().collect()
    )
    assert sum(split_counts.values()) == n3
    # re-running yields the identical assignment (no RNG anywhere)
    split_counts2 = dict(
        final.select(split.alias("s")).groupBy("s").count().collect()
    )
    assert split_counts == split_counts2

    # 5. the whole chain is one lazy plan — no Python eval snuck in
    from iceberg_tools_spark.plans import checks

    assert checks.no_python_eval(final)


def test_pii_scrub_null_text_counts_zero(spark, tmp_path):
    """NULL text must count 0 emails/urls on BOTH engines (ADVICE
    r5: F.size yields -1/NULL while DuckDB len() yields NULL)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_tools_spark.operators.text import PII_SCRUB_SQL, pii_scrub_stats

    pq.write_table(
        pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["mail me a@b.co", None], pa.string()),
            "lang": pa.array(["en", "en"], pa.string()),
            "source": pa.array(["s", "s"], pa.string()),
            "n_chars": pa.array([14, 0], pa.int64()),
        }),
        tmp_path / "documents.parquet",
    )
    rows = {r.doc_id: r for r in pii_scrub_stats(spark, str(tmp_path)).collect()}
    assert rows[1].n_emails == 1
    assert rows[2].n_emails == 0 and rows[2].n_urls == 0
    assert rows[2].scrubbed_md5 is None

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    duck = {r[0]: r for r in con.execute(PII_SCRUB_SQL).fetchall()}
    assert duck[2][1] == 0 and duck[2][2] == 0


def _write_docs(tmp_path, texts, sources=None):
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = len(texts)
    sources = sources or ["s"] * n
    pq.write_table(
        pa.table({
            "doc_id": pa.array(list(range(1, n + 1)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array([len(t or "") for t in texts], pa.int64()),
        }),
        tmp_path / "documents.parquet",
    )


def test_doc_repetition_planted(spark, tmp_path):
    """Planted repetition: a doc that is one 5-gram repeated, a doc
    with all-unique 5-grams, and a doc shorter than 5 tokens."""
    from iceberg_tools_spark.operators.text import doc_repetition_stats

    loop = "a b c d e " * 10  # 50 tokens, every 5-gram drawn from 5 rotations
    uniq = " ".join(f"w{i}" for i in range(50))
    _write_docs(tmp_path, [loop.strip(), uniq, "too short"])
    rows = {r.doc_id: r for r in doc_repetition_stats(spark, str(tmp_path)).collect()}
    assert rows[1].n_grams == 46 and rows[1].n_dup_grams == 41  # 5 distinct rotations
    assert float(rows[1].rep_ratio) > 0.85
    assert rows[2].n_grams == 46 and rows[2].n_dup_grams == 0
    assert float(rows[2].rep_ratio) == 0.0
    assert rows[3].n_grams == 0 and rows[3].n_dup_grams == 0
    assert float(rows[3].rep_ratio) == 0.0


def test_doc_repetition_is_map_side(spark):
    from iceberg_tools_spark.operators.text import doc_repetition_stats
    from iceberg_tools_spark.plans import checks

    from .conftest import SF_ORACLE

    # one shuffle budget: the presentation sort, nothing else
    assert checks.shuffle_count(doc_repetition_stats(spark, SF_ORACLE)) <= 1


def test_source_dup_planted(spark, tmp_path):
    """Duplicates across sources count in EVERY source holding a
    copy (corpus-wide multiplicity, not per-source)."""
    from iceberg_tools_spark.operators.text import source_dup_stats

    _write_docs(
        tmp_path,
        ["same text", "same  TEXT ", "unique one", "unique two"],
        sources=["crawlA", "crawlB", "crawlA", "crawlB"],
    )
    rows = {r.source: r for r in source_dup_stats(spark, str(tmp_path)).collect()}
    assert rows["crawlA"].n_docs == 2 and rows["crawlA"].n_dup_docs == 1
    assert rows["crawlB"].n_docs == 2 and rows["crawlB"].n_dup_docs == 1
    assert abs(float(rows["crawlA"].dup_ratio) - 0.5) < 1e-9


def test_corpus_filter_funnel_planted(spark, tmp_path):
    """One doc per failure mode: empty, too short, punctuation soup,
    an exact duplicate pair — the funnel loses exactly one doc per
    stage and reports monotone counts."""
    from iceberg_tools_spark.operators.text import corpus_filter_funnel

    _write_docs(
        tmp_path,
        [
            "   ",                                    # fails non_empty
            "too short",                              # fails token_band (2 tokens)
            "!!! ... ,,, ;;; ??? dots, dots. more!",  # fails punct_cap
            "a perfectly fine document with enough tokens",
            "a perfectly fine DOCUMENT with enough tokens",  # exact dup (normalized)
            "another clean document with plenty of words here",
        ],
    )
    rows = {r.stage_name: r.n_docs for r in corpus_filter_funnel(spark, str(tmp_path)).collect()}
    assert rows == {
        "total": 6,
        "non_empty": 5,
        "token_band": 4,
        "punct_cap": 3,
        "dedup_survivor": 2,
    }
