"""Streaming smoke tests (file source → memory sink) and multimodal
mapInPandas plumbing tests."""

from __future__ import annotations

import pytest

from iceberg_tools_spark.operators import multimodal as mm
from iceberg_tools_spark.streaming import jobs

from .conftest import SF_SMOKE


# ---------------------------------------------------------- streaming


def test_streaming_windowed_counts(spark):
    s = jobs.events_stream(spark, SF_SMOKE)
    out = jobs.run_to_memory(jobs.windowed_counts(s), "t_win", mode="complete")
    rows = out.collect()
    assert len(rows) > 0
    assert {r.event_type for r in rows} <= {"view", "click", "purchase", "signup", "error"}
    assert all(r.window_end > r.window_start for r in rows)


def test_streaming_session_aggregates(spark):
    s = jobs.events_stream(spark, SF_SMOKE)
    out = jobs.run_to_memory(jobs.session_aggregates(s), "t_sess", mode="complete")
    rows = out.collect()
    assert len(rows) > 0
    assert all(r.n_events >= 1 and r.session_end > r.session_start for r in rows)


def test_streaming_dedup_passthrough(spark):
    s = jobs.events_stream(spark, SF_SMOKE)
    out = jobs.run_to_memory(jobs.dedup_stream(s), "t_dedup", mode="append")
    n_stream = out.count()
    n_batch = spark.read.parquet(f"{SF_SMOKE}/events.parquet").count()
    assert n_stream == n_batch  # no duplicates in the synthetic feed


# --------------------------------------------------------- multimodal


def test_media_schema_and_features(spark):
    media = mm.make_synthetic_media(spark, 30)
    assert media.schema == mm.MEDIA_SCHEMA
    feats = mm.extract_features(media).collect()
    assert len(feats) == 30
    assert all(len(r.feature) == mm.FEATURE_DIM for r in feats)
    assert all(0.0 <= v < 1.0 for r in feats for v in r.feature)
    # deterministic: same payload → same feature
    feats2 = mm.extract_features(media).collect()
    assert {r.item_id: r.feature for r in feats} == {r.item_id: r.feature for r in feats2}


def test_resize_updates_metadata_keeps_schema(spark):
    media = mm.make_synthetic_media(spark, 30)
    out = mm.resize_images(media, 32, 24)
    assert out.schema == mm.MEDIA_SCHEMA
    rows = out.collect()
    assert len(rows) == 10  # every 3rd item is an image
    assert all(r.width == 32 and r.height == 24 for r in rows)
    assert all(len(r.payload) >= 8 for r in rows)


def test_frame_sampling(spark):
    media = mm.make_synthetic_media(spark, 30)
    rows = mm.sample_frames(media, every_n=10).collect()
    assert len(rows) == 10  # every 3rd item is a video
    assert all(r.n_frames == 3 for r in rows)  # 30 frames / 10


def test_real_decode_is_explicitly_stubbed():
    with pytest.raises(NotImplementedError):
        mm.decode_media(b"...", "image")


def test_stateful_user_stats(spark):
    from iceberg_tools_spark.streaming import stateful

    s = jobs.events_stream(spark, SF_SMOKE)
    out = jobs.run_to_memory(stateful.user_stats_stateful(s), "t_state", mode="update")
    rows = out.collect()
    assert len(rows) > 0
    batch = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    import pyspark.sql.functions as F

    exp = {
        r.user_id: (r.n, float(r.v))
        for r in batch.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
        .collect()
    }
    # last snapshot per user must equal the batch totals
    got = {}
    for r in rows:
        got[r.user_id] = (r.n_events, r.sum_value)
    assert set(got) == set(exp)
    for uid, (n, v) in exp.items():
        gn, gv = got[uid]
        assert gn == n, uid
        assert abs(gv - v) < 1e-6, uid


def test_multimodal_features_feed_ann(spark):
    """Integration: extracted media features are a valid embedding
    column — brute-force cosine top-k runs on them end-to-end."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from iceberg_tools_spark.functions.vectors import dot_fast, sum_squares

    media = mm.make_synthetic_media(spark, 40)
    feats = mm.extract_features(media).select(
        F.col("item_id").alias("vec_id"), F.col("feature").alias("embedding")
    )
    base = feats.select("vec_id", "embedding", sum_squares("embedding").alias("ss"))
    q = base.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qemb"), F.col("ss").alias("qss")
    )
    cos = dot_fast("embedding", "qemb") / (F.sqrt(F.col("ss")) * F.sqrt(F.col("qss")))
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vec_id"))
    top = (
        base.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", cos.alias("cos"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .collect()
    )
    assert len(top) == 9  # 3 queries x top-3
    assert all(-1.0001 <= r.cos <= 1.0001 for r in top)
