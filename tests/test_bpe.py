"""Byte-level BPE: deterministic training, lossless roundtrip
(including multi-byte unicode), real compression, distributed ==
local-reference encoding."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from iceberg_tools_spark.operators.bpe import (
    _make_encoder,
    bpe_roundtrip_check,
    decode_tokens,
    encode_stats,
    train_bpe,
    word_histogram,
)
from iceberg_tools_spark.sources.readers import load_table

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def trained(spark):
    docs = load_table(spark, SF_SMOKE, "documents",
                      ["doc_id", "text", "source", "n_chars"])
    return docs, train_bpe(word_histogram(docs))


def test_training_deterministic(spark, trained):
    docs, merges = trained
    again = train_bpe(word_histogram(docs))
    assert merges == again and len(merges) > 0


def test_hand_example():
    """aaab corpus: first merge must be (a,a) → 256, second merges
    the dominant remaining pair."""
    merges = train_bpe([("aaaa", 10), ("aaab", 5)], n_merges=2)
    a = ord("a")
    assert merges[0] == (a, a)
    enc = _make_encoder(merges)
    toks = enc("aaaa")
    assert decode_tokens(toks, merges) == "aaaa"
    assert len(toks) < 4  # compression happened


def test_roundtrip_tricky_unicode(trained):
    _, merges = trained
    enc = _make_encoder(merges)
    for s in (
        "hello world",
        "naïve café — ünïcødé ✓ 日本語 🙂",
        "tabs\tand\nnewlines  and   runs",
        "",
        "ø" * 100,
    ):
        assert decode_tokens(enc(s), merges) == s


def test_corpus_compression_and_roundtrip(spark, trained):
    docs, merges = trained
    stats = encode_stats(docs, merges)
    agg = stats.agg(
        F.sum("n_tokens").alias("toks"),
        F.sum("n_chars").alias("chars"),
        F.min(F.col("roundtrip_ok").cast("int")).alias("all_ok"),
    ).collect()[0]
    assert agg.all_ok == 1
    assert agg.toks < agg.chars / 1.5  # ≥1.5 chars/token on this corpus


def test_distributed_matches_local_reference(spark, trained):
    """The mapInPandas token counts must equal a straight driver-side
    encode of the same docs with the same merge table."""
    docs, merges = trained
    sample = docs.orderBy("doc_id").limit(20).collect()
    enc = _make_encoder(merges)
    expected = {r.doc_id: len(enc(r.text)) for r in sample}
    got = {
        r.doc_id: r.n_tokens
        for r in encode_stats(docs, merges)
        .filter(F.col("doc_id").isin(list(expected)))
        .collect()
    }
    assert got == expected


def test_driver_gate_all_green(spark):
    row = bpe_roundtrip_check(spark, SF_SMOKE).collect()[0]
    assert row.n_docs == row.n_roundtrip_ok == row.n_tokenized > 0


def test_vocab_save_load_roundtrip(trained, tmp_path):
    import pytest

    from iceberg_tools_spark.operators.bpe import load_vocab, save_vocab

    _, merges = trained
    p = str(tmp_path / "vocab.json")
    save_vocab(merges, p)
    loaded = load_vocab(p)
    assert loaded == merges
    enc_a, enc_b = _make_encoder(merges), _make_encoder(loaded)
    assert enc_a("the quick brown fox") == enc_b("the quick brown fox")
    (tmp_path / "bad.json").write_text('{"format": "other"}')
    with pytest.raises(ValueError, match="bpe-merges-v1"):
        load_vocab(str(tmp_path / "bad.json"))
