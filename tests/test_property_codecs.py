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


# ---- Avro container round-trip (r9): the writer/reader pair that
# every manifest in the engine flows through


@settings(max_examples=40, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=-(2**62), max_value=2**62),
            st.one_of(st.none(), st.text(max_size=40)),
            st.one_of(st.none(), st.binary(max_size=32)),
            st.booleans(),
        ),
        max_size=25,
    ),
)
def test_avro_container_roundtrip_property(rows):
    """write_container(reader(write_container(x))) is the identity
    for a schema shaped like a manifest entry (long + nullable
    string + nullable bytes + bool), at any row count including 0."""
    from iceberg_tools_spark.avro.reader import AvroContainerFile
    from iceberg_tools_spark.avro.writer import write_container

    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": ["null", "string"], "default": None},
            {"name": "c", "type": ["null", "bytes"], "default": None},
            {"name": "d", "type": "boolean"},
        ],
    }
    recs = [{"a": a, "b": b, "c": c, "d": d} for a, b, c, d in rows]
    blob = write_container(schema, recs)
    got = list(AvroContainerFile(blob))
    assert got == recs
    # byte-determinism: same records → same container bytes
    assert write_container(schema, recs) == blob


@settings(max_examples=30, deadline=None)
@given(
    vals=st.lists(st.integers(min_value=0, max_value=2**31 - 1),
                  min_size=0, max_size=200),
)
def test_roaring_python_equals_numpy_property(vals):
    """The portable Roaring u64 codec round-trips arbitrary
    position sets (duplicates collapse, order-free)."""
    from iceberg_tools_spark.iceberg.roaring import (
        deserialize_u64,
        serialize_u64,
    )

    positions = sorted(set(vals))
    blob = serialize_u64(positions)
    got, _ = deserialize_u64(blob)
    assert got == positions
