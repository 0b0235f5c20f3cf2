"""Pure-Python FLAC codec: lossless roundtrips through both
subframe families the encoder emits, hand-built LPC and stereo-
decorrelation frames for the paths it doesn't, CRC tamper
detection, multimodal pipeline integration."""

from __future__ import annotations

import numpy as np
import pytest

from iceberg_tools_spark.operators.flac import (
    _BitWriter,
    _crc8,
    _crc16,
    decode_flac,
    encode_flac,
)


def _ref(sig: np.ndarray) -> np.ndarray:
    return sig.astype(np.float64) / 32768.0


def test_roundtrip_smooth_stereo_compresses():
    t = np.arange(10000)
    sig = np.stack(
        [
            (3000 * np.sin(t / 50) + 500 * np.sin(t / 7)).astype(np.int16),
            (2000 * np.cos(t / 30)).astype(np.int16),
        ],
        axis=1,
    )
    enc = encode_flac(sig, 44100)
    dec, sr = decode_flac(enc)
    assert sr == 44100 and dec.shape == sig.shape
    assert np.abs(dec - _ref(sig)).max() == 0.0  # lossless
    assert len(enc) < sig.nbytes / 2  # rice/FIXED actually compress


def test_roundtrip_noise_verbatim():
    rng = np.random.default_rng(3)
    sig = rng.integers(-32768, 32767, size=(3000, 1)).astype(np.int16)
    dec, sr = decode_flac(encode_flac(sig, 16000))
    assert np.abs(dec - _ref(sig)).max() == 0.0


def test_multi_frame_and_short_tail():
    sig = (np.sin(np.arange(9000) / 20) * 8000).astype(np.int16)[:, None]
    enc = encode_flac(sig, 8000, block_size=4096)  # 4096+4096+808
    dec, _ = decode_flac(enc)
    assert dec.shape[0] == 9000
    assert np.abs(dec - _ref(sig)).max() == 0.0


def _hand_frame(streaminfo_payload: bytes, body_writer) -> bytes:
    """Wrap one hand-written frame (header for 2ch 16-bit, block
    from the writer callback) behind the given STREAMINFO bytes."""
    return streaminfo_payload + body_writer


def _header(ch_code: int, bsz: int) -> bytes:
    w = _BitWriter()
    w.write(0x3FFE, 14)
    w.write(0, 2)
    w.write(7, 4)  # 16-bit block size field
    w.write(0, 4)  # rate from STREAMINFO
    w.write(ch_code, 4)
    w.write(4, 3)  # 16 bps
    w.write(0, 1)
    w.write(0, 8)  # frame number 0
    w.write(bsz - 1, 16)
    w.align()
    h = w.bytes()
    return h + bytes([_crc8(h)])


def _streaminfo(n: int, ch: int) -> bytes:
    sig = np.zeros((max(n, 16), ch), dtype=np.int16)
    full = encode_flac(sig, 8000)
    # reuse the encoder's STREAMINFO (4 + 4 + 34 bytes), drop frames
    head = full[: 4 + 4 + 34]
    # patch total_samples (last 36 bits before md5) — simpler: the
    # zeros signal has the right n already
    return head


def _verbatim_sub(vals, bps) -> _BitWriter:
    w = _BitWriter()
    w.write(0, 1)
    w.write(1, 6)
    w.write(0, 1)
    for v in vals:
        w.write(int(v), bps)
    return w


@pytest.mark.parametrize("ch_code", [8, 9, 10])
def test_stereo_decorrelation_hand_frames(ch_code):
    """LEFT/SIDE, SIDE/RIGHT and MID/SIDE frames hand-written as
    VERBATIM subframes (side = 17 bits) must reconstruct L/R."""
    left = np.array([100, -5, 300, 7], dtype=np.int64)
    right = np.array([90, -50, 250, -7], dtype=np.int64)
    side = left - right
    if ch_code == 8:
        subs = [(left, 16), (side, 17)]
    elif ch_code == 9:
        subs = [(side, 17), (right, 16)]
    else:
        mid = (left + right) >> 1
        subs = [(mid, 16), (side, 17)]
    head = _streaminfo(4, 2)
    w = _BitWriter()
    for vals, bps in subs:
        for bit_chunk in [None]:
            sub = _verbatim_sub(vals, bps)
            # splice sub's bits into w
            for byte in sub.buf:
                w.write(byte, 8)
            if sub.nbits:
                w.write(sub.acc, sub.nbits)
    w.align()
    frame = _header(ch_code, 4) + w.bytes()
    payload = head + frame + _crc16(frame).to_bytes(2, "big")
    dec, _ = decode_flac(payload)
    got = (dec * 32768.0).round().astype(np.int64)
    assert got[:, 0].tolist() == left.tolist()
    assert got[:, 1].tolist() == right.tolist()


def test_lpc_subframe_hand_frame():
    """LPC order-1, coeff 1, shift 0 (≡ FIXED-1): hand-written
    frame decodes to the running-sum signal."""
    head = _streaminfo(5, 1)
    w = _BitWriter()
    w.write(0, 1)
    w.write(32, 6)  # LPC order 1 (0b100000 | (order-1))
    w.write(0, 1)
    w.write(10, 16)  # warmup s[0] = 10
    w.write(14, 4)  # precision 15 bits
    w.write(0, 5)  # shift 0
    w.write(1, 15)  # coeff = 1
    w.write(0, 2)  # RICE
    w.write(0, 4)  # one partition
    w.write(0, 4)  # param 0
    for r in (1, 1, 2, -1):  # zigzag: 2,2,4,1
        u = (r << 1) if r >= 0 else ((-r) << 1) - 1
        q = u >> 0
        if q:
            w.write(0, q)
        w.write(1, 1)
    w.align()
    frame = _header(0, 5) + w.bytes()
    payload = head + frame + _crc16(frame).to_bytes(2, "big")
    dec, _ = decode_flac(payload)
    got = (dec[:, 0] * 32768.0).round().astype(int).tolist()
    assert got == [10, 11, 12, 14, 13]


def test_crc_tamper_detected():
    sig = (np.sin(np.arange(2000) / 9) * 5000).astype(np.int16)[:, None]
    enc = bytearray(encode_flac(sig, 8000))
    enc[-10] ^= 0x40  # flip a bit in the last frame body
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(enc))


def test_multimodal_feature_is_real_for_flac(spark):
    from iceberg_tools_spark.operators.multimodal import (
        fake_feature,
        real_or_fake_feature,
    )

    sig = (np.sin(np.arange(4000) / 15) * 9000).astype(np.int16)[:, None]
    enc = encode_flac(sig, 16000)
    feat = real_or_fake_feature(enc, "audio")
    assert feat != fake_feature(enc)
    # same PCM through WAV must give the same statistical feature
    # (encode_wav takes float in [-1, 1])
    from iceberg_tools_spark.operators.multimodal import encode_wav

    wav = encode_wav(sig.astype(np.float64) / 32767.0, 16000)
    assert np.allclose(feat, real_or_fake_feature(wav, "audio"), atol=1e-4)
