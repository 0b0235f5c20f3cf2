"""Round 8: REAL container-level parsing for MP4 (ISO BMFF box walk
+ sample tables) and MP3 (frame-header walk) — the metadata a media
curation pipeline filters on before any codec runs. Codec payload
decode stays behind the documented fake; the CONTAINER layer is real
and pinned here."""

import struct

import numpy as np
import pytest

import iceberg_tools_spark.operators.multimodal as mm
from iceberg_tools_spark.operators.media_containers import (
    build_mp3,
    build_mp4,
    mp4_sample_bytes,
    parse_mp3,
    parse_mp4,
)


def test_mp4_parse_tracks_and_sample_table():
    b = build_mp4(n_samples=12, width=64, height=48, fps=6, seed=3)
    m = parse_mp4(b)
    assert m["brand"] == "isom"
    assert m["duration_s"] == pytest.approx(2.0)
    (t,) = m["tracks"]
    assert (t["track_id"], t["handler"], t["codec"]) == (1, "vide", "avc1")
    assert (t["width"], t["height"]) == (64, 48)
    assert t["n_samples"] == 12 and len(t["samples"]) == 12
    # the sample table covers the mdat body exactly, in order
    mdat_body = b.find(b"mdat") + 4
    offs = [o for o, _, _ in t["samples"]]
    sizes = [s for _, s, _ in t["samples"]]
    assert offs[0] == mdat_body
    assert offs == sorted(offs)
    assert sum(sizes) == len(b) - mdat_body
    # dts advances by the stts delta
    assert [d for _, _, d in t["samples"]] == [i * 1000 for i in range(12)]
    # chunk layout is non-trivial (2,2,3,... per chunk) — the stsc
    # run expansion is what stitched contiguous offsets per chunk
    assert offs[1] == offs[0] + sizes[0]


def test_mp4_sample_bytes_slices_real_ranges():
    b = build_mp4(n_samples=10, seed=7)
    (t,) = parse_mp4(b)["tracks"]
    kept = mp4_sample_bytes(b, t, every_n=4)
    assert [d for d, _ in kept] == [0, 4000, 8000]
    for i, (_, blob) in enumerate(kept):
        off, size, _ = t["samples"][4 * i]
        assert blob == b[off : off + size]


def test_mp4_malformed_raises():
    with pytest.raises(ValueError):
        parse_mp4(b"\x00" * 32)
    good = build_mp4(n_samples=4)
    # corrupt a box size field → invalid box size, not garbage output
    bad = bytearray(good)
    moov = good.find(b"moov")
    struct.pack_into(">I", bad, moov - 4, 2)  # size < 8
    with pytest.raises(ValueError):
        parse_mp4(bytes(bad))


def test_mp3_frame_walk_cbr_vbr_id3():
    cbr = parse_mp3(build_mp3(n_frames=20, bitrate_pattern=(9,)))
    assert cbr["n_frames"] == 20 and not cbr["is_vbr"]
    assert cbr["sample_rate"] == 44100
    assert cbr["bitrate_kbps_mean"] == pytest.approx(128.0)
    # 20 frames * 1152 samples @ 44100 Hz
    assert cbr["duration_s"] == pytest.approx(20 * 1152 / 44100)
    vbr = parse_mp3(build_mp3(n_frames=9, bitrate_pattern=(5, 9, 12)))
    assert vbr["is_vbr"] and vbr["n_frames"] == 9
    tagged = parse_mp3(build_mp3(n_frames=5, with_id3=True))
    assert tagged["has_id3v2"] and tagged["n_frames"] == 5
    with pytest.raises(ValueError):
        parse_mp3(b"\x12\x34" * 16)  # no sync


def test_probe_media_kernel(spark):
    """The Arrow-batched probe surfaces real container metadata per
    payload — including MP4 codec/dimensions/sample count and MP3
    framing — and degrades to container='unknown' on junk."""
    from iceberg_tools_spark.operators.jpeg import encode_jpeg_progressive

    rows = [
        (0, "video", bytearray(build_mp4(n_samples=12, seed=3)), None, None, None, 12),
        (1, "audio", bytearray(build_mp3(n_frames=20)), None, None, None, None),
        (
            2, "image",
            bytearray(encode_jpeg_progressive(np.full((16, 24, 3), 100, np.uint8))),
            24, 16, None, None,
        ),
        (3, "video", bytearray(b"\x00" * 64), None, None, None, 10),
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    got = {r.item_id: r for r in mm.probe_media(df).collect()}
    assert (got[0].container, got[0].codec, got[0].width, got[0].n_units) == (
        "mp4", "avc1", 64, 12,
    )
    assert (got[1].container, got[1].n_units, got[1].is_vbr) == ("mp3", 20, False)
    assert (got[2].container, got[2].width, got[2].height) == ("jpeg", 24, 16)
    assert got[3].container == "unknown" and got[3].codec is None


def test_sample_frames_mp4_uses_real_sample_table(spark):
    b = build_mp4(n_samples=12, seed=5)
    (t,) = parse_mp4(b)["tracks"]
    expected = b"".join(x for _, x in mp4_sample_bytes(b, t, every_n=3))
    rows = [
        (0, "video", bytearray(b), None, None, None, 12),
        (1, "video", bytearray(b"\x01" * 40), None, None, None, 10),
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    got = {r.item_id: r for r in mm.sample_frames_mp4(df, every_n=3).collect()}
    assert bytes(got[0].payload) == expected and got[0].n_frames == 4
    # non-BMFF video falls back to the proportional heuristic
    assert got[1].n_frames == 3


def test_flac_streaminfo_round_trip():
    from iceberg_tools_spark.operators.media_containers import build_flac, parse_flac

    m = parse_flac(build_flac(sample_rate=22050, channels=1,
                              bits_per_sample=24, total_samples=44100, seed=9))
    assert m["sample_rate"] == 22050
    assert m["channels"] == 1
    assert m["bits_per_sample"] == 24
    assert m["total_samples"] == 44100
    assert m["duration_s"] == 2.0
    assert m["n_metadata_blocks"] == 2


def test_flac_malformed_raises():
    import pytest

    from iceberg_tools_spark.operators.media_containers import build_flac, parse_flac

    with pytest.raises(ValueError):
        parse_flac(b"fLaX" + b"\x00" * 40)
    good = build_flac()
    with pytest.raises(ValueError):  # truncated STREAMINFO body
        parse_flac(good[:20])


def test_ogg_opus_round_trip_and_crc():
    import pytest

    from iceberg_tools_spark.operators.media_containers import build_ogg_opus, parse_ogg

    raw = build_ogg_opus(n_audio_packets=10, samples_per_packet=960, pre_skip=312)
    m = parse_ogg(raw)
    assert m["codec"] == "opus"
    assert m["sample_rate"] == 48000
    assert abs(m["duration_s"] - 0.2) < 1e-9  # 10*960/48000, pre-skip removed
    assert m["n_pages"] == 12 and m["n_packets"] == 12
    # one flipped body byte must trip the page CRC
    bad = bytearray(raw)
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        parse_ogg(bytes(bad))
    # ...and CRC checking can be bypassed explicitly
    assert parse_ogg(bytes(bad), check_crc=False)["n_pages"] == 12


def test_ogg_vorbis_identification():
    from iceberg_tools_spark.operators.media_containers import _ogg_page, parse_ogg

    ident = (b"\x01vorbis" + bytes(4) + b"\x02"
             + (44100).to_bytes(4, "little") + bytes(12) + b"\x01")
    raw = _ogg_page(7, 0, 0, [ident], header_type=2)
    raw += _ogg_page(7, 1, 88200, [b"\x00" * 20], header_type=4)
    m = parse_ogg(raw)
    assert m["codec"] == "vorbis"
    assert m["sample_rate"] == 44100
    assert m["duration_s"] == 2.0
