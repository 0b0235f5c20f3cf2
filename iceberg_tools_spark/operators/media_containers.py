"""Container-level parsing for MP4 (ISO BMFF, ISO/IEC 14496-12) and
MP3 (MPEG-1/2 audio framing) — pure stdlib/numpy.

The sandbox has no codec libraries, so SAMPLE PAYLOAD DECODE stays
behind the multimodal pipeline's clearly-marked deterministic fake.
What IS real here — and what a 100 TB media-curation pipeline needs
long before it needs pixels — is the container plumbing:

* MP4: box walk (``ftyp``/``moov``/``mvhd``/``trak``/``tkhd``/
  ``mdia``/``mdhd``/``hdlr``/``stbl``), per-track codec fourcc,
  duration/timescale, width/height, and the full sample table
  (``stts`` × ``stsc`` × ``stsz`` × ``stco``/``co64`` → per-sample
  ``(offset, size, dts)``) so frame sampling can slice REAL sample
  byte ranges out of ``mdat`` without decoding them.
* MP3: ID3v2 skip + frame-header walk (sync, version/layer bitrate
  and sample-rate tables from the public spec), frame count, CBR/VBR
  detection, duration estimate.

Both parsers are driven per-payload inside Arrow-batched
``mapInPandas`` kernels (see ``multimodal.probe_media``), the same
executor-parallel shape as the image/audio feature kernels.

Fixture builders (``build_mp4``/``build_mp3``) emit minimal VALID
streams with deterministic fake sample payloads, so tests pin the
parser against containers this module did not itself mis-write
(byte layout asserted structurally in tests).
"""

from __future__ import annotations

import struct
from typing import Any

# ------------------------------------------------------------- MP4

_CONTAINER_BOXES = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _walk_boxes(data: bytes, start: int, end: int, depth: int = 0):
    """Yield ``(fourcc, body_start, body_end)`` for each box in
    [start, end); recurses into known container boxes with a
    path-prefixed fourcc like ``b"moov.trak.tkhd"``."""
    if depth > 8:
        raise ValueError("MP4 box nesting too deep")
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        fourcc = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise ValueError("truncated 64-bit box header")
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            body = pos + 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError(f"invalid box size {size} for {fourcc!r}")
        yield fourcc, body, pos + size
        if fourcc in _CONTAINER_BOXES:
            yield from _walk_boxes(data, body, pos + size, depth + 1)
        pos += size


def _parse_stts(body: bytes) -> list[tuple[int, int]]:
    (n,) = struct.unpack_from(">I", body, 4)
    return [struct.unpack_from(">II", body, 8 + 8 * i) for i in range(n)]


def _parse_stsc(body: bytes) -> list[tuple[int, int, int]]:
    (n,) = struct.unpack_from(">I", body, 4)
    return [struct.unpack_from(">III", body, 8 + 12 * i) for i in range(n)]


def _parse_stsz(body: bytes) -> tuple[int, list[int]]:
    uniform, count = struct.unpack_from(">II", body, 4)
    if uniform:
        return count, [uniform] * count
    return count, [
        struct.unpack_from(">I", body, 12 + 4 * i)[0] for i in range(count)
    ]


def _parse_stco(body: bytes, wide: bool) -> list[int]:
    (n,) = struct.unpack_from(">I", body, 4)
    fmt, step = (">Q", 8) if wide else (">I", 4)
    return [struct.unpack_from(fmt, body, 8 + step * i)[0] for i in range(n)]


def parse_mp4(payload: bytes) -> dict[str, Any]:
    """Parse an ISO BMFF container into
    ``{brand, timescale, duration_s, tracks: [...]}`` where each
    track carries ``{track_id, handler, codec, width, height,
    timescale, duration_s, n_samples, samples}`` and ``samples`` is
    the reconstructed per-sample ``(offset, size, dts)`` list."""
    if len(payload) < 8 or payload[4:8] not in (b"ftyp", b"moov", b"mdat"):
        raise ValueError("not an ISO BMFF stream (no leading ftyp/moov)")
    out: dict[str, Any] = {"brand": None, "timescale": None, "duration_s": None,
                           "tracks": []}
    track: dict[str, Any] | None = None
    tables: dict[str, Any] = {}

    def close_track() -> None:
        nonlocal track, tables
        if track is None:
            return
        # stitch the sample table: chunk runs (stsc) × chunk offsets
        # (stco) × sizes (stsz) × time deltas (stts)
        sizes = tables.get("sizes", [])
        offsets = tables.get("chunk_offsets", [])
        stsc = tables.get("stsc", [])
        samples: list[tuple[int, int, int]] = []
        if sizes and offsets and stsc:
            # expand stsc runs: entry (first_chunk, per_chunk, _) holds
            # until the next entry's first_chunk
            per_chunk: list[int] = []
            for i, (first, n_per, _desc) in enumerate(stsc):
                last = stsc[i + 1][0] - 1 if i + 1 < len(stsc) else len(offsets)
                per_chunk.extend([n_per] * (last - first + 1))
            dts = 0
            deltas_iter = iter(
                d for cnt, d in tables.get("stts", []) for _ in range(cnt)
            )
            si = 0
            for ci, chunk_off in enumerate(offsets):
                off = chunk_off
                for _ in range(per_chunk[ci] if ci < len(per_chunk) else 0):
                    if si >= len(sizes):
                        break
                    samples.append((off, sizes[si], dts))
                    off += sizes[si]
                    si += 1
                    dts += next(deltas_iter, 0)
        track["n_samples"] = len(sizes)
        track["samples"] = samples
        out["tracks"].append(track)
        track, tables = None, {}

    for fourcc, body, box_end in _walk_boxes(payload, 0, len(payload)):
        seg = payload[body:box_end]
        if fourcc == b"ftyp":
            out["brand"] = seg[:4].decode("ascii", "replace")
        elif fourcc == b"mvhd":
            ver = seg[0]
            if ver == 1:
                ts, dur = struct.unpack_from(">IQ", seg, 20)
            else:
                ts, dur = struct.unpack_from(">II", seg, 12)
            out["timescale"] = ts
            out["duration_s"] = dur / ts if ts else None
        elif fourcc == b"trak":
            close_track()
            track = {"track_id": None, "handler": None, "codec": None,
                     "width": None, "height": None, "timescale": None,
                     "duration_s": None}
        elif fourcc == b"tkhd" and track is not None:
            ver = seg[0]
            track["track_id"] = struct.unpack_from(
                ">I", seg, 20 if ver == 1 else 12
            )[0]
            # width/height: 16.16 fixed point at the box tail
            w16, h16 = struct.unpack_from(">II", seg, len(seg) - 8)
            track["width"], track["height"] = w16 >> 16, h16 >> 16
        elif fourcc == b"mdhd" and track is not None:
            ver = seg[0]
            if ver == 1:
                ts, dur = struct.unpack_from(">IQ", seg, 20)
            else:
                ts, dur = struct.unpack_from(">II", seg, 12)
            track["timescale"] = ts
            track["duration_s"] = dur / ts if ts else None
        elif fourcc == b"hdlr" and track is not None:
            track["handler"] = seg[8:12].decode("ascii", "replace")
        elif fourcc == b"stsd" and track is not None:
            (n,) = struct.unpack_from(">I", seg, 4)
            if n:
                track["codec"] = seg[12:16].decode("ascii", "replace")
        elif fourcc == b"stts" and track is not None:
            tables["stts"] = _parse_stts(seg)
        elif fourcc == b"stsc" and track is not None:
            tables["stsc"] = _parse_stsc(seg)
        elif fourcc == b"stsz" and track is not None:
            _, tables["sizes"] = _parse_stsz(seg)
        elif fourcc == b"stco" and track is not None:
            tables["chunk_offsets"] = _parse_stco(seg, wide=False)
        elif fourcc == b"co64" and track is not None:
            tables["chunk_offsets"] = _parse_stco(seg, wide=True)
    close_track()
    return out


def mp4_sample_bytes(
    payload: bytes, track: dict[str, Any], every_n: int = 1
) -> list[tuple[int, bytes]]:
    """Slice every Nth sample's REAL byte range out of the stream
    using the parsed sample table — the container half of frame
    sampling (decoding those bytes is the codec half, which stays
    stubbed in-sandbox). Returns ``[(dts, bytes), ...]``."""
    out = []
    for i, (off, size, dts) in enumerate(track["samples"]):
        if i % every_n:
            continue
        if off + size > len(payload):
            raise ValueError("sample range outside stream")
        out.append((dts, payload[off : off + size]))
    return out


def build_mp4(
    *,
    n_samples: int = 12,
    width: int = 64,
    height: int = 48,
    fps: int = 6,
    codec: str = "avc1",
    seed: int = 0,
    samples: list[bytes] | None = None,
) -> bytes:
    """Minimal VALID single-video-track MP4 fixture: real box
    structure + sample tables over an ``mdat``. Sample payloads are
    deterministic LCG fakes by default; pass ``samples`` to carry
    REAL frame payloads instead (e.g. JPEG frames → an MJPEG-style
    track whose samples decode for real — `video_dedup` uses this).
    Two chunks with different samples-per-chunk exercise the stsc
    run expansion."""

    def box(fourcc: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + fourcc + body

    if samples is not None:
        n_samples = len(samples)
        blobs = [bytes(s) for s in samples]
        sizes = [len(b) for b in blobs]
    else:
        # deterministic fake sample payloads of varying size
        state = seed * 2654435761 % (1 << 32) or 1
        sizes = []
        blobs = []
        for i in range(n_samples):
            state = (1103515245 * state + 12345) % (1 << 31)
            size = 20 + state % 60
            sizes.append(size)
            blobs.append(bytes((state >> (j % 13)) & 0xFF for j in range(size)))
    # chunk 1: 2 samples per chunk for the first 2 chunks; rest 3/chunk
    chunking = []
    i = 0
    while i < n_samples:
        n = 2 if len(chunking) < 2 else 3
        chunking.append(min(n, n_samples - i))
        i += n
    ftyp = box(b"ftyp", b"isom\x00\x00\x02\x00isomavc1")
    timescale = fps * 1000
    delta = 1000  # per-sample dts delta
    duration = n_samples * delta

    mvhd = box(
        b"mvhd",
        b"\x00" + b"\x00" * 3 + struct.pack(">II", 0, 0)
        + struct.pack(">II", timescale, duration)
        + struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
        + b"\x00" * 10 + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24 + struct.pack(">I", 2),
    )
    tkhd = box(
        b"tkhd",
        b"\x00\x00\x00\x07" + struct.pack(">II", 0, 0)
        + struct.pack(">I", 1) + b"\x00" * 4 + struct.pack(">I", duration)
        + b"\x00" * 8 + struct.pack(">hhhh", 0, 0, 0, 0)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = box(
        b"mdhd",
        b"\x00" + b"\x00" * 3 + struct.pack(">II", 0, 0)
        + struct.pack(">II", timescale, duration)
        + struct.pack(">HH", 0x55C4, 0),  # language 'und'
    )
    hdlr = box(
        b"hdlr",
        b"\x00" * 8 + b"vide" + b"\x00" * 12 + b"graft\x00",
    )
    stsd = box(
        b"stsd",
        b"\x00" * 4 + struct.pack(">I", 1)
        + box(
            codec.encode("ascii"),
            b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 16
            + struct.pack(">HH", width, height) + b"\x00" * 50,
        ),
    )
    stts = box(b"stts", b"\x00" * 4 + struct.pack(">I", 1)
               + struct.pack(">II", n_samples, delta))
    stsc_entries = []
    chunk_no = 1
    prev = None
    for n in chunking:
        if n != prev:
            stsc_entries.append((chunk_no, n, 1))
            prev = n
        chunk_no += 1
    stsc = box(
        b"stsc",
        b"\x00" * 4 + struct.pack(">I", len(stsc_entries))
        + b"".join(struct.pack(">III", *e) for e in stsc_entries),
    )
    stsz = box(
        b"stsz",
        b"\x00" * 4 + struct.pack(">II", 0, n_samples)
        + b"".join(struct.pack(">I", s) for s in sizes),
    )
    # chunk offsets depend on the final layout: moov before mdat;
    # compute moov size with a placeholder stco first
    stco_placeholder = box(
        b"stco",
        b"\x00" * 4 + struct.pack(">I", len(chunking))
        + b"\x00" * (4 * len(chunking)),
    )

    def assemble(stco: bytes) -> tuple[bytes, int]:
        stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
        minf = box(b"minf", stbl)
        mdia = box(b"mdia", mdhd + hdlr + minf)
        trak = box(b"trak", tkhd + mdia)
        moov = box(b"moov", mvhd + trak)
        head = ftyp + moov
        return head, len(head) + 8  # mdat body starts after its header

    _, mdat_body = assemble(stco_placeholder)
    offsets = []
    off = mdat_body
    i = 0
    for n in chunking:
        offsets.append(off)
        off += sum(sizes[i : i + n])
        i += n
    stco = box(
        b"stco",
        b"\x00" * 4 + struct.pack(">I", len(offsets))
        + b"".join(struct.pack(">I", o) for o in offsets),
    )
    head, _ = assemble(stco)
    mdat = box(b"mdat", b"".join(blobs))
    return head + mdat


# ------------------------------------------------------------- MP3

# public MPEG audio tables (kbps; index 0 and 15 invalid)
_BITRATES_V1_L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0]
_BITRATES_V2_L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, 0]
_SAMPLE_RATES = {3: [44100, 48000, 32000], 2: [22050, 24000, 16000], 0: [11025, 12000, 8000]}


def parse_mp3(payload: bytes) -> dict[str, Any]:
    """Walk MPEG audio (layer III) frame headers: skip a leading
    ID3v2 tag, then parse each 4-byte header from the public bit
    layout — version, bitrate, sample rate, padding — and hop
    frame-length bytes to the next sync. Returns ``{n_frames,
    duration_s, sample_rate, bitrate_kbps_mean, is_vbr,
    has_id3v2}``; raises if no valid frame is found."""
    pos = 0
    has_id3 = payload[:3] == b"ID3"
    if has_id3:
        if len(payload) < 10:
            raise ValueError("truncated ID3v2 header")
        # syncsafe 28-bit size
        sz = 0
        for b in payload[6:10]:
            sz = (sz << 7) | (b & 0x7F)
        pos = 10 + sz
    frames = 0
    bitrates: list[int] = []
    sample_rate = None
    duration = 0.0
    while pos + 4 <= len(payload):
        h = struct.unpack_from(">I", payload, pos)[0]
        if (h >> 21) & 0x7FF != 0x7FF:
            raise ValueError(f"lost sync at byte {pos}")
        version = (h >> 19) & 3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
        layer = (h >> 17) & 3  # 1 = layer III
        if version == 1 or layer != 1:
            raise ValueError("only MPEG-1/2/2.5 layer III supported")
        br_idx = (h >> 12) & 0xF
        sr_idx = (h >> 10) & 3
        padding = (h >> 9) & 1
        if br_idx in (0, 15) or sr_idx == 3:
            raise ValueError("free-format/invalid bitrate or sample rate")
        kbps = (_BITRATES_V1_L3 if version == 3 else _BITRATES_V2_L3)[br_idx]
        sr = _SAMPLE_RATES[version][sr_idx]
        sample_rate = sample_rate or sr
        spf = 1152 if version == 3 else 576  # samples per frame, layer III
        flen = spf // 8 * kbps * 1000 // sr + padding
        frames += 1
        bitrates.append(kbps)
        duration += spf / sr
        pos += flen
    if frames == 0:
        raise ValueError("no MPEG audio frames")
    return {
        "n_frames": frames,
        "duration_s": duration,
        "sample_rate": sample_rate,
        "bitrate_kbps_mean": sum(bitrates) / frames,
        "is_vbr": len(set(bitrates)) > 1,
        "has_id3v2": has_id3,
    }


def build_mp3(
    *, n_frames: int = 20, bitrate_pattern: tuple[int, ...] = (9,),
    sample_rate_idx: int = 0, with_id3: bool = False, seed: int = 1
) -> bytes:
    """MP3 framing fixture: valid MPEG-1 layer III headers over
    deterministic junk payloads (silent garbage to a real decoder,
    perfectly parseable framing). ``bitrate_pattern`` cycles per
    frame — more than one index makes it VBR."""
    out = bytearray()
    if with_id3:
        body = b"TAGDATA" * 3
        sz = len(body)
        sync = bytes((sz >> 21 & 0x7F, sz >> 14 & 0x7F, sz >> 7 & 0x7F, sz & 0x7F))
        out += b"ID3\x04\x00\x00" + sync + body
    state = seed or 1
    sr = _SAMPLE_RATES[3][sample_rate_idx]
    for i in range(n_frames):
        br_idx = bitrate_pattern[i % len(bitrate_pattern)]
        kbps = _BITRATES_V1_L3[br_idx]
        padding = i % 2
        h = (
            (0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16)  # MPEG1 L3, no CRC
            | (br_idx << 12) | (sample_rate_idx << 10) | (padding << 9)
        )
        flen = 1152 // 8 * kbps * 1000 // sr + padding
        out += struct.pack(">I", h)
        for _ in range(flen - 4):
            state = (1103515245 * state + 12345) % (1 << 31)
            out.append((state >> 7) & 0xFF)
    return bytes(out)


# ------------------------------------------------------------ FLAC

def parse_flac(payload: bytes) -> dict[str, Any]:
    """FLAC container: ``fLaC`` magic, then metadata blocks
    (1-byte last-flag<<7|type + 24-bit big-endian length). The
    mandatory STREAMINFO block (type 0, 34 bytes) carries sample
    rate (20 bits), channels-1 (3), bits-per-sample-1 (5) and the
    36-bit total-samples count the duration derives from. Returns
    ``{sample_rate, channels, bits_per_sample, total_samples,
    duration_s, n_metadata_blocks}``; raises on malformed input."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos, n_blocks, info = 4, 0, None
    while pos + 4 <= len(payload):
        hdr = payload[pos]
        btype, last = hdr & 0x7F, bool(hdr & 0x80)
        blen = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + blen]
        if len(body) < blen:
            raise ValueError("truncated FLAC metadata block")
        n_blocks += 1
        if btype == 0:
            if blen != 34:
                raise ValueError(f"STREAMINFO must be 34 bytes, got {blen}")
            bits = int.from_bytes(body, "big")
            # layout after min/max blocksize (32) + min/max framesize (48)
            sr = (bits >> (34 * 8 - 80 - 20)) & 0xFFFFF
            ch = ((bits >> (34 * 8 - 100 - 3)) & 0x7) + 1
            bps = ((bits >> (34 * 8 - 103 - 5)) & 0x1F) + 1
            total = (bits >> (34 * 8 - 108 - 36)) & ((1 << 36) - 1)
            if sr == 0:
                raise ValueError("STREAMINFO sample rate 0")
            info = {
                "sample_rate": sr,
                "channels": ch,
                "bits_per_sample": bps,
                "total_samples": total,
                "duration_s": total / sr,
            }
        pos += 4 + blen
        if last:
            break
    if info is None:
        raise ValueError("no STREAMINFO block")
    info["n_metadata_blocks"] = n_blocks
    return info


def build_flac(
    *, sample_rate: int = 44100, channels: int = 2,
    bits_per_sample: int = 16, total_samples: int = 88200, seed: int = 5
) -> bytes:
    """FLAC fixture: a valid fLaC + STREAMINFO (+ PADDING) header
    over deterministic junk 'frame' bytes (unparsed by
    :func:`parse_flac`, which stops at the last metadata block)."""
    bits = 0
    bits = (bits << 16) | 4096          # min blocksize
    bits = (bits << 16) | 4096          # max blocksize
    bits = (bits << 24) | 0             # min framesize (unknown)
    bits = (bits << 24) | 0             # max framesize
    bits = (bits << 20) | sample_rate
    bits = (bits << 3) | (channels - 1)
    bits = (bits << 5) | (bits_per_sample - 1)
    bits = (bits << 36) | total_samples
    bits = bits << 128                  # md5 of raw audio: zeros
    body = bits.to_bytes(34, "big")
    out = b"fLaC" + bytes([0x00]) + len(body).to_bytes(3, "big") + body
    pad = b"\x00" * 16
    out += bytes([0x80 | 0x01]) + len(pad).to_bytes(3, "big") + pad  # last: PADDING
    state = seed or 1
    junk = bytearray()
    for _ in range(200):
        state = (1103515245 * state + 12345) % (1 << 31)
        junk.append((state >> 11) & 0xFF)
    return out + bytes(junk)


# ------------------------------------------------------------- Ogg

def _ogg_crc(data: bytes) -> int:
    """Ogg page CRC32: poly 0x04c11db7, non-reflected, init/xorout
    0 (NOT the zlib variant)."""
    crc = 0
    for b in data:
        crc ^= b << 24
        for _ in range(8):
            crc = ((crc << 1) ^ 0x04C11DB7) if crc & 0x80000000 else (crc << 1)
            crc &= 0xFFFFFFFF
    return crc


def parse_ogg(payload: bytes, *, check_crc: bool = True) -> dict[str, Any]:
    """Ogg container: walk ``OggS`` pages (version 0), validating
    each page's CRC, tracking packet boundaries from the segment
    lacing table and the final granule position. Codec identified
    from the first packet's magic: ``OpusHead`` (granule at 48 kHz
    minus pre-skip) or ``\\x01vorbis`` (granule in sample-rate
    units, rate at id-header offset 12). Returns ``{codec,
    sample_rate, duration_s, n_pages, n_packets}``."""
    pos, n_pages, n_packets = 0, 0, 0
    first_packet = b""
    last_granule = 0
    while pos + 27 <= len(payload):
        if payload[pos : pos + 4] != b"OggS":
            raise ValueError(f"lost page sync at byte {pos}")
        if payload[pos + 4] != 0:
            raise ValueError("unsupported Ogg version")
        granule = int.from_bytes(payload[pos + 6 : pos + 14], "little", signed=True)
        crc_stored = int.from_bytes(payload[pos + 22 : pos + 26], "little")
        nseg = payload[pos + 26]
        lacing = payload[pos + 27 : pos + 27 + nseg]
        if len(lacing) < nseg:
            raise ValueError("truncated lacing table")
        body_len = sum(lacing)
        page_end = pos + 27 + nseg + body_len
        if page_end > len(payload):
            raise ValueError("truncated page body")
        if check_crc:
            page = bytearray(payload[pos:page_end])
            page[22:26] = b"\x00\x00\x00\x00"
            if _ogg_crc(bytes(page)) != crc_stored:
                raise ValueError(f"page CRC mismatch at byte {pos}")
        # packets end on lacing values < 255
        n_packets += sum(1 for v in lacing if v < 255)
        if n_pages == 0:
            first_packet = payload[pos + 27 + nseg : pos + 27 + nseg + min(body_len, 64)]
        if granule >= 0:
            last_granule = granule
        n_pages += 1
        pos = page_end
    if n_pages == 0:
        raise ValueError("no Ogg pages")
    codec, sr, dur = "unknown", None, None
    if first_packet.startswith(b"OpusHead"):
        codec = "opus"
        pre_skip = int.from_bytes(first_packet[10:12], "little")
        sr = int.from_bytes(first_packet[12:16], "little") or 48000
        dur = max(0, last_granule - pre_skip) / 48000.0
    elif first_packet.startswith(b"\x01vorbis"):
        codec = "vorbis"
        sr = int.from_bytes(first_packet[12:16], "little")
        dur = last_granule / sr if sr else None
    return {
        "codec": codec,
        "sample_rate": sr,
        "duration_s": dur,
        "n_pages": n_pages,
        "n_packets": n_packets,
    }


def _ogg_page(
    serial: int, seq: int, granule: int, packets: list[bytes], *,
    header_type: int = 0
) -> bytes:
    lacing = bytearray()
    body = bytearray()
    for pkt in packets:
        q, r = divmod(len(pkt), 255)
        lacing += bytes([255] * q + [r])
        body += pkt
    page = bytearray(b"OggS")
    page += bytes([0, header_type])
    page += granule.to_bytes(8, "little", signed=True)
    page += serial.to_bytes(4, "little")
    page += seq.to_bytes(4, "little")
    page += b"\x00\x00\x00\x00"  # CRC placeholder
    page += bytes([len(lacing)]) + lacing + body
    crc = _ogg_crc(bytes(page))
    page[22:26] = crc.to_bytes(4, "little")
    return bytes(page)


def build_ogg_opus(
    *, n_audio_packets: int = 10, samples_per_packet: int = 960,
    pre_skip: int = 312, seed: int = 6
) -> bytes:
    """Ogg-Opus fixture: real page structure + CRCs + OpusHead/
    OpusTags headers over deterministic junk audio packets. Granule
    positions advance 48 kHz samples per spec, so the parsed
    duration is exact."""
    head = (
        b"OpusHead" + bytes([1, 2])  # version 1, 2 channels
        + pre_skip.to_bytes(2, "little")
        + (48000).to_bytes(4, "little")
        + (0).to_bytes(2, "little") + bytes([0])  # gain, mapping family
    )
    tags = b"OpusTags" + (4).to_bytes(4, "little") + b"test" + (0).to_bytes(4, "little")
    out = _ogg_page(0x1234, 0, 0, [head], header_type=2)  # BOS
    out += _ogg_page(0x1234, 1, 0, [tags])
    state = seed or 1
    granule = pre_skip
    for i in range(n_audio_packets):
        pkt = bytearray()
        state = (1103515245 * state + 12345) % (1 << 31)
        for j in range(40 + state % 40):
            state = (1103515245 * state + 12345) % (1 << 31)
            pkt.append((state >> 9) & 0xFF)
        granule += samples_per_packet
        flag = 4 if i == n_audio_packets - 1 else 0  # EOS on the last
        out += _ogg_page(0x1234, 2 + i, granule, [bytes(pkt)], header_type=flag)
    return out
