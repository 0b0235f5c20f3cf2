"""Pure-Python FLAC audio codec (decode + fixture encoder) — no
third-party libs, derived from the public FLAC format spec
(xiph.org/flac/format). Retires the ``fake_feature`` fallback for
the dominant lossless audio format: `multimodal.decode_media` now
REALLY decodes FLAC payloads to PCM.

Decoder coverage (the full subframe vocabulary real encoders emit):

* frame sync + header (all block-size/sample-rate/sample-size
  codes, UTF-8-coded frame/sample numbers, CRC-8 verified);
* subframes: CONSTANT, VERBATIM, FIXED orders 0-4, LPC any order
  (quantized coefficients + shift), wasted-bits unpacking;
* residuals: RICE and RICE2 partition methods, escape partitions;
* stereo decorrelation: left/side, right/side, mid/side (the side
  channel's +1 bit sample size included);
* frame CRC-16 verified.

The encoder exists to build REAL fixtures (and proves the decoder
against a second implementation path): fixed-blocksize frames,
per-channel FIXED order-2 prediction with rice-coded residuals —
enough to exercise the decoder's rice + predictor reconstruction,
with VERBATIM as the fallback for high-entropy blocks (both are
spec-legal choices an encoder is free to make).

Scale posture: this is a per-payload kernel invoked inside the
Arrow-batched ``mapInPandas`` media pipeline
(`operators/multimodal.py`) — embarrassingly parallel over blobs,
never a shuffle participant. Bit-level work is plain Python over
test-scale payloads; a production deployment would swap in a
native codec behind the same `decode_media` seam.
"""

from __future__ import annotations

import numpy as np

# ------------------------------------------------------------ CRCs


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


# ------------------------------------------------------- bit reader


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            if self.byte >= len(self.data):
                raise ValueError("FLAC bitstream truncated")
            v = (v << 1) | ((self.data[self.byte] >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v

    def sread(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


# ------------------------------------------------------------ decode

_BLOCKSIZE = {1: 192, **{n: 576 << (n - 2) for n in range(2, 6)},
              **{n: 256 << (n - 8) for n in range(8, 16)}}
_SAMPLE_SIZE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _read_utf8_number(r: _BitReader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    if n == 0:
        raise ValueError("invalid UTF-8 coded number")
    v = b0 & (mask - 1)
    for _ in range(n):
        c = r.read(8)
        if c >> 6 != 0b10:
            raise ValueError("invalid UTF-8 continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _decode_residual(r: _BitReader, blocksize: int, order: int) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise ValueError(f"reserved residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = r.read(4)
    nparts = 1 << po
    if blocksize % nparts:
        raise ValueError("partition count does not divide block size")
    out: list[int] = []
    for p in range(nparts):
        n = blocksize // nparts - (order if p == 0 else 0)
        param = r.read(pbits)
        if param == escape:
            raw = r.read(5)
            out.extend(r.sread(raw) if raw else 0 for _ in range(n))
        else:
            for _ in range(n):
                q = r.unary()
                v = (q << param) | r.read(param) if param else q
                out.append((v >> 1) ^ -(v & 1))
    return out


def _predict(warm: list[int], residual: list[int], coeffs: list[int], shift: int) -> list[int]:
    s = list(warm)
    o = len(coeffs)
    for res in residual:
        acc = sum(c * s[-1 - j] for j, c in enumerate(coeffs))
        s.append(res + (acc >> shift))
    return s if o else list(residual)


def _decode_subframe(r: _BitReader, blocksize: int, bps: int) -> list[int]:
    if r.read(1):
        raise ValueError("subframe padding bit set")
    t = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.unary() + 1
    eff = bps - wasted
    if t == 0:  # CONSTANT
        v = r.sread(eff)
        s = [v] * blocksize
    elif t == 1:  # VERBATIM
        s = [r.sread(eff) for _ in range(blocksize)]
    elif 8 <= t <= 12:  # FIXED
        order = t - 8
        warm = [r.sread(eff) for _ in range(order)]
        res = _decode_residual(r, blocksize, order)
        s = _predict(warm, res, _FIXED_COEFFS[order], 0)
    elif t >= 32:  # LPC
        order = (t & 0x1F) + 1
        warm = [r.sread(eff) for _ in range(order)]
        precision = r.read(4) + 1
        if precision == 16:
            raise ValueError("invalid LPC precision")
        shift = r.sread(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coeffs = [r.sread(precision) for _ in range(order)]
        res = _decode_residual(r, blocksize, order)
        s = _predict(warm, res, coeffs, shift)
    else:
        raise ValueError(f"reserved subframe type {t}")
    if wasted:
        s = [v << wasted for v in s]
    return s


def decode_flac(payload: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes → ((n_samples, n_channels) float32 in [-1, 1),
    sample_rate). Verifies header CRC-8 and frame CRC-16."""
    from .media_containers import parse_flac

    info = parse_flac(payload)
    # skip metadata blocks to the first frame
    pos = 4
    while True:
        hdr = payload[pos]
        blen = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        pos += 4 + blen
        if hdr & 0x80:
            break

    sr0, ch0, bps0 = info["sample_rate"], info["channels"], info["bits_per_sample"]
    total = info["total_samples"]
    chans: list[list[int]] = [[] for _ in range(ch0)]
    while pos < len(payload) and (total == 0 or len(chans[0]) < total):
        r = _BitReader(payload, pos)
        if r.read(14) != 0x3FFE:
            raise ValueError("lost FLAC frame sync")
        r.read(1)  # reserved
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        ss_code = r.read(3)
        r.read(1)  # reserved
        _read_utf8_number(r)
        if bs_code == 0:
            raise ValueError("reserved block size code 0")
        elif bs_code == 6:
            blocksize = r.read(8) + 1
        elif bs_code == 7:
            blocksize = r.read(16) + 1
        else:
            blocksize = _BLOCKSIZE[bs_code]
        if sr_code == 12:
            r.read(8)
        elif sr_code in (13, 14):
            r.read(16)
        elif sr_code == 15:
            raise ValueError("invalid sample rate code")
        bps = _SAMPLE_SIZE.get(ss_code, bps0)
        # CRC-8 covers the header bytes up to (excluding) the crc byte
        r.align()
        hdr_end = r.byte
        if _crc8(payload[pos:hdr_end]) != payload[hdr_end]:
            raise ValueError("FLAC frame header CRC-8 mismatch")
        r.byte = hdr_end + 1

        if ch_code <= 7:
            nch = ch_code + 1
            subs = [_decode_subframe(r, blocksize, bps) for _ in range(nch)]
        elif ch_code in (8, 9, 10):
            nch = 2
            bump = {8: (0, 1), 9: (1, 0), 10: (0, 1)}[ch_code]
            a = _decode_subframe(r, blocksize, bps + bump[0])
            b = _decode_subframe(r, blocksize, bps + bump[1])
            if ch_code == 8:  # left/side
                subs = [a, [x - y for x, y in zip(a, b)]]
            elif ch_code == 9:  # side/right
                subs = [[x + y for x, y in zip(a, b)], b]
            else:  # mid/side
                left, right = [], []
                for m, s in zip(a, b):
                    m2 = (m << 1) | (s & 1)
                    left.append((m2 + s) >> 1)
                    right.append((m2 - s) >> 1)
                subs = [left, right]
        else:
            raise ValueError(f"reserved channel assignment {ch_code}")
        if nch != ch0:
            raise ValueError("frame channel count != STREAMINFO")
        r.align()
        frame_end = r.byte
        crc = int.from_bytes(payload[frame_end : frame_end + 2], "big")
        if _crc16(payload[pos:frame_end]) != crc:
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = frame_end + 2
        for c in range(ch0):
            chans[c].extend(subs[c])

    if total:
        chans = [c[:total] for c in chans]
    arr = np.array(chans, dtype=np.int64).T
    scale = float(1 << (bps0 - 1))
    return (arr / scale).astype(np.float32), sr0


# ------------------------------------------------------------ encode


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


def _rice_param(res: list[int]) -> int:
    mean = sum(abs(x) for x in res) / max(len(res), 1)
    k = 0
    while (1 << k) < mean + 1 and k < 14:
        k += 1
    return k


def encode_flac(samples: np.ndarray, sample_rate: int, *, block_size: int = 4096) -> bytes:
    """(n, channels) int16 PCM → FLAC bytes: STREAMINFO + fixed-
    blocksize frames, per-channel FIXED order-2 + rice residuals
    (VERBATIM when that doesn't compress). A real, spec-conformant
    encoding — decodable by any FLAC decoder, not just ours."""
    if samples.dtype != np.int16:
        raise ValueError("encode_flac wants int16 PCM")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    bps = 16

    # ---- STREAMINFO
    bits = 0
    bits = (bits << 16) | min(block_size, max(n, 16))
    bits = (bits << 16) | min(block_size, max(n, 16))
    bits = (bits << 24) | 0
    bits = (bits << 24) | 0
    bits = (bits << 20) | sample_rate
    bits = (bits << 3) | (ch - 1)
    bits = (bits << 5) | (bps - 1)
    bits = (bits << 36) | n
    bits <<= 128
    body = bits.to_bytes(34, "big")
    out = bytearray(b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body)

    frame_no = 0
    for start in range(0, n, block_size):
        blk = samples[start : start + block_size]
        bsz = blk.shape[0]
        w = _BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed-blocksize stream
        w.write(7, 4)  # block size: 16-bit field below
        w.write(0, 4)  # sample rate: from STREAMINFO
        w.write(ch - 1, 4)  # independent channels
        w.write(4, 3)  # 16-bit samples
        w.write(0, 1)
        # UTF-8 frame number (fixture frames stay < 2^31)
        fn = frame_no
        if fn < 0x80:
            w.write(fn, 8)
        else:
            seq = []
            while fn >= 0x40:
                seq.append(0x80 | (fn & 0x3F))
                fn >>= 6
            lead = {1: 0xC0, 2: 0xE0, 3: 0xF0, 4: 0xF8, 5: 0xFC}[len(seq)]
            w.write(lead | fn, 8)
            for b in reversed(seq):
                w.write(b, 8)
        w.write(bsz - 1, 16)
        w.align()
        hdr = w.bytes()
        w = _BitWriter()
        for c in range(ch):
            s = blk[:, c].astype(int).tolist()
            if bsz > 2:
                res = [
                    s[i] - 2 * s[i - 1] + s[i - 2] for i in range(2, bsz)
                ]
                k = _rice_param(res)
                rice_bits = sum(((abs(2 * x) | (x < 0)) >> k) + 1 + k for x in res)
            if bsz > 2 and rice_bits + 2 * bps + 10 < bsz * bps:
                w.write(0, 1)
                w.write(8 + 2, 6)  # FIXED order 2
                w.write(0, 1)  # no wasted bits
                w.write(s[0], bps)
                w.write(s[1], bps)
                w.write(0, 2)  # RICE method
                w.write(0, 4)  # partition order 0
                w.write(k, 4)
                for x in res:
                    u = (x << 1) if x >= 0 else ((-x) << 1) - 1
                    q = u >> k
                    if q:
                        w.write(0, q)
                    w.write(1, 1)
                    if k:
                        w.write(u & ((1 << k) - 1), k)
            else:
                w.write(0, 1)
                w.write(1, 6)  # VERBATIM
                w.write(0, 1)
                for x in s:
                    w.write(x, bps)
        w.align()
        frame = hdr + bytes([_crc8(hdr)]) + w.bytes()
        out += frame + _crc16(frame).to_bytes(2, "big")
        frame_no += 1
    return bytes(out)
