"""Baseline JPEG codec — pure numpy/stdlib, from the public
ITU-T T.81 spec (VERDICT r6 stretch #9: retire one ``fake_feature``
fallback in the multimodal pipeline).

Scope (documented, enforced):

* decoder: baseline sequential DCT, 8-bit precision, ANY integral
  sampling-factor combination (4:4:4, 4:2:0, 4:2:2, 4:4:0,
  grayscale — interleaved MCU order per T.81 A.2.3 with nearest-
  neighbor chroma upsampling), tables from the file's own DQT/DHT
  segments, 0xFF00 byte-unstuffing, 0xFF fill bytes and standalone
  TEM/RSTn header markers skipped, no progressive / no restart
  intervals (DRI raises);
* encoder (fixture builder): 4:4:4, 4:2:0 (box-filtered chroma) or
  grayscale, flat quantization
  table scaled by ``quality``, custom VALID canonical Huffman
  tables written to DHT (fixed 5-bit DC / 9-bit AC codes — spec-
  legal since decoders read the tables from the stream; nothing
  assumes the Annex K defaults).

Everything is 8x8-block matrix math (DCT-II/IDCT as ``C @ B @ C.T``
over a precomputed orthonormal basis), vectorized across blocks —
the per-payload cost lives inside the Arrow-batched multimodal
kernels, same as the PNG path.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------- tables


def _zigzag_order() -> list[tuple[int, int]]:
    """The spec's zigzag scan, generated (anti-diagonals, direction
    alternating) rather than transcribed."""
    out = []
    for s in range(15):
        diag = [(u, s - u) for u in range(max(0, s - 7), min(8, s + 1))]
        out.extend(diag if s % 2 else reversed(diag))
    return out


_ZZ = _zigzag_order()
_ZZ_IDX = np.array([u * 8 + v for u, v in _ZZ])

_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16) * (
            np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8)
        )


def _dct2(blocks: np.ndarray) -> np.ndarray:
    return _C @ blocks @ _C.T


def _idct2(blocks: np.ndarray) -> np.ndarray:
    return _C.T @ blocks @ _C


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


def _size_cat(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length() if v < 0 else 0


# ----------------------------------------------------- bit streams


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-padding per spec
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy stream exhausted")
        byte = self.data[self.pos]
        self.pos += 1
        if byte == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("JPEG stream ends inside a marker")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed 0xFF data byte
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
        self.acc = (self.acc << 8) | byte
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# ------------------------------------------------- huffman tables


def _canonical_codes(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) from a DHT BITS/HUFFVAL pair (spec
    annex C canonical assignment)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


# fixed encoder-side tables: every DC category in 5 bits; AC
# symbols as 255 nine-bit + 1 ten-bit codes (a DHT BITS count must
# fit one byte) — canonical, Kraft-valid, all-ones code unused
_DC_BITS = [0, 0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0]
_AC_VALS = list(range(256))
_DC_CODES = _canonical_codes(_DC_BITS, _DC_VALS)
_AC_CODES = _canonical_codes(_AC_BITS, _AC_VALS)


class _HuffDecoder:
    def __init__(self, bits: list[int], huffval: list[int]) -> None:
        # (length, code) → symbol
        self.map: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.map[(length, code)] = huffval[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, r: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | r.read_bit()
            sym = self.map.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG scan")


# ---------------------------------------------------------- encode


def _blocks_of(
    plane: np.ndarray, tby: int | None = None, tbx: int | None = None
) -> np.ndarray:
    """(H, W) → (tby, tbx, 8, 8) with edge replication padding —
    ``tby``/``tbx`` let a subsampled encoder pad every component to
    its MCU-aligned block grid."""
    h, w = plane.shape
    tby = tby if tby is not None else -(-h // 8)
    tbx = tbx if tbx is not None else -(-w // 8)
    plane = np.pad(plane, ((0, tby * 8 - h), (0, tbx * 8 - w)), mode="edge")
    return plane.reshape(tby, 8, tbx, 8).transpose(0, 2, 1, 3)


def _box_downsample(plane: np.ndarray, fy: int, fx: int) -> np.ndarray:
    """Mean-pooled chroma downsampling (edge-padded to a factor
    multiple first — the standard box filter)."""
    h, w = plane.shape
    plane = np.pad(plane, ((0, -h % fy), (0, -w % fx)), mode="edge")
    hh, ww = plane.shape
    return plane.reshape(hh // fy, fy, ww // fx, fx).mean(axis=(1, 3))


def _write_block(bw: _BitWriter, zz: np.ndarray, prev_dc: int) -> int:
    """Entropy-code one zigzag block; returns the new DC predictor."""
    diff = int(zz[0]) - prev_dc
    s = _size_cat(diff)
    code, length = _DC_CODES[s]
    bw.write(code, length)
    if s:
        amp = diff if diff >= 0 else diff + (1 << s) - 1
        bw.write(amp, s)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for i in range(1, last + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = _AC_CODES[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        s = _size_cat(v)
        code, length = _AC_CODES[(run << 4) | s]
        bw.write(code, length)
        amp = v if v >= 0 else v + (1 << s) - 1
        bw.write(amp, s)
        run = 0
    if last < 63:
        code, length = _AC_CODES[0x00]  # EOB
        bw.write(code, length)
    return int(zz[0])


def encode_jpeg(
    arr: np.ndarray, *, quality: int = 85, subsampling: str = "444"
) -> bytes:
    """Baseline JPEG bytes for an ``(H, W, 3)`` or ``(H, W)`` uint8
    array. ``subsampling``: ``"444"`` (1x1 on every component) or
    ``"420"`` (Y at 2x2, box-filtered half-resolution chroma — the
    dominant real-world form); grayscale ignores it."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ncomp = arr.shape
    if ncomp not in (1, 3):
        raise ValueError("encode_jpeg expects 1 or 3 channels")
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    qval = max(1, min(255, round(2 * (100 - quality)) or 1))
    qtab = np.full(64, qval, dtype=np.int64)
    qtab[0] = max(1, qval // 2)  # gentler DC quantization

    planes = (
        [_rgb_to_ycbcr(arr.astype(np.float64))[..., i] for i in range(3)]
        if ncomp == 3
        else [arr[..., 0].astype(np.float64)]
    )
    if ncomp == 3 and subsampling == "420":
        samp = [(2, 2), (1, 1), (1, 1)]
        planes = [planes[0]] + [_box_downsample(p, 2, 2) for p in planes[1:]]
    else:
        samp = [(1, 1)] * ncomp
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))

    out = bytearray(b"\xff\xd8")  # SOI
    # DQT (one 8-bit table, id 0)
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00"
    out += bytes(int(qtab[i]) for i in range(64))  # zigzag order: flat ⇒ same
    # SOF0
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        hi, vi = samp[cid - 1]
        out += bytes([cid, (hi << 4) | vi, 0])
    # DHT: DC table 0 + AC table 0 (shared by all components)
    for tc, bits, vals in ((0, _DC_BITS, _DC_VALS), (1, _AC_BITS, _AC_VALS)):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) + bytes([tc << 4])
        out += bytes(bits) + bytes(vals)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for cid in range(1, ncomp + 1):
        out += bytes([cid, 0x00])
    out += b"\x00\x3f\x00"

    qmat = qtab[_ZZ_IDX.argsort()].reshape(8, 8)  # natural order (flat anyway)
    comps = []
    for plane, (hi, vi) in zip(planes, samp):
        blocks = _blocks_of(plane, mcuy * vi, mcux * hi) - 128.0
        comps.append(np.round(_dct2(blocks) / qmat).astype(np.int64))
    bw = _BitWriter()
    prev_dc = [0] * len(planes)
    # interleaved MCU order: per MCU, each component contributes its
    # vi×hi block patch (T.81 A.2.3); 4:4:4 degenerates to the plain
    # per-block interleave
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, coef in enumerate(comps):
                hi, vi = samp[ci]
                for bv in range(vi):
                    for bh in range(hi):
                        zz = coef[my * vi + bv, mx * hi + bh].reshape(64)[_ZZ_IDX]
                        prev_dc[ci] = _write_block(bw, zz, prev_dc[ci])
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------- decode


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode baseline sequential 8-bit JPEG (any integral sampling
    factors — 4:4:4, 4:2:0, 4:2:2, ... ) to ``(H, W, 3) uint8``.
    Tables come from the file; progressive / restart-interval
    streams raise."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    frame = None
    scan = None
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        # spec-legal 0xFF fill bytes may pad before any marker
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # TEM / RSTn: standalone, no length field
        if pos + 2 > len(payload):
            raise ValueError("truncated marker segment")
        (seglen,) = struct.unpack_from(">H", payload, pos)
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq != 0:
                    raise ValueError("16-bit quantization tables unsupported")
                zz = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.int64)
                p += 64
                nat = np.empty(64, dtype=np.int64)
                nat[_ZZ_IDX] = zz
                qtabs[tq] = nat.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                p += 1
                bits = list(seg[p : p + 16])
                p += 16
                n = sum(bits)
                vals = list(seg[p : p + n])
                p += n
                (huff_ac if tc else huff_dc)[th] = _HuffDecoder(bits, vals)
        elif marker == 0xC0:  # SOF0 baseline
            prec, fh, fw, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, samp, tq = seg[6 + 3 * i : 6 + 3 * i + 3]
                hi, vi = samp >> 4, samp & 0xF
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError(f"illegal sampling factors {hi}x{vi}")
                comps.append({"id": cid, "h": hi, "v": vi, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(f"unsupported SOF marker 0xFF{marker:02X} (non-baseline)")
        elif marker == 0xDD:  # DRI
            raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            sel = []
            for i in range(ns):
                cs, tables = seg[1 + 2 * i], seg[2 + 2 * i]
                sel.append({"cs": cs, "td": tables >> 4, "ta": tables & 0xF})
            scan = sel
            pos += seglen
            break
        pos += seglen
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF0/SOS")

    # entropy-coded data runs from pos to the EOI marker
    end = payload.rfind(b"\xff\xd9")
    if end < 0:
        raise ValueError("JPEG missing EOI")
    r = _BitReader(payload[pos:end])

    h, w = frame["h"], frame["w"]
    ncomp = len(frame["comps"])
    if len(scan) != ncomp:
        raise ValueError("multi-scan (non-interleaved) baseline unsupported")
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    for c in frame["comps"]:
        if hmax % c["h"] or vmax % c["v"]:
            raise ValueError("fractional sampling ratios unsupported")
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    coefs = [
        np.zeros((mcuy * c["v"], mcux * c["h"], 8, 8), dtype=np.int64)
        for c in frame["comps"]
    ]
    prev_dc = [0] * ncomp
    comp_by_id = {c["id"]: i for i, c in enumerate(frame["comps"])}
    order = [comp_by_id[s["cs"]] for s in scan]

    def _read_block(dc_dec: _HuffDecoder, ac_dec: _HuffDecoder, ci: int):
        s = dc_dec.decode(r)
        diff = _extend(r.receive(s), s)
        prev_dc[ci] += diff
        zz = np.zeros(64, dtype=np.int64)
        zz[0] = prev_dc[ci]
        i = 1
        while i < 64:
            rs = ac_dec.decode(r)
            run, size = rs >> 4, rs & 0xF
            if size == 0:
                if run == 15:  # ZRL
                    i += 16
                    continue
                break  # EOB
            i += run
            if i > 63:
                raise ValueError("AC run past block end")
            zz[i] = _extend(r.receive(size), size)
            i += 1
        blk = np.zeros(64, dtype=np.int64)
        blk[_ZZ_IDX] = zz
        return blk.reshape(8, 8)

    # interleaved MCU order (T.81 A.2.3); 1x1-everywhere degenerates
    # to one block per component per MCU — the old 4:4:4 loop
    for my in range(mcuy):
        for mx in range(mcux):
            for si, ci in enumerate(order):
                comp = frame["comps"][ci]
                dc_dec = huff_dc[scan[si]["td"]]
                ac_dec = huff_ac[scan[si]["ta"]]
                for bv in range(comp["v"]):
                    for bh in range(comp["h"]):
                        coefs[ci][my * comp["v"] + bv, mx * comp["h"] + bh] = (
                            _read_block(dc_dec, ac_dec, ci)
                        )

    planes = []
    for ci, comp in enumerate(frame["comps"]):
        q = qtabs[comp["tq"]]
        spatial = _idct2(coefs[ci] * q) + 128.0
        rows, cols = coefs[ci].shape[:2]
        full = spatial.transpose(0, 2, 1, 3).reshape(rows * 8, cols * 8)
        # crop to the component's own sample grid, then replicate up
        # to full resolution (nearest-neighbor chroma upsampling)
        ch = -(-h * comp["v"] // vmax)
        cw = -(-w * comp["h"] // hmax)
        sub = full[:ch, :cw]
        fy, fx = vmax // comp["v"], hmax // comp["h"]
        if fy > 1 or fx > 1:
            sub = np.repeat(np.repeat(sub, fy, axis=0), fx, axis=1)
        planes.append(sub[:h, :w])
    if ncomp == 1:
        gray = np.clip(planes[0].round(), 0, 255).astype(np.uint8)
        return np.stack([gray] * 3, axis=-1)
    if ncomp == 3:
        return _ycbcr_to_rgb(np.stack(planes, axis=-1))
    raise ValueError(f"unsupported component count {ncomp}")
