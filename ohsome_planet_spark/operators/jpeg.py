"""Baseline JPEG decoder — pure NumPy, zero new dependencies.

Implements the baseline sequential DCT process of ITU-T T.81 (the public
JPEG specification): marker/segment parsing (SOI, APPn, COM, DQT, SOF0,
DHT, DRI, SOS, EOI), canonical Huffman decoding of entropy-coded MCUs
(DC prediction + AC run/length with ZRL and EOB), dequantization,
zig-zag de-ordering, a float 2-D inverse DCT (separable, orthonormal
scaling per A.3.3), level shift, chroma upsampling for 4:2:0/4:2:2, and
YCbCr→RGB per JFIF. Restart markers (RSTn) are honored.

Not covered (raise clearly): progressive (SOF2), arithmetic coding,
12-bit precision, lossless modes. Those are the same documented swap
point as before — but baseline JPEG covers the overwhelming majority of
stored web images.

The test suite encodes known pixels with its own minimal encoder
(custom per-file Huffman tables carried in DHT — the decoder must honor
in-file tables, so no reliance on the Annex-K defaults), including
closed-form DC-only images whose decoded output is exact.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], np.int64)

# orthonormal 8x8 DCT basis: spatial = C.T @ coeff @ C
_K = np.arange(8)
_C = np.cos((2 * _K[None, :] + 1) * _K[:, None] * np.pi / 16) * np.where(
    _K[:, None] == 0, np.sqrt(1 / 8), np.sqrt(2 / 8))


def idct2(block: np.ndarray) -> np.ndarray:
    return _C.T @ block @ _C


class _Huff:
    """Canonical Huffman table from DHT (bits[16] + values)."""

    __slots__ = ("lookup",)

    def __init__(self, bits: list[int], values: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = values[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """Entropy-coded segment reader: 0xFF00 destuffing, stops at markers."""

    __slots__ = ("data", "pos", "bitbuf", "nbits")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                # marker (EOI etc.): pad with zero bits per spec
                self.bitbuf = (self.bitbuf << 8) & 0xFFFFFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.bitbuf = ((self.bitbuf << 8) | b) & 0xFFFFFFFF
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table: _Huff) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG huffman code")

    def sync_to_restart(self) -> None:
        self.bitbuf = 0
        self.nbits = 0
        # scan forward to the RST marker and skip it
        d = self.data
        while not (d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7):
            self.pos += 1
        self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, marker: int):
        self.marker = marker


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t-bit magnitude to signed value."""
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(content: bytes, meta=None) -> np.ndarray:
    """JPEG bytes → (h, w) uint8 grayscale or (h, w, 3) uint8 RGB."""
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    hts: dict[tuple[int, int], _Huff] = {}  # (class, id)
    comps = None
    h = w = 0
    restart_interval = 0
    n = len(content)
    while pos < n:
        if content[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = content[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack(">H", content[pos:pos + 2])
        seg = content[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[p:p + 64], np.uint8).astype(np.int64)
                    p += 64
                else:
                    tbl = np.frombuffer(seg[p:p + 128], ">u2").astype(np.int64)
                    p += 128
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1:p + 17])
                nv = sum(bits)
                values = seg[p + 17:p + 17 + nv]
                hts[(tc, th)] = _Huff(bits, values)
                p += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + ci * 3:9 + ci * 3]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG process (SOF{marker - 0xC0}) not supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if comps is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = {}
            for ci in range(ns):
                cid, tds = seg[1 + ci * 2:3 + ci * 2]
                scan[cid] = (tds >> 4, tds & 0xF)
            return _decode_scan(content, pos + seglen, h, w, comps, scan,
                                qt, hts, restart_interval)
        pos += seglen
    raise ValueError("JPEG has no scan data")


def _decode_scan(data, pos, h, w, comps, scan, qt, hts, restart_interval):
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c in comps:
        planes.append(np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8),
                               np.float64))
    preds = [0] * len(comps)
    rd = _BitReader(data, pos)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                rd.sync_to_restart()
                preds = [0] * len(comps)
            try:
                for ci, c in enumerate(comps):
                    dc_t, ac_t = scan[c["id"]]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            coeff = np.zeros(64, np.int64)
                            t = rd.huff(hts[(0, dc_t)])
                            diff = _extend(rd.bits(t), t) if t else 0
                            preds[ci] += diff
                            coeff[0] = preds[ci]
                            k = 1
                            while k < 64:
                                rs = rd.huff(hts[(1, ac_t)])
                                r, s = rs >> 4, rs & 0xF
                                if s == 0:
                                    if r == 15:
                                        k += 16  # ZRL
                                        continue
                                    break  # EOB
                                k += r
                                coeff[k] = _extend(rd.bits(s), s)
                                k += 1
                            deq = coeff * qt[c["tq"]]
                            block = np.zeros(64, np.float64)
                            block[ZIGZAG] = deq
                            px = idct2(block.reshape(8, 8)) + 128.0
                            y0 = (my * c["v"] + by) * 8
                            x0 = (mx * c["h"] + bx) * 8
                            planes[ci][y0:y0 + 8, x0:x0 + 8] = px
            except _RestartMarker:
                raise ValueError("unexpected JPEG restart marker")
            mcu_count += 1
    out_planes = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out_planes[0], out_planes[1] - 128.0, out_planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def jpeg_to_gray(img: np.ndarray) -> np.ndarray:
    """Decoded JPEG array → (h, w) uint8 grayscale (same integer luma as
    the PNG path)."""
    if img.ndim == 2:
        return img
    r, g, b = (img[:, :, i].astype(np.uint32) for i in range(3))
    return ((77 * r + 150 * g + 29 * b) >> 8).astype(np.uint8)
