"""FLAC decoder — pure Python/NumPy, zero new dependencies.

Implements the published FLAC format (xiph.org specification / RFC 9639):
STREAMINFO metadata, frame headers (UTF-8 frame numbers, all block-size
and sample-size codes), subframe types CONSTANT / VERBATIM / FIXED
(orders 0–4) / LPC (quantized coefficients + shift), Rice-coded residuals
(both 4- and 5-bit parameter methods, escape partitions, partition
orders), wasted bits, and all stereo decorrelation modes (left/side,
right/side, mid/side).

FLAC is LOSSLESS, so the goldens are bit-exact roundtrips against an
in-test encoder — no float tolerance anywhere. Rice coding is inherently
bit-serial, so the hot loop is Python (fine for the feature-extraction
tier this feeds; a production cluster swaps in soundfile/libsndfile with
the same (bytes, meta) → ndarray signature, exactly like the other
codec entries).
"""

from __future__ import annotations

import struct

import numpy as np


class _Bits:
    __slots__ = ("data", "bitpos")

    def __init__(self, data: bytes, bytepos: int = 0):
        self.data = data
        self.bitpos = bytepos * 8

    def read(self, n: int) -> int:
        v = 0
        bp = self.bitpos
        data = self.data
        for _ in range(n):
            v = (v << 1) | ((data[bp >> 3] >> (7 - (bp & 7))) & 1)
            bp += 1
        self.bitpos = bp
        return v

    def sread(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        n = 0
        bp = self.bitpos
        data = self.data
        while not (data[bp >> 3] >> (7 - (bp & 7))) & 1:
            n += 1
            bp += 1
        self.bitpos = bp + 1
        return n

    def align(self) -> None:
        self.bitpos = (self.bitpos + 7) & ~7


_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _read_utf8_number(b: _Bits) -> int:
    first = b.read(8)
    if first < 0x80:
        return first
    n_extra = 0
    mask = 0x40
    while first & mask:
        n_extra += 1
        mask >>= 1
    v = first & (mask - 1)
    for _ in range(n_extra):
        v = (v << 6) | (b.read(8) & 0x3F)
    return v


def _residual(b: _Bits, blocksize: int, pred_order: int) -> list[int]:
    method = b.read(2)
    if method > 1:
        raise ValueError("reserved FLAC residual method")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    part_order = b.read(4)
    nparts = 1 << part_order
    out: list[int] = []
    for p in range(nparts):
        count = blocksize >> part_order
        if p == 0:
            count -= pred_order
        param = b.read(plen)
        if param == escape:
            raw = b.read(5)
            for _ in range(count):
                out.append(b.sread(raw) if raw else 0)
        else:
            for _ in range(count):
                q = b.unary()
                v = (q << param) | (b.read(param) if param else 0)
                out.append((v >> 1) ^ -(v & 1))
    return out


def _subframe(b: _Bits, blocksize: int, bps: int) -> list[int]:
    if b.read(1):
        raise ValueError("bad FLAC subframe padding bit")
    ftype = b.read(6)
    wasted = 0
    if b.read(1):
        wasted = b.unary() + 1
    bps -= wasted
    if ftype == 0:  # CONSTANT
        v = b.sread(bps)
        samples = [v] * blocksize
    elif ftype == 1:  # VERBATIM
        samples = [b.sread(bps) for _ in range(blocksize)]
    elif 8 <= ftype <= 12:  # FIXED order 0-4
        order = ftype - 8
        samples = [b.sread(bps) for _ in range(order)]
        res = _residual(b, blocksize, order)
        coeffs = _FIXED_COEFFS[order]
        for r in res:
            v = r
            for j, c in enumerate(coeffs):
                v += c * samples[-1 - j]
            samples.append(v)
    elif ftype >= 32:  # LPC
        order = ftype - 31
        samples = [b.sread(bps) for _ in range(order)]
        precision = b.read(4) + 1
        if precision == 16:
            raise ValueError("invalid FLAC LPC precision")
        shift = b.sread(5)
        coeffs = [b.sread(precision) for _ in range(order)]
        res = _residual(b, blocksize, order)
        for r in res:
            acc = 0
            for j, c in enumerate(coeffs):
                acc += c * samples[-1 - j]
            samples.append(r + (acc >> shift))
    else:
        raise ValueError(f"reserved FLAC subframe type {ftype}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


_BLOCKSIZE_TABLE = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                    13: 8192, 14: 16384, 15: 32768}
_SAMPLESIZE_TABLE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
_RATE_TABLE = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
               6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}


def decode_flac(content: bytes, meta=None):
    """FLAC bytes → ((n_samples, channels) int32 array, sample_rate)."""
    if content[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (missing fLaC magic)")
    pos = 4
    streaminfo = None
    while True:
        hdr = content[pos]
        last = hdr >> 7
        btype = hdr & 0x7F
        (blen,) = struct.unpack(">I", b"\x00" + content[pos + 1:pos + 4])
        body = content[pos + 4:pos + 4 + blen]
        if btype == 0:
            b = _Bits(body)
            b.read(16)  # min blocksize
            b.read(16)
            b.read(24)
            b.read(24)
            rate = b.read(20)
            channels = b.read(3) + 1
            bps = b.read(5) + 1
            total = b.read(36)
            streaminfo = (rate, channels, bps, total)
        pos += 4 + blen
        if last:
            break
    if streaminfo is None:
        raise ValueError("FLAC stream without STREAMINFO")
    rate, channels, bps, total = streaminfo

    out: list[list[int]] = []
    n = len(content)
    b = _Bits(content, pos)
    while (b.bitpos >> 3) < n - 1:
        sync = b.read(14)
        if sync != 0x3FFE:
            raise ValueError("lost FLAC frame sync")
        b.read(1)  # reserved
        b.read(1)  # blocking strategy
        bs_code = b.read(4)
        sr_code = b.read(4)
        chan_code = b.read(4)
        ss_code = b.read(3)
        b.read(1)  # reserved
        _read_utf8_number(b)
        if bs_code == 0:
            raise ValueError("reserved FLAC block size code")
        elif bs_code == 6:
            blocksize = b.read(8) + 1
        elif bs_code == 7:
            blocksize = b.read(16) + 1
        else:
            blocksize = _BLOCKSIZE_TABLE[bs_code]
        if sr_code == 12:
            b.read(8)
        elif sr_code in (13, 14):
            b.read(16)
        frame_bps = bps if ss_code == 0 else _SAMPLESIZE_TABLE[ss_code]
        b.read(8)  # header CRC-8 (not verified)

        if chan_code < 8:
            nch = chan_code + 1
            chans = [_subframe(b, blocksize, frame_bps) for _ in range(nch)]
        elif chan_code == 8:  # left/side
            left = _subframe(b, blocksize, frame_bps)
            side = _subframe(b, blocksize, frame_bps + 1)
            chans = [left, [l - s for l, s in zip(left, side)]]
        elif chan_code == 9:  # right/side
            side = _subframe(b, blocksize, frame_bps + 1)
            right = _subframe(b, blocksize, frame_bps)
            chans = [[r + s for r, s in zip(right, side)], right]
        elif chan_code == 10:  # mid/side
            mid = _subframe(b, blocksize, frame_bps)
            side = _subframe(b, blocksize, frame_bps + 1)
            left, right = [], []
            for m, s in zip(mid, side):
                m = (m << 1) | (s & 1)
                left.append((m + s) >> 1)
                right.append((m - s) >> 1)
            chans = [left, right]
        else:
            raise ValueError("reserved FLAC channel assignment")
        b.align()
        b.read(16)  # frame CRC-16 (not verified)
        for i in range(blocksize):
            out.append([c[i] for c in chans])
    arr = np.asarray(out, np.int32)
    if total:
        arr = arr[:total]
    return arr, rate


def flac_features(content: bytes) -> np.ndarray:
    """Decoded FLAC → the audio feature vector of the multimodal layer
    (mono-mixed rms/zcr/spectral-centroid/duration)."""
    from .multimodal import audio_features

    samples, rate = decode_flac(content)
    mono = samples.astype(np.float64).mean(axis=1)
    return audio_features(mono, rate)
