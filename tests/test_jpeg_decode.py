"""Baseline-JPEG decoder goldens.

A minimal in-test encoder produces spec-conformant baseline JPEGs with
CUSTOM per-file Huffman tables (so the decoder's DHT handling is what's
exercised, not hard-coded defaults) and unit quantization — the DCT
coefficients are chosen, making expected pixels computable with an
independent O(N^4) IDCT in the test. Covers grayscale, YCbCr 4:4:4 and
4:2:0, DC-only closed forms, byte stuffing, and restart markers.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from ohsome_planet_spark.operators.jpeg import ZIGZAG, decode_jpeg, jpeg_to_gray


class _W:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.n = 0

    def bits(self, value: int, length: int):
        for i in range(length - 1, -1, -1):
            self.buf = (self.buf << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.buf)
                if self.buf == 0xFF:
                    self.out.append(0x00)
                self.buf = 0
                self.n = 0

    def pad(self):
        if self.n:
            self.bits((1 << (8 - self.n)) - 1, 8 - self.n)


def _canon_table(symbols):
    """Fixed-length canonical Huffman for the used symbol set."""
    syms = sorted(set(symbols))
    L = 1
    while (1 << L) - 1 < len(syms):
        L += 1
    bits = [0] * 16
    bits[L - 1] = len(syms)
    codes = {s: i for i, s in enumerate(syms)}
    return bits, syms, codes, L


def _cat(v: int) -> int:
    return 0 if v == 0 else int(v).bit_length() if v > 0 else int(-v).bit_length()


def _mag(v: int, t: int) -> int:
    return v if v >= 0 else v + (1 << t) - 1


def encode_jpeg(coeffs, sampling, w, h, restart_interval=0):
    """coeffs[ci]: (by_blocks, bx_blocks, 8, 8) int arrays (natural order);
    sampling[ci]: (h, v). Unit quantization, one shared DC/AC table pair."""
    nc = len(coeffs)
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux = coeffs[0].shape[1] // sampling[0][0]
    mcuy = coeffs[0].shape[0] // sampling[0][1]

    # gather symbols for huffman construction
    dc_syms, ac_syms = [], []
    zz = [c.reshape(c.shape[0], c.shape[1], 64)[:, :, :].copy() for c in coeffs]
    for ci in range(nc):
        flat = coeffs[ci].reshape(coeffs[ci].shape[0], coeffs[ci].shape[1], 64)
        zz[ci] = flat[:, :, ZIGZAG]

    def scan_blocks():
        preds = [0] * nc
        mcu_i = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                    yield ("RST", (mcu_i // restart_interval - 1) % 8)
                    preds = [0] * nc
                for ci in range(nc):
                    sh, sv = sampling[ci]
                    for by in range(sv):
                        for bx in range(sh):
                            b = zz[ci][my * sv + by, mx * sh + bx]
                            diff = int(b[0]) - preds[ci]
                            preds[ci] = int(b[0])
                            yield ("DC", _cat(diff), diff)
                            run = 0
                            last_nz = max(
                                [k for k in range(1, 64) if b[k]] or [0])
                            for k in range(1, last_nz + 1):
                                v = int(b[k])
                                if v == 0:
                                    run += 1
                                    if run == 16:
                                        yield ("AC", 0xF0, 0)
                                        run = 0
                                else:
                                    yield ("AC", (run << 4) | _cat(v), v)
                                    run = 0
                            if last_nz < 63:
                                yield ("EOB",)
                mcu_i += 1

    for ev in scan_blocks():
        if ev[0] == "DC":
            dc_syms.append(ev[1])
        elif ev[0] == "AC":
            ac_syms.append(ev[1])
        elif ev[0] == "EOB":
            ac_syms.append(0x00)
    dc_bits, dc_vals, dc_codes, dc_len = _canon_table(dc_syms or [0])
    ac_bits, ac_vals, ac_codes, ac_len = _canon_table(ac_syms or [0])

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes(np.ones(64, np.uint8)))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for ci in range(nc):
        sof += bytes([ci + 1, (sampling[ci][0] << 4) | sampling[ci][1], 0])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00] + dc_bits) + bytes(dc_vals))
    out += seg(0xC4, bytes([0x10] + ac_bits) + bytes(ac_vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    wtr = _W()
    for ev in scan_blocks():
        if ev[0] == "RST":
            wtr.pad()
            out += wtr.out
            wtr = _W()
            out += bytes([0xFF, 0xD0 + ev[1]])
        elif ev[0] == "DC":
            _, t, diff = ev
            wtr.bits(dc_codes[t], dc_len)
            if t:
                wtr.bits(_mag(diff, t), t)
        elif ev[0] == "AC":
            _, rs, v = ev
            wtr.bits(ac_codes[rs], ac_len)
            s = rs & 0xF
            if s:
                wtr.bits(_mag(v, s), s)
        else:
            wtr.bits(ac_codes[0x00], ac_len)
    wtr.pad()
    out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)


def _naive_idct(block):
    out = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8)
                    cv = np.sqrt(1 / 8) if v == 0 else np.sqrt(2 / 8)
                    s += (cu * cv * block[u, v]
                          * np.cos((2 * y + 1) * u * np.pi / 16)
                          * np.cos((2 * x + 1) * v * np.pi / 16))
            out[y, x] = s
    return out


def test_dc_only_flat_blocks_exact():
    """DC-only coefficients with unit quant: each block decodes to the
    exact flat value DC/8 + 128 (closed form, no float ambiguity)."""
    co = np.zeros((2, 3, 8, 8), np.int64)
    co[0, 0, 0, 0] = 80    # -> 90/… value 80/8+128 = 138
    co[0, 1, 0, 0] = -64   # -> 120
    co[1, 2, 0, 0] = 256   # -> 160
    img = decode_jpeg(encode_jpeg([co], [(1, 1)], 24, 16))
    assert img.shape == (16, 24) and img.dtype == np.uint8
    assert img[0, 0] == 138 and (img[:8, :8] == 138).all()
    assert (img[:8, 8:16] == 120).all()
    assert (img[8:, 16:] == 160).all()
    assert (img[:8, 16:] == 128).all()  # zero block


def test_random_coeffs_match_naive_idct():
    rng = np.random.default_rng(8)
    co = rng.integers(-120, 120, size=(2, 2, 8, 8)).astype(np.int64)
    img = decode_jpeg(encode_jpeg([co], [(1, 1)], 16, 16))
    expect = np.zeros((16, 16))
    for by in range(2):
        for bx in range(2):
            expect[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = (
                _naive_idct(co[by, bx].astype(np.float64)) + 128.0)
    np.testing.assert_array_equal(
        img, np.clip(np.round(expect), 0, 255).astype(np.uint8))


def test_color_444_and_420():
    rng = np.random.default_rng(9)
    # 4:4:4 — DC-only chroma so the YCbCr->RGB math is closed-form-ish
    y = rng.integers(-100, 100, size=(2, 2, 8, 8)).astype(np.int64)
    cb = np.zeros((2, 2, 8, 8), np.int64)
    cr = np.zeros((2, 2, 8, 8), np.int64)
    cb[:, :, 0, 0] = 80
    cr[:, :, 0, 0] = -40
    img = decode_jpeg(encode_jpeg([y, cb, cr], [(1, 1)] * 3, 16, 16))
    assert img.shape == (16, 16, 3)
    yv = np.zeros((16, 16))
    for by in range(2):
        for bx in range(2):
            yv[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = (
                _naive_idct(y[by, bx].astype(np.float64)) + 128.0)
    cbv, crv = 80 / 8.0, -40 / 8.0
    exp = np.stack([yv + 1.402 * crv,
                    yv - 0.344136 * cbv - 0.714136 * crv,
                    yv + 1.772 * cbv], axis=2)
    np.testing.assert_array_equal(
        img, np.clip(np.round(exp), 0, 255).astype(np.uint8))

    # 4:2:0 — luma 2x2 blocks per MCU, one chroma block upsampled
    y4 = rng.integers(-100, 100, size=(2, 2, 8, 8)).astype(np.int64)
    c1 = np.zeros((1, 1, 8, 8), np.int64)
    c1[0, 0, 0, 0] = 64
    img2 = decode_jpeg(encode_jpeg([y4, c1, c1], [(2, 2), (1, 1), (1, 1)],
                                   16, 16))
    assert img2.shape == (16, 16, 3)
    yv2 = np.zeros((16, 16))
    for by in range(2):
        for bx in range(2):
            yv2[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = (
                _naive_idct(y4[by, bx].astype(np.float64)) + 128.0)
    cv = 64 / 8.0
    exp2 = np.stack([yv2 + 1.402 * cv,
                     yv2 - 0.344136 * cv - 0.714136 * cv,
                     yv2 + 1.772 * cv], axis=2)
    np.testing.assert_array_equal(
        img2, np.clip(np.round(exp2), 0, 255).astype(np.uint8))


def test_restart_markers_and_stuffing():
    co = np.zeros((1, 4, 8, 8), np.int64)
    for i in range(4):
        co[0, i, 0, 0] = 8 * (i + 1)
    data = encode_jpeg([co], [(1, 1)], 32, 8, restart_interval=2)
    img = decode_jpeg(data)
    assert [int(img[0, i * 8]) for i in range(4)] == [129, 130, 131, 132]
    # byte stuffing: craft coefficients whose entropy bytes include 0xFF
    rng = np.random.default_rng(10)
    co2 = rng.integers(-255, 255, size=(1, 2, 8, 8)).astype(np.int64)
    img2 = decode_jpeg(encode_jpeg([co2], [(1, 1)], 16, 8))
    exp = np.zeros((8, 16))
    for bx in range(2):
        exp[:, bx * 8:bx * 8 + 8] = _naive_idct(
            co2[0, bx].astype(np.float64)) + 128.0
    np.testing.assert_array_equal(
        img2, np.clip(np.round(exp), 0, 255).astype(np.uint8))


def test_bad_inputs():
    with pytest.raises(ValueError):
        decode_jpeg(b"plainly not a jpeg")
    co = np.zeros((1, 1, 8, 8), np.int64)
    good = bytearray(encode_jpeg([co], [(1, 1)], 8, 8))
    sof = good.find(b"\xff\xc0")
    good[sof + 1] = 0xC2  # progressive
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(good))


def test_jpeg_to_gray():
    co = np.zeros((1, 1, 8, 8), np.int64)
    co[0, 0, 0, 0] = 0
    g = jpeg_to_gray(decode_jpeg(encode_jpeg([co], [(1, 1)], 8, 8)))
    assert g.shape == (8, 8) and (g == 128).all()
