"""FLAC decoder goldens: bit-exact lossless roundtrips via an in-test
encoder (valid streams: real header CRC-8 / frame CRC-16), covering
constant/verbatim/fixed/LPC subframes, rice + escape partitions, wasted
bits, partition orders, and all stereo decorrelation modes."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from ohsome_planet_spark.operators.flac import decode_flac, flac_features


def _crc8(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _BW:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.n = 0

    def w(self, value: int, bits: int):
        value &= (1 << bits) - 1
        for i in range(bits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.bytes.append(self.acc)
                self.acc = 0
                self.n = 0

    def unary(self, q: int):
        for _ in range(q):
            self.w(0, 1)
        self.w(1, 1)

    def align(self):
        while self.n:
            self.w(0, 1)


def _rice(bw: _BW, residuals, param: int, plen: int = 4, escape_raw=None):
    bw.w(0 if plen == 4 else 1, 2)   # method
    bw.w(0, 4)                        # partition order 0
    if escape_raw is not None:
        bw.w((1 << plen) - 1, plen)
        bw.w(escape_raw, 5)
        for r in residuals:
            bw.w(r & ((1 << escape_raw) - 1), escape_raw)
        return
    bw.w(param, plen)
    for r in residuals:
        z = (r << 1) ^ (r >> 63) if r >= 0 else ((-r) << 1) - 1
        z = (r << 1) if r >= 0 else ((-r) << 1) - 1
        bw.unary(z >> param)
        if param:
            bw.w(z & ((1 << param) - 1), param)


def _subframe(bw: _BW, samples, bps, kind, wasted=0, **kw):
    bw.w(0, 1)
    if wasted:
        shifted = [s >> wasted for s in samples]
    else:
        shifted = list(samples)
    sbps = bps - wasted
    if kind == "constant":
        bw.w(0, 6)
    elif kind == "verbatim":
        bw.w(1, 6)
    elif kind.startswith("fixed"):
        order = int(kind[-1])
        bw.w(8 + order, 6)
    elif kind == "lpc":
        order = len(kw["coeffs"])
        bw.w(32 + order - 1, 6)
    if wasted:
        bw.w(1, 1)
        bw.unary(wasted - 1)
    else:
        bw.w(0, 1)
    if kind == "constant":
        bw.w(shifted[0], sbps)
        return
    if kind == "verbatim":
        for s in shifted:
            bw.w(s, sbps)
        return
    if kind.startswith("fixed"):
        order = int(kind[-1])
        coeffs = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}[order]
    else:
        order = len(kw["coeffs"])
        coeffs = None
    for s in shifted[:order]:
        bw.w(s, sbps)
    res = []
    if kind.startswith("fixed"):
        for i in range(order, len(shifted)):
            pred = sum(c * shifted[i - 1 - j] for j, c in enumerate(coeffs))
            res.append(shifted[i] - pred)
    else:
        prec, shift, lc = kw["precision"], kw["shift"], kw["coeffs"]
        bw_pre = None
        for i in range(order, len(shifted)):
            acc = sum(c * shifted[i - 1 - j] for j, c in enumerate(lc))
            res.append(shifted[i] - (acc >> shift))
    if kind == "lpc":
        bw.w(kw["precision"] - 1, 4)
        bw.w(kw["shift"], 5)
        for c in kw["coeffs"]:
            bw.w(c, kw["precision"])
    _rice(bw, res, kw.get("param", 4), kw.get("plen", 4),
          kw.get("escape_raw"))


def encode_flac(frames, rate=16000, bps=16, channels=1):
    """frames: list of dicts {samples: per-channel lists, mode, kinds, kw}."""
    total = sum(len(f["samples"][0]) for f in frames)
    out = bytearray(b"fLaC")
    si = _BW()
    si.w(16, 16)
    si.w(65535, 16)
    si.w(0, 24)
    si.w(0, 24)
    si.w(rate, 20)
    si.w(channels - 1, 3)
    si.w(bps - 1, 5)
    si.w(total, 36)
    si.align()
    body = bytes(si.bytes) + b"\x00" * 16
    out += bytes([0x80, 0, 0, len(body)]) + body
    for fi, f in enumerate(frames):
        n = len(f["samples"][0])
        hdr = _BW()
        hdr.w(0x3FFE, 14)
        hdr.w(0, 1)
        hdr.w(0, 1)
        hdr.w(6, 4)            # 8-bit blocksize-1 follows
        hdr.w(0, 4)            # rate from streaminfo
        mode = f.get("mode", "independent")
        chan_code = {"independent": channels - 1, "left_side": 8,
                     "right_side": 9, "mid_side": 10}[mode]
        hdr.w(chan_code, 4)
        hdr.w(0, 3)            # bps from streaminfo
        hdr.w(0, 1)
        assert fi < 128
        hdr.w(fi, 8)           # UTF-8 single byte
        hdr.w(n - 1, 8)
        hdr.align()
        hbytes = bytes(hdr.bytes)
        frame = _BW()
        for byte in hbytes:
            frame.w(byte, 8)
        frame.w(_crc8(hbytes), 8)
        kinds = f["kinds"]
        kws = f.get("kw", [{}] * len(kinds))
        if mode == "independent":
            streams = f["samples"]
            bpss = [bps] * channels
        else:
            l, r = f["samples"]
            if mode == "left_side":
                streams = [l, [a - b for a, b in zip(l, r)]]
                bpss = [bps, bps + 1]
            elif mode == "right_side":
                streams = [[a - b for a, b in zip(l, r)], r]
                bpss = [bps + 1, bps]
            else:
                streams = [[(a + b) >> 1 for a, b in zip(l, r)],
                           [a - b for a, b in zip(l, r)]]
                bpss = [bps, bps + 1]
        for ci, s in enumerate(streams):
            _subframe(frame, s, bpss[ci], kinds[ci], **kws[ci])
        frame.align()
        fbytes = bytes(frame.bytes)
        out += fbytes + struct.pack(">H", _crc16(fbytes))
    return bytes(out)


def test_constant_and_verbatim():
    c = [123] * 32
    v = list(range(-16, 16))
    data = encode_flac([
        {"samples": [c], "kinds": ["constant"]},
        {"samples": [v], "kinds": ["verbatim"]},
    ])
    got, rate = decode_flac(data)
    assert rate == 16000
    np.testing.assert_array_equal(got[:, 0], np.array(c + v))


def test_fixed_orders_and_partitions():
    rng = np.random.default_rng(3)
    base = np.cumsum(rng.integers(-40, 40, 64)).tolist()
    data = encode_flac([
        {"samples": [base], "kinds": ["fixed1"], "kw": [{"param": 6}]},
        {"samples": [base], "kinds": ["fixed2"], "kw": [{"param": 7, "plen": 5}]},
        {"samples": [base], "kinds": ["fixed0"],
         "kw": [{"escape_raw": 17}]},
    ])
    got, _ = decode_flac(data)
    np.testing.assert_array_equal(got[:, 0], np.array(base * 3))


def test_lpc_and_wasted_bits():
    rng = np.random.default_rng(4)
    smooth = np.cumsum(rng.integers(-10, 10, 48)).tolist()
    shifted = [s * 4 for s in smooth]  # 2 wasted bits
    data = encode_flac([
        {"samples": [smooth], "kinds": ["lpc"],
         "kw": [{"coeffs": [3, -2], "precision": 6, "shift": 1, "param": 8}]},
        {"samples": [shifted], "kinds": ["verbatim"], "kw": [{"wasted": 2}]},
    ])
    got, _ = decode_flac(data)
    np.testing.assert_array_equal(got[:, 0], np.array(smooth + shifted))


def test_stereo_modes():
    rng = np.random.default_rng(5)
    l = np.cumsum(rng.integers(-30, 30, 32)).tolist()
    r = [a - rng.integers(-5, 6) for a in l]
    for mode in ("independent", "left_side", "right_side", "mid_side"):
        data = encode_flac(
            [{"samples": [l, r], "mode": mode,
              "kinds": ["verbatim", "verbatim"]}], channels=2)
        got, _ = decode_flac(data)
        np.testing.assert_array_equal(got[:, 0], np.array(l), err_msg=mode)
        np.testing.assert_array_equal(got[:, 1], np.array(r), err_msg=mode)


def test_features_and_errors():
    pcm = (np.sin(np.arange(400) / 5.0) * 1000).astype(np.int64).tolist()
    frames = [{"samples": [pcm[i:i + 100]], "kinds": ["verbatim"]}
              for i in range(0, 400, 100)]
    feats = flac_features(encode_flac(frames, rate=8000))
    assert feats.shape == (4,)
    assert feats[3] == pytest.approx(400 / 8000)
    assert feats[0] > 0
    with pytest.raises(ValueError):
        decode_flac(b"not a flac stream")


def test_flac_feature_path_in_spark(spark):
    """decode_features over a FLAC payload == the same PCM shipped raw
    (mono: mean over 1 channel is identity)."""
    from ohsome_planet_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_features,
    )

    pcm = (np.sin(np.arange(320) / 4.0) * 2000).astype(np.int64).tolist()
    frames = [{"samples": [pcm[i:i + 80]], "kinds": ["verbatim"]}
              for i in range(0, 320, 80)]
    flac_bytes = encode_flac(frames, rate=16000)
    raw = np.asarray(pcm, dtype="<i2").tobytes()
    rows = [
        (1, "audio", "flac", bytearray(flac_bytes),
         {"width": None, "height": None, "sample_rate": 16000,
          "duration_ms": 20}),
        (2, "audio", "raw", bytearray(raw),
         {"width": None, "height": None, "sample_rate": 16000,
          "duration_ms": 20}),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in decode_features(media).collect()}
    assert out[1]["features"] == out[2]["features"]
