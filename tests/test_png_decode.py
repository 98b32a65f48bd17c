"""Closed-form goldens for the pure-NumPy PNG decoder.

A minimal in-test encoder (struct + zlib, explicit per-scanline filter
choice) produces known-pixel PNGs; decode_png must return the exact
arrays. Covers all five filter types, gray/RGB/RGBA/palette/gray+alpha,
bit depths 1/2/4/8/16, and the mapInPandas feature path end to end.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from ohsome_planet_spark.operators.multimodal import (
    decode_png,
    png_to_gray,
)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + ctype + data
        + struct.pack(">I", zlib.crc32(ctype + data))
    )


def encode_png(pixels: np.ndarray, color: int, depth: int = 8,
               filters=None, palette: np.ndarray | None = None) -> bytes:
    """Encode pixels with an explicit filter type per scanline."""
    if pixels.ndim == 2:
        h, w = pixels.shape
        ch = 1
        flat = pixels[:, :, None]
    else:
        h, w, ch = pixels.shape
        flat = pixels
    bits_per_px = depth * ch
    bpp = max(1, bits_per_px // 8)
    stride = (w * bits_per_px + 7) // 8
    filters = filters if filters is not None else [0] * h
    raw = bytearray()
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        if depth == 8:
            line = flat[y].reshape(-1).astype(np.int32)
        elif depth == 16:
            v = flat[y].reshape(-1).astype(np.uint16)
            line = np.empty(v.size * 2, np.int32)
            line[0::2] = v >> 8
            line[1::2] = v & 0xFF
        else:
            v = flat[y].reshape(-1).astype(np.uint8)
            bits = ((v[:, None] >> np.arange(depth - 1, -1, -1)) & 1).ravel()
            bits = np.pad(bits, (0, stride * 8 - bits.size))
            line = np.packbits(bits).astype(np.int32)
        f = filters[y]
        out = np.empty(stride, np.int32)
        for x in range(stride):
            left = line[x - bpp] if x >= bpp else 0
            up = prev[x]
            ul = prev[x - bpp] if x >= bpp else 0
            if f == 0:
                out[x] = line[x]
            elif f == 1:
                out[x] = line[x] - left
            elif f == 2:
                out[x] = line[x] - up
            elif f == 3:
                out[x] = line[x] - ((left + up) >> 1)
            else:
                pa, pb, pc = abs(up - ul), abs(left - ul), abs(left + up - 2 * ul)
                pr = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                out[x] = line[x] - pr
        raw.append(f)
        raw.extend((out & 0xFF).astype(np.uint8).tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 0)
    png = bytearray(b"\x89PNG\r\n\x1a\n")
    png += _chunk(b"IHDR", ihdr)
    if palette is not None:
        png += _chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    png += _chunk(b"IDAT", zlib.compress(bytes(raw)))
    png += _chunk(b"IEND", b"")
    return bytes(png)


def test_gray8_all_filters():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(5, 11), dtype=np.uint8)
    png = encode_png(img, color=0, filters=[0, 1, 2, 3, 4])
    got = decode_png(png)
    assert got.dtype == np.uint8 and got.shape == (5, 11)
    np.testing.assert_array_equal(got, img)


def test_rgb8_all_filters():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, size=(6, 7, 3), dtype=np.uint8)
    png = encode_png(img, color=2, filters=[4, 3, 2, 1, 0, 4])
    np.testing.assert_array_equal(decode_png(png), img)


def test_rgba8_and_gray_alpha():
    rng = np.random.default_rng(5)
    rgba = rng.integers(0, 256, size=(4, 5, 4), dtype=np.uint8)
    np.testing.assert_array_equal(
        decode_png(encode_png(rgba, color=6, filters=[1, 4, 2, 3])), rgba)
    ga = rng.integers(0, 256, size=(3, 8, 2), dtype=np.uint8)
    np.testing.assert_array_equal(
        decode_png(encode_png(ga, color=4, filters=[4, 4, 4])), ga)


def test_palette():
    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 8, 7]],
                       np.uint8)
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0]], np.uint8)
    png = encode_png(idx, color=3, filters=[0, 1], palette=palette)
    np.testing.assert_array_equal(decode_png(png), palette[idx])


def test_depth16():
    rng = np.random.default_rng(6)
    img = rng.integers(0, 65536, size=(3, 4), dtype=np.uint16)
    got = decode_png(encode_png(img, color=0, depth=16, filters=[0, 2, 1]))
    assert got.dtype == np.uint16
    np.testing.assert_array_equal(got, img)


def test_subbyte_depths():
    img1 = np.array([[0, 1, 1, 0, 1, 0, 1, 1, 0],
                     [1, 0, 0, 1, 0, 1, 0, 0, 1]], np.uint8)
    got = decode_png(encode_png(img1, color=0, depth=1))
    np.testing.assert_array_equal(got, img1 * 255)
    img2 = np.array([[0, 1, 2, 3, 2], [3, 3, 0, 1, 2]], np.uint8)
    got2 = decode_png(encode_png(img2, color=0, depth=2))
    np.testing.assert_array_equal(got2, img2 * 85)
    img4 = np.arange(16, dtype=np.uint8).reshape(2, 8)
    got4 = decode_png(encode_png(img4, color=0, depth=4))
    np.testing.assert_array_equal(got4, img4 * 17)


def test_png_to_gray_luma():
    rgb = np.zeros((1, 3, 3), np.uint8)
    rgb[0, 0] = [255, 0, 0]
    rgb[0, 1] = [0, 255, 0]
    rgb[0, 2] = [0, 0, 255]
    g = png_to_gray(rgb)
    assert g.tolist() == [[(77 * 255) >> 8, (150 * 255) >> 8, (29 * 255) >> 8]]


def test_bad_inputs():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    img = np.zeros((2, 2), np.uint8)
    png = bytearray(encode_png(img, color=0))
    png[28] = 2  # interlace byte in IHDR: 2 is not a defined method
    # CRC is not rechecked; an unknown interlace method must be rejected
    with pytest.raises(ValueError):
        decode_png(bytes(png))
    png[28] = 1  # valid Adam7 flag over a non-interlaced payload:
    with pytest.raises(ValueError):  # pass byte counts disagree
        decode_png(bytes(png))


def test_feature_path_decodes_png(spark):
    """decode_features must produce REAL features from PNG payloads —
    identical to the features of the same pixels shipped raw."""
    from ohsome_planet_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_features,
    )

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(12, 16), dtype=np.uint8)
    png = encode_png(img, color=0, filters=[4] * 12)
    rows = [
        (1, "image", "png", bytearray(png),
         {"width": 16, "height": 12, "sample_rate": None, "duration_ms": None}),
        (2, "image", "raw", bytearray(img.tobytes()),
         {"width": 16, "height": 12, "sample_rate": None, "duration_ms": None}),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in decode_features(media).collect()}
    assert out[1]["decoded"] and out[2]["decoded"]
    assert out[1]["features"] == out[2]["features"]
    with pytest.raises(Exception):
        # jpeg stays a documented swap point
        bad = [(3, "image", "jpeg", bytearray(b"xx"),
                {"width": 1, "height": 1, "sample_rate": None, "duration_ms": None})]
        decode_features(spark.createDataFrame(bad, MEDIA_SCHEMA)).collect()


# --- Adam7 interlace ---------------------------------------------------------

_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def encode_png_adam7(pixels: np.ndarray, color: int, depth: int = 8,
                     palette: np.ndarray | None = None) -> bytes:
    """Adam7-interlaced twin of encode_png: each pass sub-image is filtered
    as its own image (filter type cycles 0..4 per scanline for coverage)."""
    if pixels.ndim == 2:
        h, w = pixels.shape
        flat = pixels[:, :, None]
    else:
        h, w, _ch = pixels.shape
        flat = pixels
    ch = flat.shape[2]
    bits_per_px = depth * ch
    bpp = max(1, bits_per_px // 8)
    raw = bytearray()
    fi = 0
    for xs, ys, xstep, ystep in _ADAM7:
        sub = flat[ys::ystep, xs::xstep, :]
        ph, pw = sub.shape[0], sub.shape[1]
        if ph == 0 or pw == 0:
            continue
        stride = (pw * bits_per_px + 7) // 8
        prev = np.zeros(stride, np.int32)
        for y in range(ph):
            if depth == 8:
                line = sub[y].reshape(-1).astype(np.int32)
            elif depth == 16:
                v = sub[y].reshape(-1).astype(np.uint16)
                line = np.empty(v.size * 2, np.int32)
                line[0::2] = v >> 8
                line[1::2] = v & 0xFF
            else:
                v = sub[y].reshape(-1).astype(np.uint8)
                bits = ((v[:, None]
                         >> np.arange(depth - 1, -1, -1)) & 1).ravel()
                bits = np.pad(bits, (0, stride * 8 - bits.size))
                line = np.packbits(bits).astype(np.int32)
            f = fi % 5
            fi += 1
            out = np.empty(stride, np.int32)
            for x in range(stride):
                left = line[x - bpp] if x >= bpp else 0
                up = prev[x]
                ul = prev[x - bpp] if x >= bpp else 0
                if f == 0:
                    out[x] = line[x]
                elif f == 1:
                    out[x] = line[x] - left
                elif f == 2:
                    out[x] = line[x] - up
                elif f == 3:
                    out[x] = line[x] - ((left + up) >> 1)
                else:
                    pa = abs(up - ul)
                    pb = abs(left - ul)
                    pc = abs(left + up - 2 * ul)
                    pr = (left if (pa <= pb and pa <= pc)
                          else (up if pb <= pc else ul))
                    out[x] = line[x] - pr
            raw.append(f)
            raw.extend((out & 0xFF).astype(np.uint8).tobytes())
            prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 1)
    png = bytearray(b"\x89PNG\r\n\x1a\n")
    png += _chunk(b"IHDR", ihdr)
    if palette is not None:
        png += _chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    png += _chunk(b"IDAT", zlib.compress(bytes(raw)))
    png += _chunk(b"IEND", b"")
    return bytes(png)


def test_adam7_matches_noninterlaced_gray_rgb_rgba():
    rng = np.random.default_rng(7)
    for color, shape in ((0, (13, 11)), (2, (13, 11, 3)), (6, (9, 17, 4))):
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        plain = decode_png(encode_png(img, color=color,
                                      filters=[i % 5 for i in range(shape[0])]))
        inter = decode_png(encode_png_adam7(img, color=color))
        np.testing.assert_array_equal(plain, inter)
        np.testing.assert_array_equal(inter, img)


def test_adam7_depth16_palette_and_subbyte():
    rng = np.random.default_rng(11)
    img16 = rng.integers(0, 65536, size=(10, 9), dtype=np.uint16)
    np.testing.assert_array_equal(
        decode_png(encode_png_adam7(img16, color=0, depth=16)), img16)

    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(12, 7)).astype(np.uint8)
    np.testing.assert_array_equal(
        decode_png(encode_png_adam7(idx, color=3, depth=8, palette=pal)),
        pal[idx.astype(np.int64)])

    img2 = rng.integers(0, 4, size=(11, 13), dtype=np.uint8)
    plain = decode_png(encode_png(img2, color=0, depth=2,
                                  filters=[0] * 11))
    inter = decode_png(encode_png_adam7(img2, color=0, depth=2))
    np.testing.assert_array_equal(plain, inter)


def test_adam7_tiny_images_skip_empty_passes():
    rng = np.random.default_rng(13)
    for shape in ((1, 1), (3, 2), (2, 3), (7, 5), (8, 8), (1, 9)):
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        np.testing.assert_array_equal(
            decode_png(encode_png_adam7(img, color=0)), img)


def test_adam7_payload_mismatch_raises():
    img = np.zeros((9, 9), np.uint8)
    png = bytearray(encode_png_adam7(img, color=0))
    # corrupt: re-declare as 10 rows tall -> pass byte counts disagree
    png[16:24] = struct.pack(">II", 9, 10)
    with pytest.raises(ValueError):
        decode_png(bytes(png))
