"""Closed-form goldens for the pure-Python/NumPy GIF decoder.

A minimal in-test encoder (real LZW compressor with dictionary growth,
variable code width, and explicit clear codes) produces known-pixel GIFs;
decode_gif must return the exact composited frames. Covers: LZW dictionary
growth across code widths, the KwKwK case, interlacing, local color
tables, transparency, all three meaningful disposal methods, multi-frame
compositing at offsets, and the mapInPandas feature path end to end.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from ohsome_planet_spark.operators.gif import decode_gif, gif_to_gray


# ---------------------------------------------------------------------------
# in-test encoder
# ---------------------------------------------------------------------------


def _lzw_encode(indices: list[int], mcs: int) -> bytes:
    """Real GIF LZW: emits clear first, grows the dict to 4095 then emits a
    clear code, variable code width (grows when the next assignable code
    would not fit the current width)."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    out_bits: list[tuple[int, int]] = []  # (code, width)
    width = mcs + 1

    def emit(code: int) -> None:
        out_bits.append((code, width))

    table = {(i,): i for i in range(clear)}
    next_code = end + 1
    emit(clear)
    run: tuple[int, ...] = ()
    for px in indices:
        cand = run + (px,)
        if cand in table:
            run = cand
            continue
        emit(table[run])
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            if next_code > (1 << width) and width < 12:
                width += 1
        else:
            emit(clear)
            table = {(i,): i for i in range(clear)}
            next_code = end + 1
            width = mcs + 1
        run = (px,)
    if run:
        emit(table[run])
    emit(end)
    # pack LSB-first
    acc = n = 0
    data = bytearray()
    for code, w in out_bits:
        acc |= code << n
        n += w
        while n >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            n -= 8
    if n:
        data.append(acc & 0xFF)
    return bytes(data)


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _interlace_rows(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        order.extend(range(start, h, step))
    return rows[order]


def encode_gif(
    frames,  # list of dicts: pixels (h,w int idx), left, top, lct, gce...
    screen: tuple[int, int],
    gct: np.ndarray | None,
    bg_index: int = 0,
) -> bytes:
    out = bytearray(b"GIF89a")
    sw, sh = screen
    packed = 0
    if gct is not None:
        n_bits = max(1, int(np.ceil(np.log2(len(gct)))))
        packed = 0x80 | (n_bits - 1)
    out += struct.pack("<HH", sw, sh)
    out += bytes([packed, bg_index, 0])
    if gct is not None:
        full = np.zeros((2 << (packed & 7), 3), np.uint8)
        full[: len(gct)] = gct
        out += full.tobytes()
    for f in frames:
        if "disposal" in f or "transparent" in f:
            flags = (f.get("disposal", 0) & 7) << 2
            tr = f.get("transparent")
            if tr is not None:
                flags |= 1
            out += bytes([0x21, 0xF9, 4, flags, 0, 0, tr or 0, 0])
        px = np.asarray(f["pixels"], np.uint8)
        h, w = px.shape
        ipacked = 0
        if f.get("interlace"):
            ipacked |= 0x40
            px = _interlace_rows(px)
        lct = f.get("lct")
        if lct is not None:
            n_bits = max(1, int(np.ceil(np.log2(len(lct)))))
            ipacked |= 0x80 | (n_bits - 1)
        out += bytes([0x2C]) + struct.pack(
            "<HHHH", f.get("left", 0), f.get("top", 0), w, h) + bytes([ipacked])
        if lct is not None:
            full = np.zeros((2 << (n_bits - 1), 3), np.uint8)
            full[: len(lct)] = lct
            out += full.tobytes()
        table = lct if lct is not None else gct
        mcs = max(2, int(np.ceil(np.log2(max(2, len(table))))))
        out += bytes([mcs])
        out += _sub_blocks(_lzw_encode([int(x) for x in px.reshape(-1)], mcs))
    out.append(0x3B)
    return bytes(out)


# ---------------------------------------------------------------------------
# goldens
# ---------------------------------------------------------------------------

PALETTE4 = np.array(
    [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)


def test_single_frame_roundtrip():
    rng = np.random.default_rng(5)
    px = rng.integers(0, 4, (11, 7), np.uint8)
    gif = encode_gif([{"pixels": px}], (7, 11), PALETTE4)
    frames = decode_gif(gif)
    assert frames.shape == (1, 11, 7, 3)
    np.testing.assert_array_equal(frames[0], PALETTE4[px])


def test_lzw_dictionary_growth_and_width_changes():
    """A big 256-color frame forces codes through every width 9..12 and a
    mid-stream dictionary reset."""
    rng = np.random.default_rng(11)
    pal = rng.integers(0, 256, (256, 3), np.uint8)
    px = rng.integers(0, 256, (64, 64), np.uint8)
    gif = encode_gif([{"pixels": px}], (64, 64), pal)
    np.testing.assert_array_equal(decode_gif(gif)[0], pal[px])


def test_kwkwk_case():
    """aaaa... emits the code-just-assigned pattern (KwKwK)."""
    px = np.zeros((1, 12), np.uint8)
    gif = encode_gif([{"pixels": px}], (12, 1), PALETTE4)
    np.testing.assert_array_equal(decode_gif(gif)[0], PALETTE4[px])


def test_interlaced_frame():
    rng = np.random.default_rng(7)
    px = rng.integers(0, 4, (13, 5), np.uint8)  # h not divisible by 8
    gif = encode_gif([{"pixels": px, "interlace": True}], (5, 13), PALETTE4)
    np.testing.assert_array_equal(decode_gif(gif)[0], PALETTE4[px])


def test_local_color_table_overrides_global():
    lct = np.array([[9, 9, 9], [200, 100, 50]], np.uint8)
    px = np.array([[0, 1], [1, 0]], np.uint8)
    gif = encode_gif([{"pixels": px, "lct": lct}], (2, 2), PALETTE4)
    np.testing.assert_array_equal(decode_gif(gif)[0], lct[px])


def test_transparency_keeps_canvas():
    """Frame 2's transparent pixels must show frame 1's colors."""
    base = np.full((4, 4), 1, np.uint8)
    over = np.array([[2, 3], [3, 3]], np.uint8)  # idx 3 transparent
    gif = encode_gif(
        [{"pixels": base},
         {"pixels": over, "left": 1, "top": 1, "transparent": 3}],
        (4, 4), PALETTE4)
    frames = decode_gif(gif)
    assert frames.shape[0] == 2
    want = PALETTE4[base].copy()
    want[1, 1] = PALETTE4[2]  # only the single opaque pixel lands
    np.testing.assert_array_equal(frames[1], want)


def test_disposal_background_and_previous():
    """disposal=2 clears the frame rect to background before the NEXT
    frame; disposal=3 restores the pre-frame canvas."""
    f1 = np.full((4, 4), 1, np.uint8)
    f2 = np.full((2, 2), 2, np.uint8)
    f3 = np.full((1, 1), 3, np.uint8)
    gif = encode_gif(
        [{"pixels": f1},
         {"pixels": f2, "left": 1, "top": 1, "disposal": 2},
         {"pixels": f3, "left": 0, "top": 0, "disposal": 3},
         {"pixels": f3, "left": 3, "top": 3}],
        (4, 4), PALETTE4, bg_index=0)
    frames = decode_gif(gif)
    assert frames.shape[0] == 4
    # frame 3 renders over: f1 with the f2 rect restored to bg color
    want3 = PALETTE4[f1].copy()
    want3[1:3, 1:3] = PALETTE4[0]
    want3[0, 0] = PALETTE4[3]
    np.testing.assert_array_equal(frames[2], want3)
    # frame 4: disposal=3 restored the canvas from before frame 3
    want4 = PALETTE4[f1].copy()
    want4[1:3, 1:3] = PALETTE4[0]
    want4[3, 3] = PALETTE4[3]
    np.testing.assert_array_equal(frames[3], want4)


def test_gray_weights_match_png():
    from ohsome_planet_spark.operators.multimodal import png_to_gray

    px = np.array([[1, 2, 3]], np.uint8)
    g = gif_to_gray(decode_gif(encode_gif([{"pixels": px}], (3, 1), PALETTE4)))
    np.testing.assert_array_equal(g, png_to_gray(PALETTE4[px]))


def test_malformed_inputs_raise():
    good = encode_gif([{"pixels": np.zeros((2, 2), np.uint8)}], (2, 2), PALETTE4)
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"NOTAGIF" + good[6:])
    with pytest.raises(ValueError, match="truncated|ran out"):
        decode_gif(good[:-8])
    # pixel index outside the (truncated-to-2-entry) color table
    small = np.array([[0, 0], [0, 0]], np.uint8)
    bad = encode_gif([{"pixels": small,
                       "lct": np.zeros((2, 3), np.uint8)}], (2, 2), None)
    assert decode_gif(bad).shape == (1, 2, 2, 3)  # control: valid stream


def test_feature_path_decodes_gif(spark):
    """decode_features must produce REAL features from GIF payloads —
    kind='image', format='gif' dispatches through operators/gif.py."""
    from ohsome_planet_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_features,
        image_features,
    )

    rng = np.random.default_rng(3)
    px = rng.integers(0, 4, (9, 9), np.uint8)
    payload = encode_gif([{"pixels": px}], (9, 9), PALETTE4)
    rows = [(1, "image", "gif", bytearray(payload),
             {"width": 9, "height": 9, "sample_rate": None,
              "duration_ms": None})]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = decode_features(media).collect()
    assert len(out) == 1 and out[0]["decoded"]
    want = image_features(gif_to_gray(decode_gif(payload)))
    np.testing.assert_allclose(out[0]["features"], want)


def test_disposal_background_with_transparency_restores_black():
    """r7 (r6 advice, low): with a transparent index in force, disposal=2
    restores the rect to TRANSPARENT (composited black), not the global
    background palette color."""
    f1 = np.full((4, 4), 1, np.uint8)
    f2 = np.full((2, 2), 2, np.uint8)
    f3 = np.full((1, 1), 3, np.uint8)
    gif = encode_gif(
        [{"pixels": f1},
         # transparent index 0 set (no pixel uses it — only the flag
         # matters for the disposal fill), disposal=2
         {"pixels": f2, "left": 1, "top": 1, "disposal": 2,
          "transparent": 0},
         {"pixels": f3, "left": 0, "top": 0}],
        (4, 4), PALETTE4, bg_index=1)
    frames = decode_gif(gif)
    assert frames.shape[0] == 3
    want3 = PALETTE4[f1].copy()
    want3[1:3, 1:3] = 0  # black, NOT PALETTE4[1]
    want3[0, 0] = PALETTE4[3]
    np.testing.assert_array_equal(frames[2], want3)
