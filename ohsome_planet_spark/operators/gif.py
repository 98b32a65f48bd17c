"""GIF decoder (GIF87a/GIF89a) — pure Python/NumPy from the public spec.

Closes the last common web-crawl IMAGE format next to png/jpeg (reference
parity note: the reference ships no media decoding at all — this layer
exists for the training-data pipeline, SURVEY §6): variable-width LZW,
interlacing, local/global color tables, multi-frame animation with the
four GIF89a disposal methods, and transparency compositing.

Scope and guards mirror operators/jpeg.py: the common baseline of the
format is decoded for real; malformed streams raise ValueError with the
offending offset rather than guessing.
"""

from __future__ import annotations

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


class _Reader:
    __slots__ = ("b", "i")

    def __init__(self, b: bytes):
        self.b = b
        self.i = 0

    def take(self, n: int) -> bytes:
        if self.i + n > len(self.b):
            raise ValueError(f"gif: truncated at offset {self.i}")
        out = self.b[self.i:self.i + n]
        self.i += n
        return out

    def u8(self) -> int:
        return self.take(1)[0]

    def u16(self) -> int:
        lo, hi = self.take(2)
        return lo | (hi << 8)

    def sub_blocks(self) -> bytes:
        """Concatenate a data-sub-block sequence up to its 0x00 terminator."""
        parts = []
        while True:
            n = self.u8()
            if n == 0:
                return b"".join(parts)
            parts.append(self.take(n))


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF-variant LZW: clear = 2^mcs, end = clear+1; code width starts at
    mcs+1 bits and grows when the next assignable code would not fit,
    capped at 12 bits (4095). Deferred-clear streams (dictionary full,
    encoder keeps emitting 12-bit codes) are legal and handled."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"gif: bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1

    # bit reader: LSB-first across the concatenated sub-block bytes
    bits = 0
    n_bits = 0
    pos = 0
    out = np.empty(n_pixels, np.uint8)
    n_out = 0

    def reset_dict():
        # dict entries are byte strings; roots are single indices
        d = [bytes((i,)) for i in range(clear)] + [b"", b""]
        return d, min_code_size + 1

    table, width = reset_dict()
    prev: bytes | None = None
    while n_out < n_pixels:
        while n_bits < width:
            if pos >= len(data):
                raise ValueError("gif: LZW stream ran out before image end")
            bits |= data[pos] << n_bits
            pos += 1
            n_bits += 8
        code = bits & ((1 << width) - 1)
        bits >>= width
        n_bits -= width
        if code == clear:
            table, width = reset_dict()
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError(f"gif: first code {code} out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]  # the KwKwK case
            table.append(entry)
        else:
            raise ValueError(f"gif: LZW code {code} out of range")
        take = min(len(entry), n_pixels - n_out)
        out[n_out:n_out + take] = np.frombuffer(entry[:take], np.uint8)
        n_out += take
        prev = entry
        if len(table) >= (1 << width) and width < 12:
            width += 1
    if n_out < n_pixels:
        raise ValueError(f"gif: decoded {n_out}/{n_pixels} pixels")
    return out


def _deinterlace(idx: np.ndarray, w: int, h: int) -> np.ndarray:
    rows = idx.reshape(h, w)
    out = np.empty_like(rows)
    src = 0
    for start, step in _INTERLACE_PASSES:
        n = len(range(start, h, step))
        out[start:h:step] = rows[src:src + n]
        src += n
    return out.reshape(-1)


def decode_gif(content: bytes, meta=None) -> np.ndarray:
    """Decode all frames to a composited (n_frames, height, width, 3)
    uint8 RGB array at logical-screen size, applying GIF89a disposal:
    0/1 leave, 2 restore background (transparent background ⇒ black),
    3 restore previous canvas. Transparent pixels keep the canvas."""
    r = _Reader(content)
    sig = r.take(6)
    if sig not in (b"GIF87a", b"GIF89a"):
        raise ValueError(f"gif: bad signature {sig!r}")
    sw, sh = r.u16(), r.u16()
    packed = r.u8()
    bg_index = r.u8()
    r.u8()  # pixel aspect ratio (ignored)
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(r.take(3 * n), np.uint8).reshape(n, 3)

    canvas = np.zeros((sh, sw, 3), np.uint8)
    if gct is not None and bg_index < len(gct):
        canvas[:] = gct[bg_index]
    bg_fill = canvas[0, 0].copy() if gct is not None else np.zeros(3, np.uint8)

    frames = []
    transparent: int | None = None
    disposal = 0
    while True:
        block = r.u8()
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = r.u8()
            payload = r.sub_blocks()
            if label == 0xF9:  # graphic control
                if len(payload) < 4:
                    raise ValueError("gif: short graphic control extension")
                disposal = (payload[0] >> 2) & 0x07
                transparent = payload[3] if payload[0] & 0x01 else None
            # 0xFE comment / 0xFF application (NETSCAPE loop) etc: skipped
            continue
        if block != 0x2C:
            raise ValueError(f"gif: unknown block 0x{block:02x} at {r.i - 1}")
        left, top, w, h = r.u16(), r.u16(), r.u16(), r.u16()
        ipacked = r.u8()
        lct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            lct = np.frombuffer(r.take(3 * n), np.uint8).reshape(n, 3)
        if lct is None:
            raise ValueError("gif: image with neither local nor global color table")
        if left + w > sw or top + h > sh:
            raise ValueError("gif: frame rect outside logical screen")
        mcs = r.u8()
        idx = _lzw_decode(r.sub_blocks(), mcs, w * h)
        if ipacked & 0x40:
            idx = _deinterlace(idx, w, h)
        if idx.max(initial=0) >= len(lct):
            raise ValueError("gif: pixel index outside color table")
        rect = idx.reshape(h, w)
        prev_canvas = canvas.copy() if disposal == 3 else None
        region = canvas[top:top + h, left:left + w]
        if transparent is None:
            region[:] = lct[rect]
        else:
            opaque = rect != transparent
            region[opaque] = lct[rect[opaque]]
        frames.append(canvas.copy())
        if disposal == 2:
            # GIF89a: with a transparent index in force the "background"
            # to restore is transparent — composited here as black —
            # not the palette color (r6 advice, low: the docstring
            # promised this but bg_fill was used unconditionally)
            fill = (np.zeros(3, np.uint8) if transparent is not None
                    else bg_fill)
            canvas[top:top + h, left:left + w] = fill
        elif disposal == 3:
            canvas = prev_canvas
        disposal = 0
        transparent = None
    if not frames:
        raise ValueError("gif: no image data blocks")
    return np.stack(frames)


def gif_to_gray(frames: np.ndarray) -> np.ndarray:
    """FIRST frame → (h, w) uint8 grayscale, the same integer BT.601-ish
    luma as png_to_gray/jpeg_to_gray so the feature kernel sees one
    convention across image formats."""
    r, g, b = (frames[0][:, :, i].astype(np.uint32) for i in range(3))
    return ((77 * r + 150 * g + 29 * b) >> 8).astype(np.uint8)
