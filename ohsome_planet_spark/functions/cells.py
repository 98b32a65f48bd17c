"""Spatial cell indexes: XZ2, ZXY quadkey, S2, and an H3-compatible hex grid.

All kernels are vectorized NumPy over coordinate arrays — zero per-row
Python — intended to run inside Arrow-batched pandas UDFs.

Parity notes (semantics only, no code taken):
- XZ2 reproduces the arithmetic of the reference's port of Böhm et al. 1999
  "XZ-Ordering" (`/root/reference/ohsome-contributions/src/main/java/org/heigit/
  ohsome/contributions/util/XZCode.java:30-88`, g=16): normalization by /360 on
  both axes, l1 = floor(log(maxExtent)/log(0.5)), the +1-level predicate, and
  code = Σ (q_i * nElem_i + 1).
- ZXY is a plain equirectangular quadtree key (z, ix, iy) packed into one
  int64 — used where the correctness oracle needs a SQL-expressible cell.
- S2 implements the published S2-geometry leaf-cell algorithm (cube faces,
  quadratic st↔uv, Hilbert curve via 4-bit lookup tables). Analog of the
  reference's space-filling-curve cell column (`contrib.avsc` xzcode struct).
- hex_cell is the H3 stand-in: this container has no `h3` wheel, so we bin
  into a true hexagonal lattice (pointy-top axial coords, cube rounding) whose
  per-resolution cell area tracks H3 res 7–10; if the real `h3` package is
  importable at runtime it is used instead (same column contract: int64).

  Why this is NOT a from-scratch real-H3 port (investigated round 4): the
  H3 *algorithm* (icosahedral gnomonic projection, aperture-7 IJK
  hierarchy, Class II/III alternation) is published and implementable, but
  emitting bit-identical H3 ids additionally requires two pure-DATA
  conventions — the 122-base-cell numbering (`baseCellData`) and the
  540-entry face→IJK→base-cell assignment (`faceIjkBaseCells`). Those
  tables are an arbitrary labeling choice, not derivable from the
  algorithm (the numbering is not, e.g., strict latitude order — the
  pentagon ranks refute that), and this sandbox has no copy of them (no
  wheel, no jar, no extension) and no way to verify a reconstruction
  beyond two memorized doc vectors covering a single icosahedron face.
  A guessed table would silently mis-index most of the globe while
  claiming H3 compatibility — strictly worse than the honest engine-local
  lattice. The auto-upgrade path (`HAVE_H3`) plus the gated contract test
  (tests/test_cells.py `test_hex_cell_real_h3_upgrade`) remain the
  correct integration: one `pip install h3` on a real cluster turns the
  column into real H3 ids with no code change.
  Environment re-verified round 6 (2026-08-18): still no `h3` module,
  wheel, jar, or extension anywhere in the container — gate unchanged.
"""

from __future__ import annotations

import math

import numpy as np

# ---------------------------------------------------------------------------
# XZ2 (Böhm et al. 1999) — exact arithmetic parity with the reference's g=16
# ---------------------------------------------------------------------------

_LOG_HALF = math.log(0.5)


def _xz2_n_elem(g: int) -> np.ndarray:
    gi = g - np.arange(g, dtype=np.float64)
    return ((4.0**gi - 1.0) / 3.0).astype(np.int64)


def xz2_code(
    xmin: np.ndarray,
    ymin: np.ndarray,
    xmax: np.ndarray,
    ymax: np.ndarray,
    g: int = 16,
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized XZ2 (level, code) for WGS84 bboxes.

    Returns (level:int32, code:int64). For degenerate (point) boxes the
    extent is 0 ⇒ level = g. Invalid boxes are the caller's concern (the
    reference emits level=-1, code=0 for invalid geometries —
    `ContributionsAvroConverter.java:127`); see xz2_code_or_invalid.
    """
    xmin = (180.0 + np.asarray(xmin, dtype=np.float64)) / 360.0
    ymin = (90.0 + np.asarray(ymin, dtype=np.float64)) / 360.0
    xmax = (180.0 + np.asarray(xmax, dtype=np.float64)) / 360.0
    ymax = (90.0 + np.asarray(ymax, dtype=np.float64)) / 360.0

    extent = np.maximum(xmax - xmin, ymax - ymin)
    with np.errstate(divide="ignore"):
        l1 = np.floor(np.log(extent) / _LOG_HALF)
    # extent == 0 → log=-inf → l1=+inf → clipped to g below
    l1 = np.where(np.isfinite(l1), l1, float(g)).astype(np.int64)

    length = np.full(l1.shape, g, dtype=np.int64)
    small = l1 < g
    cand = np.minimum(l1 + 1, g)
    w2 = np.power(0.5, cand.astype(np.float64))
    fits_x = xmax <= (np.floor(xmin / w2) * w2 + 2 * w2)
    fits_y = ymax <= (np.floor(ymin / w2) * w2 + 2 * w2)
    length = np.where(small, np.where(fits_x & fits_y, cand, l1), length)

    n_elem = _xz2_n_elem(g)
    code = np.zeros(xmin.shape, dtype=np.int64)
    cx_min = np.zeros_like(xmin)
    cx_max = np.ones_like(xmin)
    cy_min = np.zeros_like(ymin)
    cy_max = np.ones_like(ymin)
    for i in range(g):
        active = i < length
        xc = cx_min + (cx_max - cx_min) / 2
        yc = cy_min + (cy_max - cy_min) / 2
        right = xmin >= xc
        top = ymin >= yc
        q = right.astype(np.int64) + 2 * top.astype(np.int64)
        code = np.where(active, code + q * n_elem[i] + 1, code)
        cx_min = np.where(right, xc, cx_min)
        cx_max = np.where(right, cx_max, xc)
        cy_min = np.where(top, yc, cy_min)
        cy_max = np.where(top, cy_max, yc)
    return length.astype(np.int32), code


def xz2_point(lon: np.ndarray, lat: np.ndarray, g: int = 16) -> np.ndarray:
    """XZ2 code of a point (level is always g for zero-extent boxes)."""
    _, code = xz2_code(lon, lat, lon, lat, g=g)
    return code


# ---------------------------------------------------------------------------
# ZXY quadtree key (equirectangular) — SQL-expressible cell for oracles
# ---------------------------------------------------------------------------


def zxy_cell(lon: np.ndarray, lat: np.ndarray, z: int) -> np.ndarray:
    """Pack (z, ix, iy) into one int64: (z<<58) | (ix<<29) | iy.

    ix = floor((lon+180)/360 * 2^z) clamped to [0, 2^z-1]; iy likewise from
    (90-lat)/180. Supports z ≤ 28.
    """
    n = np.int64(1) << z
    ix = np.floor((np.asarray(lon, np.float64) + 180.0) / 360.0 * n).astype(np.int64)
    iy = np.floor((90.0 - np.asarray(lat, np.float64)) / 180.0 * n).astype(np.int64)
    ix = np.clip(ix, 0, n - 1)
    iy = np.clip(iy, 0, n - 1)
    return (np.int64(z) << 58) | (ix << 29) | iy


def zxy_decode(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    cell = np.asarray(cell, dtype=np.int64)
    z = (cell >> 58) & 0x3F
    ix = (cell >> 29) & ((1 << 29) - 1)
    iy = cell & ((1 << 29) - 1)
    return z.astype(np.int32), ix, iy


def zxy_cell_bounds(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(lon_min, lat_min, lon_max, lat_max) of a zxy cell."""
    z, ix, iy = zxy_decode(cell)
    n = (np.int64(1) << z).astype(np.float64)
    lon_min = ix / n * 360.0 - 180.0
    lon_max = (ix + 1) / n * 360.0 - 180.0
    lat_max = 90.0 - iy / n * 180.0
    lat_min = 90.0 - (iy + 1) / n * 180.0
    return lon_min, lat_min, lon_max, lat_max


def zxy_parent(cell: np.ndarray, parent_z: int) -> np.ndarray:
    z, ix, iy = zxy_decode(np.asarray(cell, np.int64))
    shift = (z - parent_z).astype(np.int64)
    return (np.int64(parent_z) << 58) | ((ix >> shift) << 29) | (iy >> shift)


def zxy_neighbors(cell: int) -> list[int]:
    """The ≤8 surrounding cells at the same zoom (edges clamped)."""
    z, ix, iy = zxy_decode(np.asarray([cell], np.int64))
    z, ix, iy = int(z[0]), int(ix[0]), int(iy[0])
    n = 1 << z
    out = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            jx, jy = ix + dx, iy + dy
            if 0 <= jy < n:
                jx %= n  # wrap longitude
                out.append((z << 58) | (jx << 29) | jy)
    return out


# ---------------------------------------------------------------------------
# S2 cell ids — published S2-geometry algorithm, pure NumPy
# ---------------------------------------------------------------------------

_LOOKUP_BITS = 4
_SWAP = 0x1
_INVERT = 0x2
_POS_TO_IJ = ((0, 1, 3, 2), (0, 2, 3, 1), (3, 2, 0, 1), (3, 1, 0, 2))
_POS_TO_ORIENT = (_SWAP, 0, 0, _INVERT | _SWAP)

_LOOKUP_POS = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.uint64)


def _init_lookup(level: int, i: int, j: int, orig: int, pos: int, orient: int) -> None:
    if level == _LOOKUP_BITS:
        ij = (i << _LOOKUP_BITS) + j
        _LOOKUP_POS[(ij << 2) + orig] = (pos << 2) + orient
        return
    level += 1
    i <<= 1
    j <<= 1
    pos <<= 2
    r = _POS_TO_IJ[orient]
    for idx in range(4):
        ij = r[idx]
        _init_lookup(
            level, i + (ij >> 1), j + (ij & 1), orig, pos + idx, orient ^ _POS_TO_ORIENT[idx]
        )


for _o in range(4):
    _init_lookup(0, 0, 0, _o, 0, _o)

_MAX_LEVEL = 30
_MAX_SIZE = 1 << _MAX_LEVEL


def _xyz_to_face_uv(x: np.ndarray, y: np.ndarray, z: np.ndarray):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    major = np.choose(face, [x, y, z])
    face = np.where(major < 0, face + 3, face).astype(np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
            [y / x, -x / y, -x / z, z / x, z / y, -y / z],
        )
        v = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
            [z / x, z / y, -y / z, y / x, -x / y, -x / z],
        )
    return face, u, v


def _uv_to_st(u: np.ndarray) -> np.ndarray:
    # S2_QUADRATIC_PROJECTION (np.where evaluates both branches: silence the
    # sqrt-of-negative in the untaken branch)
    with np.errstate(invalid="ignore"):
        return np.where(
            u >= 0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u)
        )


def s2_cell_id(lat: np.ndarray, lon: np.ndarray, level: int = 12) -> np.ndarray:
    """S2 cell id (as signed int64 bit pattern) at the given level.

    Cube-face projection + quadratic st transform + Hilbert curve position,
    per the public S2 geometry library design. Plays the role of the
    reference's space-filling-curve column (XZ2 — `util/XZCode.java`) for the
    graft's S2 requirement.
    """
    phi = np.radians(np.asarray(lat, np.float64))
    theta = np.radians(np.asarray(lon, np.float64))
    cosphi = np.cos(phi)
    x = cosphi * np.cos(theta)
    y = cosphi * np.sin(theta)
    z = np.sin(phi)
    face, u, v = _xyz_to_face_uv(x, y, z)
    si = np.clip((_uv_to_st(u) * _MAX_SIZE).astype(np.int64), 0, _MAX_SIZE - 1)
    ti = np.clip((_uv_to_st(v) * _MAX_SIZE).astype(np.int64), 0, _MAX_SIZE - 1)

    i = si.astype(np.uint64)
    j = ti.astype(np.uint64)
    n = face.astype(np.uint64) << np.uint64(60)
    bits = (face & _SWAP).astype(np.uint64)
    mask = np.uint64((1 << _LOOKUP_BITS) - 1)
    for k in range(7, -1, -1):
        kk = np.uint64(k * _LOOKUP_BITS)
        bits += ((i >> kk) & mask) << np.uint64(_LOOKUP_BITS + 2)
        bits += ((j >> kk) & mask) << np.uint64(2)
        bits = _LOOKUP_POS[bits.astype(np.int64)]
        n |= (bits >> np.uint64(2)) << np.uint64(k * 2 * _LOOKUP_BITS)
        bits &= np.uint64(_SWAP | _INVERT)
    leaf = n * np.uint64(2) + np.uint64(1)
    if level >= _MAX_LEVEL:
        return leaf.view(np.int64)
    lsb = np.uint64(1) << np.uint64(2 * (_MAX_LEVEL - level))
    parent = (leaf & ~(np.uint64(2) * lsb - np.uint64(1))) | lsb
    return parent.view(np.int64)


def s2_parent(cell: np.ndarray, level: int) -> np.ndarray:
    c = np.asarray(cell).view(np.uint64) if np.asarray(cell).dtype == np.int64 else np.asarray(cell, np.uint64)
    lsb = np.uint64(1) << np.uint64(2 * (_MAX_LEVEL - level))
    return ((c & ~(np.uint64(2) * lsb - np.uint64(1))) | lsb).view(np.int64)


def s2_level(cell: np.ndarray) -> np.ndarray:
    c = np.asarray(cell).view(np.uint64)
    lsb = c & (~c + np.uint64(1))
    lvl = _MAX_LEVEL - (np.log2(lsb.astype(np.float64)) / 2).astype(np.int64)
    return lvl.astype(np.int32)


# ---------------------------------------------------------------------------
# H3-compatible hex cells
# ---------------------------------------------------------------------------

try:  # real H3 if the deployment environment ships it
    import h3 as _h3  # pragma: no cover

    HAVE_H3 = True
except ImportError:
    _h3 = None
    HAVE_H3 = False


# Circumradius (deg) per resolution, tuned so cell areas track H3's published
# average hex areas at res 7..10 (≈5.16 km², 0.737 km², 0.105 km², 0.0150 km²)
# on the equirectangular plane at the equator. Aperture-7 scaling like H3.
_HEX_R0_DEG = 9.2
_APERTURE = 7.0


def hex_circumradius_deg(res: int) -> float:
    return _HEX_R0_DEG / (_APERTURE ** (res / 2.0))


def hex_cell(lat: np.ndarray, lon: np.ndarray, res: int) -> np.ndarray:
    """H3-stand-in hexagonal cell id at resolution `res` (0..15), int64.

    If the real `h3` package is available, delegates to
    h3.latlng_to_cell (vector loop — only taken off-container). Otherwise
    bins into a pointy-top hexagonal lattice in equirectangular (lon, lat)
    space via axial coordinates + cube rounding, packed as
    (res<<53) | ((q+2^25)<<26) | (r+2^25).
    """
    lat = np.asarray(lat, np.float64)
    lon = np.asarray(lon, np.float64)
    if HAVE_H3:  # pragma: no cover - not installed in this container
        def _to_int(c):
            return int(c, 16) if isinstance(c, str) else int(c)

        return np.asarray(
            [_to_int(_h3.latlng_to_cell(la, lo, res)) for la, lo in zip(lat, lon)],
            dtype=np.int64,
        )
    size = hex_circumradius_deg(res)
    # pointy-top axial: q = (sqrt(3)/3 x - 1/3 y)/size ; r = (2/3 y)/size
    qf = (math.sqrt(3.0) / 3.0 * lon - lat / 3.0) / size
    rf = (2.0 / 3.0 * lat) / size
    q, r = _cube_round(qf, rf)
    return (np.int64(res) << 53) | ((q + (1 << 25)) << 26) | (r + (1 << 25))


def _cube_round(qf: np.ndarray, rf: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    sf = -qf - rf
    q = np.rint(qf)
    r = np.rint(rf)
    s = np.rint(sf)
    dq = np.abs(q - qf)
    dr = np.abs(r - rf)
    ds = np.abs(s - sf)
    fix_q = (dq > dr) & (dq > ds)
    fix_r = ~fix_q & (dr > ds)
    q = np.where(fix_q, -r - s, q)
    r = np.where(fix_r, -q - s, r)
    return q.astype(np.int64), r.astype(np.int64)


def hex_decode(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    cell = np.asarray(cell, np.int64)
    res = (cell >> 53) & 0xF
    q = ((cell >> 26) & ((1 << 27) - 1)) - (1 << 25)
    r = (cell & ((1 << 26) - 1)) - (1 << 25)
    return res.astype(np.int32), q, r


def hex_center(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(lat, lon) of cell centers (fallback lattice only)."""
    res, q, r = hex_decode(cell)
    size = np.asarray([hex_circumradius_deg(int(x)) for x in np.atleast_1d(res)], np.float64)
    lat = 1.5 * r * size
    lon = math.sqrt(3.0) * (q + r / 2.0) * size
    return lat, lon


def hex_ring1(cell: int) -> list[int]:
    """The 6 immediate hex neighbors (grid_disk k=1 minus center)."""
    res, q, r = hex_decode(np.asarray([cell], np.int64))
    res, q, r = int(res[0]), int(q[0]), int(r[0])
    out = []
    for dq, dr in ((1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1)):
        out.append((res << 53) | ((q + dq + (1 << 25)) << 26) | (r + dr + (1 << 25)))
    return out


# ---------------------------------------------------------------------------
# Geohash (public domain encoding — Niemeyer 2008): interleave lon/lat
# bisection bits (lon first), 5 bits per base32 character. Implemented from
# the published algorithm description; no code taken.

GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_int(lat: np.ndarray, lon: np.ndarray, precision: int = 8) -> np.ndarray:
    """The interleaved bit code as int64 (5·precision bits, precision ≤ 12
    fits 60 bits). Equivalent to `precision` rounds of lon/lat bisection:
    ix = floor((lon+180)/360·2^half_lon) is exactly the lon bisection bit
    string (nested-floor identity), likewise iy for lat."""
    if not 1 <= precision <= 12:
        raise ValueError("precision must be in 1..12")
    bits = 5 * precision
    lon_bits = (bits + 1) // 2  # lon leads on the extra odd bit
    lat_bits = bits // 2
    ix = np.floor((np.asarray(lon, np.float64) + 180.0) / 360.0 * (1 << lon_bits)).astype(np.int64)
    iy = np.floor((np.asarray(lat, np.float64) + 90.0) / 180.0 * (1 << lat_bits)).astype(np.int64)
    ix = np.clip(ix, 0, (1 << lon_bits) - 1)
    iy = np.clip(iy, 0, (1 << lat_bits) - 1)
    code = np.zeros_like(ix)
    # even bit positions (0-indexed from the MSB) take lon bits, odd take lat
    for b in range(lon_bits):
        code |= ((ix >> (lon_bits - 1 - b)) & 1) << (bits - 1 - 2 * b)
    for b in range(lat_bits):
        code |= ((iy >> (lat_bits - 1 - b)) & 1) << (bits - 2 - 2 * b)
    return code


def geohash_cell(lat: np.ndarray, lon: np.ndarray, precision: int = 8) -> np.ndarray:
    """Base32 geohash strings (object array)."""
    code = geohash_int(lat, lon, precision)
    out = np.empty(code.shape, dtype=object)
    flat = code.ravel()
    res = out.ravel()
    for i, c in enumerate(flat):
        chars = []
        for j in range(precision):
            chars.append(GEOHASH_ALPHABET[(int(c) >> (5 * (precision - 1 - j))) & 31])
        res[i] = "".join(chars)
    return out
