"""Property-based kernel tests (hypothesis): codecs round-trip, cell indexes
are consistent, PIP respects containment invariants."""

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ohsome_planet_spark.functions import cells as C
from ohsome_planet_spark.functions import geometry_np as gnp
from ohsome_planet_spark.functions.wkb import wkb_dumps, wkb_loads
from ohsome_planet_spark.functions.wkt import wkt_dumps, wkt_loads

lons = st.floats(min_value=-180.0, max_value=180.0, allow_nan=False)
lats = st.floats(min_value=-90.0, max_value=90.0, allow_nan=False)
coords = st.tuples(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False).map(lambda x: round(x, 6)),
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False).map(lambda x: round(x, 6)),
)


@settings(max_examples=200, deadline=None)
@given(st.lists(coords, min_size=2, max_size=30))
def test_wkb_linestring_roundtrip(pts):
    geom = ("LineString", np.asarray(pts, np.float64))
    back = wkb_loads(wkb_dumps(geom))
    assert back[0] == "LineString"
    np.testing.assert_array_equal(back[1], np.asarray(pts, np.float64))


@settings(max_examples=200, deadline=None)
@given(st.lists(coords, min_size=3, max_size=20))
def test_wkt_polygon_roundtrip(pts):
    ring = pts + [pts[0]]
    geom = ("Polygon", [np.asarray(ring, np.float64)])
    back = wkt_loads(wkt_dumps(geom))
    assert back[0] == "Polygon"
    np.testing.assert_allclose(back[1][0], np.asarray(ring, np.float64), rtol=0, atol=0)


@settings(max_examples=300, deadline=None)
@given(lons, lats)
def test_zxy_cell_contains_point(lon, lat):
    for z in (4, 10):
        cell = C.zxy_cell(np.asarray([lon]), np.asarray([lat]), z)
        x0, y0, x1, y1 = C.zxy_cell_bounds(cell)
        # tolerance both sides: values within a rounding ulp of a cell edge
        # legitimately bin to the neighboring cell (FP floor semantics — the
        # SQL oracle bins identically)
        assert x0[0] - 1e-9 <= lon <= x1[0] + 1e-9
        assert y0[0] - 1e-9 <= lat <= y1[0] + 1e-9


@settings(max_examples=300, deadline=None)
@given(lons, lats)
def test_s2_parent_consistency(lon, lat):
    la = np.asarray([lat])
    lo = np.asarray([lon])
    c20 = C.s2_cell_id(la, lo, 20)
    for lvl in (4, 10, 16):
        assert C.s2_parent(c20, lvl)[0] == C.s2_cell_id(la, lo, lvl)[0]


@settings(max_examples=300, deadline=None)
@given(
    st.floats(min_value=-179.0, max_value=179.0, allow_nan=False),
    st.floats(min_value=-89.0, max_value=89.0, allow_nan=False),
    st.floats(min_value=1e-6, max_value=0.5, allow_nan=False),
    st.floats(min_value=1e-6, max_value=0.5, allow_nan=False),
)
def test_xz2_bbox_level_bounds(lon, lat, w, h):
    level, code = C.xz2_code(
        np.asarray([lon]), np.asarray([lat]), np.asarray([lon + w]), np.asarray([lat + h])
    )
    assert 0 <= level[0] <= 16
    assert code[0] >= 0
    # enlarging the box can only coarsen the level
    level2, _ = C.xz2_code(
        np.asarray([lon]), np.asarray([lat]),
        np.asarray([min(lon + 4 * w, 180.0)]), np.asarray([min(lat + 4 * h, 90.0)]),
    )
    assert level2[0] <= level[0]


@settings(max_examples=100, deadline=None)
@given(
    st.floats(min_value=-50.0, max_value=50.0),
    st.floats(min_value=-50.0, max_value=50.0),
    st.floats(min_value=0.1, max_value=20.0),
    st.floats(min_value=0.1, max_value=20.0),
    st.lists(st.tuples(st.floats(-60, 60), st.floats(-60, 60)), min_size=1, max_size=20),
)
def test_pip_rectangle_agrees_with_bounds(x0, y0, w, h, pts):
    rx = np.asarray([x0, x0 + w, x0 + w, x0, x0])
    ry = np.asarray([y0, y0, y0 + h, y0 + h, y0])
    px = np.asarray([p[0] for p in pts])
    py = np.asarray([p[1] for p in pts])
    got = gnp.points_in_polygon(px, py, [(rx, ry)])
    exp = (px >= x0) & (px <= x0 + w) & (py >= y0) & (py <= y0 + h)
    assert (got == exp).all()


@settings(max_examples=200, deadline=None)
@given(lats, lons)
def test_hex_center_roundtrip_prop(lat, lon):
    for res in (7, 9):
        cell = C.hex_cell(np.asarray([lat]), np.asarray([lon]), res)
        clat, clon = C.hex_center(cell)
        again = C.hex_cell(clat, clon, res)
        assert again[0] == cell[0]


@settings(max_examples=300, deadline=None)
@given(lons, lats)
def test_zxy_parent_equals_direct_assignment(lon, lat):
    """The nested-floor identity behind tile_pyramid: rolling a fine cell
    up by bit-shift lands on EXACTLY the cell direct assignment picks at
    the coarse zoom (multiplying a double by a power of two is exact)."""
    lon_a, lat_a = np.asarray([lon]), np.asarray([lat])
    for z, pz in ((14, 9), (10, 4), (12, 11)):
        fine = C.zxy_cell(lon_a, lat_a, z)
        assert C.zxy_parent(fine, pz)[0] == C.zxy_cell(lon_a, lat_a, pz)[0]


_pii_text = st.text(
    alphabet=st.characters(codec="ascii", exclude_characters="\x00"),
    max_size=120,
)


@settings(max_examples=300, deadline=None)
@given(_pii_text)
def test_pii_redaction_complete_and_idempotent(s):
    """Pattern-level properties (pure `re` on the same pattern subset):
    after redaction no pattern matches remain, and redacting again is a
    no-op (placeholders must not create new matches)."""
    import re

    from ohsome_planet_spark.operators.pii import PII_PATTERNS, REDACTIONS

    def redact(t):
        for kind in ("email", "ipv4", "phone"):
            t = re.sub(PII_PATTERNS[kind], REDACTIONS[kind], t)
        return t

    planted = s + " a@b.io 10.1.2.3 +1 555 000 1111 " + s
    once = redact(planted)
    for kind, pat in PII_PATTERNS.items():
        assert not re.search(pat, once), (kind, once)
    assert redact(once) == once


# ---------------------------------------------------------------------------
# round-6 session-2 kernels (pure python/numpy — no Spark per example)
# ---------------------------------------------------------------------------

_coords = st.lists(
    st.tuples(
        st.floats(min_value=-180, max_value=180, allow_nan=False,
                  allow_infinity=False),
        st.floats(min_value=-90, max_value=90, allow_nan=False,
                  allow_infinity=False),
    ),
    min_size=2, max_size=60,
)


@settings(max_examples=200, deadline=None)
@given(_coords, st.floats(min_value=0.0, max_value=50.0,
                          allow_nan=False, allow_infinity=False))
def test_dp_mask_invariants(pts, tol):
    """Endpoints always kept; simplifying a simplified line is a no-op;
    kept vertices are a subsequence (mask semantics guarantee it)."""
    import numpy as np

    from ohsome_planet_spark.functions.simplify import douglas_peucker_mask

    x = np.array([p[0] for p in pts])
    y = np.array([p[1] for p in pts])
    m = douglas_peucker_mask(x, y, tol)
    assert m[0] and m[-1]
    m2 = douglas_peucker_mask(x[m], y[m], tol)
    assert m2.all()


@settings(max_examples=200, deadline=None)
@given(_coords)
def test_convex_hull_invariants(pts):
    """Hull is order-invariant, minimal (every vertex is a strict turn),
    and contains every input point (cross-product test, no libm)."""
    import numpy as np

    from ohsome_planet_spark.functions.geometry_np import convex_hull

    x = np.array([p[0] for p in pts])
    y = np.array([p[1] for p in pts])
    hx, hy = convex_hull(x, y)
    rx, ry = convex_hull(x[::-1], y[::-1])
    assert list(zip(hx, hy)) == list(zip(rx, ry))
    k = len(hx)
    if k >= 3:
        # containment up to fp noise: the chain's turn decisions and this
        # edge test round differently, so an on-edge point can evaluate a
        # hair negative (hypothesis found -2.2e-308 — one denormal) —
        # scale the tolerance to the coordinate magnitude
        m = max(1.0, float(np.max(np.abs(x))), float(np.max(np.abs(y))))
        eps = 1e-12 * m * m
        for px, py in zip(x, y):
            for i in range(k):
                j = (i + 1) % k
                cross = ((hx[j] - hx[i]) * (py - hy[i])
                         - (hy[j] - hy[i]) * (px - hx[i]))
                assert cross >= -eps  # CCW ring: inside or on every edge


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(alphabet=st.characters(codec="ascii"),
                        min_size=1, max_size=20),
                min_size=1, max_size=50),
       st.integers(min_value=1, max_value=7))
def test_bloom_python_replay_no_false_negatives(keys, k):
    """The KM position math replayed in pure python: members always
    probe positive against the union of member positions."""
    import hashlib

    m = 1 << 12

    def positions(key):
        h1 = int(hashlib.md5(b"a:" + key.encode()).hexdigest()[:15], 16)
        h2 = int(hashlib.md5(b"b:" + key.encode()).hexdigest()[:15], 16)
        return [(h1 + j * h2) % m for j in range(k)]

    bits = {p for key in keys for p in positions(key)}
    assert all(all(p in bits for p in positions(key)) for key in keys)


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=1, max_value=8))
def test_binomial_weights_symmetric_and_complete(r):
    from ohsome_planet_spark.operators.tiling import binomial_weights

    w = binomial_weights(r)
    assert w == w[::-1]
    assert sum(w) == 4 ** r // 2 ** r * 2 ** r // 1  # = 2^(2r)
    assert sum(w) == 1 << (2 * r)
    assert max(w) == w[r]
