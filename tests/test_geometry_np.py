"""Planar geometry primitives + geodesy ports."""

import math

import numpy as np

from ohsome_planet_spark.functions import geodesy as gd
from ohsome_planet_spark.functions import geometry_np as g


def sq(x0, y0, x1, y1):
    return (
        np.array([x0, x1, x1, x0, x0], float),
        np.array([y0, y0, y1, y1, y0], float),
    )


class TestPIP:
    def test_inside_outside(self):
        rx, ry = sq(0, 0, 10, 10)
        px = np.array([5.0, 15.0, -1.0, 9.999])
        py = np.array([5.0, 5.0, 5.0, 9.999])
        assert g.points_in_ring(px, py, rx, ry).tolist() == [True, False, False, True]

    def test_boundary_counts_as_inside(self):
        rx, ry = sq(0, 0, 10, 10)
        px = np.array([0.0, 10.0, 5.0, 0.0])
        py = np.array([5.0, 5.0, 10.0, 0.0])  # edges + corner
        res = g.points_in_polygon(px, py, [(rx, ry)])
        assert res.tolist() == [True, True, True, True]

    def test_hole_excluded_but_hole_boundary_included(self):
        outer = sq(0, 0, 10, 10)
        hole = sq(4, 4, 6, 6)
        px = np.array([5.0, 4.0, 3.9, 6.1])
        py = np.array([5.0, 5.0, 5.0, 5.0])
        res = g.points_in_polygon(px, py, [outer, hole])
        # center of hole: out; on hole edge: boundary → in; outside hole: in
        assert res.tolist() == [False, True, True, True]

    def test_nonconvex(self):
        # L-shape
        rx = np.array([0, 10, 10, 5, 5, 0, 0], float)
        ry = np.array([0, 0, 5, 5, 10, 10, 0], float)
        px = np.array([7.0, 7.0, 2.0])
        py = np.array([2.0, 7.0, 7.0])
        assert g.points_in_ring(px, py, rx, ry).tolist() == [True, False, True]

    def test_vertex_ray_no_double_count(self):
        # point due left of a vertex must not count the vertex twice
        rx = np.array([5, 10, 5, 0, 5], float)
        ry = np.array([0, 5, 10, 5, 0], float)  # diamond
        px = np.array([1.0, 4.9])
        py = np.array([5.0, 5.0])
        assert g.points_in_ring(px, py, rx, ry).tolist() == [True, True]


class TestAreaCentroid:
    def test_shoelace_sign(self):
        rx, ry = sq(0, 0, 2, 3)
        assert g.ring_signed_area(rx, ry) == 6.0  # CCW positive
        assert g.ring_signed_area(rx[::-1], ry[::-1]) == -6.0

    def test_bbox(self):
        rx, ry = sq(-3, 2, 7, 9)
        assert g.bbox(rx, ry) == (-3.0, 2.0, 7.0, 9.0)

    def test_polygon_centroid_square(self):
        rx, ry = sq(0, 0, 4, 4)
        cx, cy = g.centroid_polygon([(rx, ry)])
        assert (cx, cy) == (2.0, 2.0)

    def test_polygon_centroid_with_hole(self):
        outer = sq(0, 0, 10, 10)
        hole = sq(0, 0, 5, 5)  # removes lower-left quadrant-ish
        cx, cy = g.centroid_polygon([outer, hole])
        # mass of full square minus hole: area 75, centroid pulled up-right
        assert cx > 5.0 and cy > 5.0
        exp = (50 * 100 / 15 - 2.5 * 25 / 0.75) or None  # sanity only
        assert abs(cx - (5.0 * 100 - 2.5 * 25) / 75.0) < 1e-9

    def test_linestring_centroid(self):
        x = np.array([0.0, 10.0])
        y = np.array([0.0, 0.0])
        assert g.centroid_linestring(x, y) == (5.0, 0.0)


class TestGeodesy:
    def test_equator_degree_length(self):
        # 1° along the equator ≈ 111.19 km with mean radius
        lons = np.array([0.0, 1.0])
        lats = np.array([0.0, 0.0])
        d = gd.geodesic_length(lons, lats)
        expected = math.radians(1.0) * gd.EARTH_RADIUS_MEAN
        assert abs(d - expected) < 1e-6

    def test_meridian_degree_shorter_than_spherical(self):
        # spheroid correction shrinks latitude near equator
        lons = np.array([0.0, 0.0])
        lats = np.array([0.0, 1.0])
        d = gd.geodesic_length(lons, lats)
        assert 109_000 < d < 112_000

    def test_area_small_square_near_equator(self):
        # 0.01° × 0.01° at the equator ≈ (1.11195 km)² ≈ 1.2364e6 m²
        rx, ry = sq(0, 0, 0.01, 0.01)
        area = abs(gd.geodesic_ring_area(rx, ry))
        assert 1.22e6 < area < 1.25e6

    def test_area_shrinks_with_latitude(self):
        rx1, ry1 = sq(0, 0, 1, 1)
        rx2, ry2 = sq(0, 59, 1, 60)
        a1 = abs(gd.geodesic_ring_area(rx1, ry1))
        a2 = abs(gd.geodesic_ring_area(rx2, ry2))
        assert a2 < a1 * 0.6

    def test_polygon_area_hole_clamped(self):
        outer = sq(0, 0, 1, 1)
        bigger_hole = sq(-1, -1, 2, 2)
        assert gd.geodesic_polygon_area(outer, [bigger_hole]) == 0.0

    def test_sign_convention_clockwise_positive(self):
        rx, ry = sq(0, 0, 1, 1)  # CCW in planar terms
        signed = gd.geodesic_ring_area(rx[::-1], ry[::-1])
        # reference: "positive if ring is oriented clockwise"
        assert signed > 0

    def test_length_zero_for_single_point(self):
        assert gd.geodesic_length(np.array([1.0]), np.array([2.0])) == 0.0


def test_convex_hull_square_with_interior():
    from ohsome_planet_spark.functions.geometry_np import convex_hull
    import numpy as np

    x = np.array([0.0, 2.0, 2.0, 0.0, 1.0, 1.0, 0.5])
    y = np.array([0.0, 0.0, 2.0, 2.0, 1.0, 0.5, 1.5])
    hx, hy = convex_hull(x, y)
    assert sorted(zip(hx, hy)) == [(0.0, 0.0), (0.0, 2.0), (2.0, 0.0),
                                   (2.0, 2.0)]
    # CCW ring starting at the lexicographic min
    assert (hx[0], hy[0]) == (0.0, 0.0)
    area2 = 0.0
    for i in range(len(hx)):
        j = (i + 1) % len(hx)
        area2 += hx[i] * hy[j] - hx[j] * hy[i]
    assert area2 == 8.0  # CCW -> positive signed area (2*4)


def test_convex_hull_collinear_and_degenerate():
    from ohsome_planet_spark.functions.geometry_np import convex_hull
    import numpy as np

    hx, hy = convex_hull(np.array([0.0, 1.0, 2.0]), np.array([0.0, 1.0, 2.0]))
    assert list(zip(hx, hy)) == [(0.0, 0.0), (2.0, 2.0)]
    hx, hy = convex_hull(np.array([5.0]), np.array([7.0]))
    assert list(zip(hx, hy)) == [(5.0, 7.0)]
    hx, hy = convex_hull(np.array([1.0, 1.0]), np.array([2.0, 2.0]))
    assert list(zip(hx, hy)) == [(1.0, 2.0)]  # duplicates collapse


def test_convex_hull_order_invariant_and_contains_all():
    from ohsome_planet_spark.functions.geometry_np import (
        convex_hull, points_in_polygon)
    import hashlib
    import numpy as np

    def h(p, i):
        return int(hashlib.md5(f"{p}{i}".encode()).hexdigest()[:8], 16)

    x = np.array([h("x", i) % 100 / 10.0 for i in range(60)])
    y = np.array([h("y", i) % 100 / 10.0 for i in range(60)])
    hx1, hy1 = convex_hull(x, y)
    perm = np.argsort([h("p", i) for i in range(60)])
    hx2, hy2 = convex_hull(x[perm], y[perm])
    assert list(zip(hx1, hy1)) == list(zip(hx2, hy2))
    # every input point lies inside or on the hull ring
    ring_x = np.append(hx1, hx1[0])
    ring_y = np.append(hy1, hy1[0])
    inside = points_in_polygon(x, y, [(ring_x, ring_y)])
    assert inside.all()
