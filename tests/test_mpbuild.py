"""Multipolygon assembly goldens — the reference's mod/* fixture suite
(/root/reference/osm-geometry/src/test/resources/mod/*/; inputs re-derived
from the public osm-testdata-style data.osm files, expectations from
test.json), compared topologically (normalized rings), plus synthesized
cases per FIXTURES.md §5.
"""

import numpy as np
import pytest

from ohsome_planet_spark.functions.mpbuild import (
    MultiPolygonBuildError,
    build_multipolygon,
)
from ohsome_planet_spark.functions.geometry_np import ring_signed_area


def norm_ring(ring) -> tuple:
    """Canonical ring form: drop closing coord, fix orientation CCW, rotate
    to start at the lexicographically smallest vertex."""
    pts = [tuple(p) for p in np.asarray(ring, float)[:-1]]
    arr = np.asarray(pts + [pts[0]], float)
    if ring_signed_area(arr[:-1, 0], arr[:-1, 1]) < 0:
        pts = list(reversed(pts))
    k = pts.index(min(pts))
    return tuple(pts[k:] + pts[:k])


def norm_mp(geom) -> frozenset:
    kind, polys = geom
    assert kind == "MultiPolygon"
    out = set()
    for rings in polys:
        shell = norm_ring(rings[0])
        holes = frozenset(norm_ring(r) for r in rings[1:])
        out.add((shell, holes))
    return frozenset(out)


def mp_from_wkt(wkt: str) -> frozenset:
    from ohsome_planet_spark.functions.wkt import wkt_loads

    kind, polys = wkt_loads(wkt)
    assert kind == "MultiPolygon"
    return frozenset(
        (norm_ring(p[0]), frozenset(norm_ring(r) for r in p[1:])) for p in polys
    )


def test_706_two_outers_touching_at_node():
    outer = [
        [(7.61, 1.04), (7.62, 1.06), (7.65, 1.05), (7.64, 1.03)],
        [(7.67, 1.01), (7.67, 1.03), (7.64, 1.03)],
        [(7.67, 1.01), (7.64, 1.01), (7.64, 1.03)],
        [(7.61, 1.04), (7.63, 1.02), (7.64, 1.03)],
    ]
    got = build_multipolygon(outer, [])
    exp = mp_from_wkt(
        "MULTIPOLYGON(((7.61 1.04,7.62 1.06,7.65 1.05,7.64 1.03,7.63 1.02,7.61 1.04)),"
        "((7.64 1.03,7.67 1.03,7.67 1.01,7.64 1.01,7.64 1.03)))"
    )
    assert norm_mp(got) == exp


def test_720_roles_switched():
    outer = [[(7.04, 1.24), (7.02, 1.24), (7.02, 1.22), (7.04, 1.22), (7.04, 1.24)]]
    inner = [[(7.05, 1.25), (7.05, 1.21), (7.01, 1.21), (7.01, 1.25), (7.05, 1.25)]]
    got = build_multipolygon(outer, inner)
    exp = mp_from_wkt(
        "MULTIPOLYGON(((7.05 1.21,7.01 1.21,7.01 1.25,7.05 1.25,7.05 1.21),"
        "(7.04 1.22,7.02 1.22,7.02 1.24,7.04 1.24,7.04 1.22)))"
    )
    assert norm_mp(got) == exp


def test_729_three_layers_nested():
    ways = [
        [(7.99, 1.29), (7.99, 1.2), (7.9, 1.2), (7.9, 1.29), (7.99, 1.29)],
        [(7.98, 1.28), (7.98, 1.21), (7.91, 1.21), (7.91, 1.28), (7.98, 1.28)],
        [(7.97, 1.27), (7.97, 1.22), (7.92, 1.22), (7.92, 1.27), (7.97, 1.27)],
        [(7.96, 1.26), (7.96, 1.23), (7.93, 1.23), (7.93, 1.26), (7.96, 1.26)],
        [(7.95, 1.25), (7.95, 1.24), (7.94, 1.24), (7.94, 1.25), (7.95, 1.25)],
    ]
    got = build_multipolygon(ways, [])
    kind, polys = got
    assert len(polys) == 3
    n_holes = sorted(len(p) - 1 for p in polys)
    assert n_holes == [0, 1, 1]


def test_743_spike_removed():
    """mod/743 asserts the `fix` WKT: the doubling-back spike vertex is
    erased during ring merge (`mergeSegments:263-279`) and the repaired
    square survives — in BOTH modes (the repair is mode-independent; the
    reference's linear pass is rotation-dependent at the wrap position, ours
    is cyclic, see `_merge_ring`)."""
    outer = [
        [(7.31, 1.45), (7.33, 1.45), (7.33, 1.43), (7.31, 1.43), (7.31, 1.41)],
        [(7.31, 1.41), (7.31, 1.45)],
    ]
    exp = mp_from_wkt(
        "MULTIPOLYGON(((7.31 1.45,7.31 1.43,7.33 1.43,7.33 1.45,7.31 1.45)))")
    for mode in ("default", "legacy"):
        assert norm_mp(build_multipolygon(outer, [], mode=mode)) == exp


def test_756_inner_touches_outer_in_line_no_common_node():
    """mod/756 asserts the `fix` WKT (the reference harness prefers `fix`
    over the historical osm-testdata "INVALID"): the line-touching inner is
    carved out of the outer via difference (`GeometryBuilder.java:87-105` —
    no common-node requirement on the inner-vs-OUTER path), splitting the
    H-shaped outer into a notched left part and the right square keeping its
    two point-touching holes."""
    outer = [
        [
            (7.65, 1.51), (7.61, 1.51), (7.61, 1.59), (7.65, 1.59),
            (7.65, 1.57), (7.69, 1.57), (7.69, 1.53), (7.65, 1.53), (7.65, 1.51),
        ]
    ]
    inner = [
        [(7.65, 1.52), (7.63, 1.52), (7.63, 1.58), (7.65, 1.58), (7.65, 1.52)],
        [(7.67, 1.54), (7.66, 1.54), (7.66, 1.55), (7.67, 1.55), (7.67, 1.54)],
        [(7.67, 1.55), (7.67, 1.56), (7.68, 1.56), (7.68, 1.55), (7.67, 1.55)],
    ]
    exp = mp_from_wkt(
        "MULTIPOLYGON(((7.65 1.51,7.61 1.51,7.61 1.59,7.65 1.59,7.65 1.58,"
        "7.63 1.58,7.63 1.52,7.65 1.52,7.65 1.51)),"
        "((7.65 1.53,7.65 1.57,7.69 1.57,7.69 1.53,7.65 1.53),"
        "(7.66 1.54,7.66 1.55,7.67 1.55,7.67 1.54,7.66 1.54),"
        "(7.67 1.55,7.67 1.56,7.68 1.56,7.68 1.55,7.67 1.55)))")
    assert norm_mp(build_multipolygon(outer, inner, mode="legacy")) == exp


def test_756_2_notch_with_square_and_triangle_holes():
    """mod/756_mod2 `fix`: same carve as 756 but the notched left part keeps
    three non-touching square holes and the right square two triangle
    holes — pins that hole re-matching after the difference split assigns
    each inner to the face that contains it."""
    outer = [
        [
            (7.65, 1.51), (7.61, 1.51), (7.61, 1.59), (7.65, 1.59),
            (7.65, 1.57), (7.69, 1.57), (7.69, 1.53), (7.65, 1.53), (7.65, 1.51),
        ]
    ]
    inner = [
        [(7.65, 1.52), (7.64, 1.52), (7.64, 1.58), (7.65, 1.58), (7.65, 1.52)],
        [(7.67, 1.54), (7.66, 1.54), (7.66, 1.55), (7.67, 1.54)],
        [(7.67, 1.56), (7.68, 1.56), (7.68, 1.55), (7.67, 1.56)],
        [(7.62, 1.52), (7.62, 1.53), (7.63, 1.53), (7.63, 1.52), (7.62, 1.52)],
        [(7.62, 1.54), (7.62, 1.55), (7.63, 1.55), (7.63, 1.54), (7.62, 1.54)],
        [(7.62, 1.56), (7.62, 1.57), (7.63, 1.57), (7.63, 1.56), (7.62, 1.56)],
    ]
    exp = mp_from_wkt(
        "MULTIPOLYGON(((7.65 1.51,7.61 1.51,7.61 1.59,7.65 1.59,7.65 1.58,"
        "7.64 1.58,7.64 1.52,7.65 1.52,7.65 1.51),"
        "(7.62 1.52,7.62 1.53,7.63 1.53,7.63 1.52,7.62 1.52),"
        "(7.62 1.54,7.62 1.55,7.63 1.55,7.63 1.54,7.62 1.54),"
        "(7.62 1.56,7.62 1.57,7.63 1.57,7.63 1.56,7.62 1.56)),"
        "((7.65 1.53,7.65 1.57,7.69 1.57,7.69 1.53,7.65 1.53),"
        "(7.66 1.54,7.66 1.55,7.67 1.54,7.66 1.54),"
        "(7.67 1.56,7.68 1.56,7.68 1.55,7.67 1.56)))")
    assert norm_mp(build_multipolygon(outer, inner, mode="legacy")) == exp


def test_757_unclosed_inners_parity():
    """mod/757: the two unclosed chords attached at common nodes make every
    junction odd-parity. DEFAULT mode throws (`buildRings:176-178`); LEGACY
    removes the chords via `removeMismatchedSegments` (each junction has the
    chord's way id odd-count) and asserts the `fix` WKT — the bare outer."""
    outer = [
        [
            (7.77, 1.51), (7.71, 1.51), (7.71, 1.53), (7.71, 1.55), (7.71, 1.57),
            (7.77, 1.57), (7.77, 1.55), (7.77, 1.53), (7.77, 1.51),
        ],
        [(7.77, 1.53), (7.75, 1.53), (7.75, 1.55), (7.77, 1.55)],
        [(7.71, 1.55), (7.73, 1.55), (7.73, 1.53), (7.71, 1.53)],
    ]
    with pytest.raises(MultiPolygonBuildError):
        build_multipolygon(outer, [], mode="default")
    # topologically the fix WKT MULTIPOLYGON(((7.77 1.51,7.71 1.51,7.71 1.57,
    # 7.77 1.57,7.77 1.51))) — the junction vertices stay in the ring (the
    # reference compares with JTS equalsTopo, which ignores collinear
    # vertices; our normalizer is exact, so spell them out)
    exp = mp_from_wkt(
        "MULTIPOLYGON(((7.77 1.51,7.71 1.51,7.71 1.53,7.71 1.55,7.71 1.57,"
        "7.77 1.57,7.77 1.55,7.77 1.53,7.77 1.51)))")
    assert norm_mp(build_multipolygon(outer, [], mode="legacy")) == exp


def test_722_inners_split_outer():
    """Difference-repair path (GeometryBuilder:78-105): two inner rings that
    touch each other and the outer split the square into two parts — handled
    here with a planar face trace instead of JTS difference."""
    outer = [[(7.25, 1.25), (7.25, 1.21), (7.21, 1.21), (7.21, 1.25), (7.25, 1.25)]]
    inner = [
        [(7.21, 1.25), (7.24, 1.24), (7.23, 1.23), (7.21, 1.25)],
        [(7.25, 1.21), (7.23, 1.23), (7.22, 1.22), (7.25, 1.21)],
    ]
    got = build_multipolygon(outer, inner)
    exp = mp_from_wkt(
        "MULTIPOLYGON(((7.21 1.21,7.21 1.25,7.23 1.23,7.22 1.22,7.25 1.21,7.21 1.21)),"
        "((7.25 1.21,7.23 1.23,7.24 1.24,7.21 1.25,7.25 1.25,7.25 1.21)))"
    )
    assert norm_mp(got) == exp


def test_touching_inner_rings_merge_via_difference():
    """Two inner rings sharing an edge-path of vertices inside an outer —
    the difference path must carve both out as one combined hole region."""
    outer = [[(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]]
    inner = [
        [(2, 2), (5, 2), (5, 5), (2, 5), (2, 2)],
        [(5, 2), (8, 2), (8, 5), (5, 5), (5, 2)],
    ]
    got = build_multipolygon(outer, inner)
    kind, polys = got
    # one outer face with the merged hole(s): total area = 100 - 18 = 82 (planar)
    from ohsome_planet_spark.functions.geometry_np import ring_signed_area
    import numpy as np

    total = 0.0
    for rings in polys:
        a = abs(ring_signed_area(np.asarray(rings[0])[:, 0], np.asarray(rings[0])[:, 1]))
        for r in rings[1:]:
            a -= abs(ring_signed_area(np.asarray(r)[:, 0], np.asarray(r)[:, 1]))
        total += a
    assert total == pytest.approx(82.0)


def test_poly_fixture_700():
    # reference poly/ fixture (osm-geometry/src/test/resources/poly/):
    # single closed way 700800 → one-polygon multipolygon
    way = [(7.01, 1.01), (7.01, 1.04), (7.04, 1.04), (7.04, 1.01), (7.01, 1.01)]
    got = build_multipolygon([way], [])
    assert norm_mp(got) == mp_from_wkt(
        "MULTIPOLYGON(((7.01 1.01,7.01 1.04,7.04 1.04,7.04 1.01,7.01 1.01)))"
    )


def test_polygon_feature_rules():
    # ConributionGeometryTest.testPolygonFeatureLoading parity
    from ohsome_planet_spark.functions.waygeom import test_polygon_feature as tpf

    assert tpf("building", "yes")
    assert tpf("natural", "meadow")
    assert tpf("waterway", "dock")
    assert not tpf("surface", "asphalt")
    assert not tpf("highway", "primary")
    assert not tpf("natural", "coastline")


# -- synthesized cases (FIXTURES.md §5) --------------------------------------


def test_single_closed_way():
    got = build_multipolygon([[(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)]], [])
    assert norm_mp(got) == mp_from_wkt("MULTIPOLYGON(((0 0,1 0,1 1,0 1,0 0)))")


def test_outer_from_two_open_ways():
    got = build_multipolygon(
        [[(0, 0), (1, 0), (1, 1)], [(1, 1), (0, 1), (0, 0)]], []
    )
    assert norm_mp(got) == mp_from_wkt("MULTIPOLYGON(((0 0,1 0,1 1,0 1,0 0)))")


def test_outer_plus_inner_hole():
    got = build_multipolygon(
        [[(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]],
        [[(4, 4), (6, 4), (6, 6), (4, 6), (4, 4)]],
    )
    assert norm_mp(got) == mp_from_wkt(
        "MULTIPOLYGON(((0 0,10 0,10 10,0 10,0 0),(4 4,6 4,6 6,4 6,4 4)))"
    )


def test_duplicate_way_dropped():
    got = build_multipolygon(
        [
            [(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)],
            [(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)],  # duplicate
        ],
        [],
    )
    assert norm_mp(got) == mp_from_wkt("MULTIPOLYGON(((0 0,1 0,1 1,0 1,0 0)))")


def test_crossing_outers_invalid():
    with pytest.raises(MultiPolygonBuildError):
        build_multipolygon(
            [
                [(0, 0), (2, 0), (2, 2), (0, 2), (0, 0)],
                [(1, 1), (3, 1), (3, 3), (1, 3), (1, 1)],
            ],
            [],
        )


def test_legacy_mode_removes_mismatched_segment():
    """LEGACY mode (`NodeSegments.removeMismatchedSegments:105-135`): an
    extra dangling way attributable to one way id is dropped instead of
    failing the parity check."""
    outer = [
        [(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)],
        [(1, 1), (2, 2)],  # dangling spur
    ]
    with pytest.raises(MultiPolygonBuildError):
        build_multipolygon(outer, [], mode="default")
    got = build_multipolygon(outer, [], mode="legacy")
    assert norm_mp(got) == mp_from_wkt("MULTIPOLYGON(((0 0,1 0,1 1,0 1,0 0)))")


def test_unclosed_dangling_way_invalid():
    with pytest.raises(MultiPolygonBuildError):
        build_multipolygon(
            [[(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)], [(5, 5), (6, 6)]], []
        )


# --- synthesized hardening cases (VERDICT r1 missing #3) --------------------


def test_identical_shared_edge_dissolves():
    """Two outers sharing an identical edge: the duplicated segment is
    set-deduped + redundant-filtered (NodeSegments.add:11-18,
    filterOutRedundantSegments:41-58), so the rings dissolve into one."""
    a = [(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)]
    b = [(1, 0), (2, 0), (2, 1), (1, 1), (1, 0)]
    kind, polys = build_multipolygon([a, b], [])
    assert len(polys) == 1
    xs = [p[0] for p in polys[0][0]]
    assert min(xs) == 0.0 and max(xs) == 2.0  # dissolved 2x1 rectangle


def test_collinear_overlap_without_common_node_invalid():
    """Outer edges overlapping collinearly with no shared node → error
    (handleIntersectingAndTouchingPolygons:131-136)."""
    a = [(0, 0), (2, 0), (2, 2), (0, 2), (0, 0)]
    b = [(2, 1), (4, 1), (4, 3), (2, 3), (2, 1)]
    with pytest.raises(MultiPolygonBuildError):
        build_multipolygon([a, b], [])


def test_point_touch_without_common_node_invalid():
    """Corner touching the middle of another outer's edge → error
    ('Touching polygons without common node')."""
    a = [(0, 0), (2, 0), (2, 2), (0, 2), (0, 0)]
    c = [(2, 1), (3, 0.5), (3, 2), (2, 1)]
    with pytest.raises(MultiPolygonBuildError):
        build_multipolygon([a, c], [])


def test_inner_touching_outer_at_single_common_node():
    """Inner sharing exactly ONE vertex with the outer stays a plain hole
    (Point intersection at a common node is allowed, :87-105)."""
    o = [(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)]
    i = [(0, 0), (1, 0.5), (0.5, 1), (0, 0)]
    kind, polys = build_multipolygon([o], [i])
    assert len(polys) == 1 and len(polys[0]) == 2  # shell + hole


def test_inner_role_ring_outside_outer_becomes_part():
    """Nesting is purely geometric (area-desc containment,
    buildMultiPolygon:33-49): an inner-role ring contained by no outer
    becomes its own polygon part."""
    o = [(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)]
    far = [(10, 10), (11, 10), (11, 11), (10, 11), (10, 10)]
    kind, polys = build_multipolygon([o], [far])
    assert len(polys) == 2
    assert all(len(p) == 1 for p in polys)  # neither has holes


def test_two_disjoint_outers_each_with_inner():
    o1 = [(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)]
    i1 = [(1, 1), (2, 1), (2, 2), (1, 2), (1, 1)]
    o2 = [(10, 0), (14, 0), (14, 4), (10, 4), (10, 0)]
    i2 = [(11, 1), (12, 1), (12, 2), (11, 2), (11, 1)]
    kind, polys = build_multipolygon([o1, o2], [i1, i2])
    assert len(polys) == 2
    # each hole landed in ITS containing outer
    for shell, *holes in polys:
        assert len(holes) == 1
        sx = [p[0] for p in shell]
        hx = [p[0] for p in holes[0]]
        assert min(sx) <= min(hx) <= max(hx) <= max(sx)


def test_outer_from_three_fragments_mixed_orientation():
    """Ring assembly from open fragments in arbitrary direction order."""
    f1 = [(0, 0), (2, 0), (2, 1)]
    f2 = [(2, 2), (2, 1)]          # reversed orientation
    f3 = [(2, 2), (0, 2), (0, 0)]
    kind, polys = build_multipolygon([f1, f2, f3], [])
    assert len(polys) == 1
    shell = polys[0][0]
    assert len(shell) == 6  # 5 distinct vertices + closure


def _planar_area(polys):
    from ohsome_planet_spark.functions.geometry_np import ring_signed_area
    import numpy as np

    total = 0.0
    for rings in polys:
        a = abs(ring_signed_area(np.asarray(rings[0])[:, 0], np.asarray(rings[0])[:, 1]))
        for r in rings[1:]:
            a -= abs(ring_signed_area(np.asarray(r)[:, 0], np.asarray(r)[:, 1]))
        total += a
    return total


def test_same_role_inner_collinear_partial_overlap_unions():
    """Two inner rings overlapping along a collinear edge SEGMENT with no
    shared node: JTS classes the ring intersection as a LineString and the
    reference unions them (handleIntersectingAndTouchingPolygons:150-153,
    mergeTouching=true). Previously the one residual K5 deviation (error)."""
    outer = [[(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]]
    inner = [
        [(2, 2), (5, 2), (5, 5), (2, 5), (2, 2)],
        [(5, 3), (7, 3), (7, 4), (5, 4), (5, 3)],
    ]
    got = build_multipolygon(outer, inner)
    assert _planar_area(got[1]) == pytest.approx(100.0 - 9.0 - 2.0)


def test_same_role_inner_pocket_union_drops_pocket():
    """Two inner rings (a C and its lid) whose union encloses a pocket: the
    reference punches the union's EXTERIOR ring as the hole
    (innerPoly.getExteriorRing()), so the pocket is removed too."""
    outer = [[(0, 0), (20, 0), (20, 20), (0, 20), (0, 0)]]
    c_shape = [(2, 2), (8, 2), (8, 4), (4, 4), (4, 8), (8, 8), (8, 10), (2, 10), (2, 2)]
    lid = [(8, 2), (10, 2), (10, 10), (8, 10), (8, 2)]
    got = build_multipolygon(outer, [c_shape, lid])
    # hole = full union exterior (2,2)-(10,10) rect → 400 - 64 = 336
    assert _planar_area(got[1]) == pytest.approx(400.0 - 64.0)
    # exactly one polygon with exactly one hole, and the hole is the 8x8 rect
    assert len(got[1]) == 1 and len(got[1][0]) == 2
    hole = got[1][0][1]
    xs, ys = hole[:, 0], hole[:, 1]
    assert (xs.min(), ys.min(), xs.max(), ys.max()) == (2.0, 2.0, 10.0, 10.0)


def test_same_role_inner_chain_of_three_unions():
    """Three inners chained by shared edges merge iteratively into one hole
    (the reference's pairwise loop with remove-and-rescan)."""
    outer = [[(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]]
    inner = [
        [(2, 2), (4, 2), (4, 4), (2, 4), (2, 2)],
        [(4, 2), (6, 2), (6, 4), (4, 4), (4, 2)],
        [(6, 2), (8, 2), (8, 4), (6, 4), (6, 2)],
    ]
    got = build_multipolygon(outer, inner)
    assert _planar_area(got[1]) == pytest.approx(100.0 - 12.0)
    assert len(got[1]) == 1 and len(got[1][0]) == 2  # one shell, one merged hole


def test_outer_rings_collinear_overlap_different_noding_error():
    """Outer rings overlapping along the same line but noded differently
    (so segment-level dedup can't dissolve them): the ring intersection is
    a LineString → 'Overlapping outer rings' (mergeTouching=false branch).
    Identically-noded shared edges instead dissolve at segment level —
    see test_identical_shared_edge_dissolves."""
    a = [(0, 0), (2, 0), (2, 2), (0, 2), (0, 0)]
    b = [(2, 0), (4, 0), (4, 2), (2, 2), (2, 1), (2, 0)]
    with pytest.raises(MultiPolygonBuildError):
        build_multipolygon([a, b], [])


# --- grid-7xx-class cases synthesized from the public osm-testdata family
# descriptions (the reference's primary K5 surface; its submodule checkout is
# empty, so the breadth is rebuilt here case by case) ---


def test_7xx_spiral_ring_valid():
    """Spiral-shaped closed way: long single-ring chain, no self-touch —
    must assemble to one simple polygon."""
    spiral = [
        (0, 0), (9, 0), (9, 9), (2, 9), (2, 3), (4, 3),
        (4, 7), (7, 7), (7, 2), (0, 2), (0, 0),
    ]
    kind, polys = build_multipolygon([spiral], [])
    assert len(polys) == 1 and len(polys[0]) == 1
    assert _planar_area(polys) == pytest.approx(
        abs(sum(spiral[i][0] * spiral[i + 1][1] - spiral[i + 1][0] * spiral[i][1]
                for i in range(len(spiral) - 1)) / 2.0))


def test_7xx_ring_within_ring_within_ring():
    """Four-level nesting: shell ⊃ hole ⊃ island ⊃ island-hole. Area-desc
    containment alternates outer/inner regardless of roles."""
    shell = [(0, 0), (20, 0), (20, 20), (0, 20), (0, 0)]
    hole = [(4, 4), (16, 4), (16, 16), (4, 16), (4, 4)]
    island = [(6, 6), (14, 6), (14, 14), (6, 14), (6, 6)]
    island_hole = [(8, 8), (12, 8), (12, 12), (8, 12), (8, 8)]
    kind, polys = build_multipolygon([shell, island], [hole, island_hole])
    assert len(polys) == 2
    assert sorted(len(p) for p in polys) == [2, 2]
    assert _planar_area(polys) == pytest.approx((400 - 144) + (144 - 16) - (144 - 64))
    # = shell minus hole plus island minus island-hole = 256 + 48


def test_7xx_outer_role_ring_inside_outer_becomes_hole():
    """Role mismatch salvage: an outer-role ring wholly inside another outer
    is nested as its hole (roles are ignored, buildMultiPolygon:33-49)."""
    big = [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]
    small = [(3, 3), (6, 3), (6, 6), (3, 6), (3, 3)]
    kind, polys = build_multipolygon([big, small], [])
    assert len(polys) == 1 and len(polys[0]) == 2
    assert _planar_area(polys) == pytest.approx(100.0 - 9.0)


def test_7xx_two_holes_touching_at_single_node():
    """Two inner rings sharing exactly one vertex (MultiPoint/Point class →
    formsEnclosedAreas → difference repair), both carved out."""
    outer = [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]
    h1 = [(2, 2), (5, 2), (5, 5), (2, 5), (2, 2)]
    h2 = [(5, 5), (8, 5), (8, 8), (5, 8), (5, 5)]
    kind, polys = build_multipolygon([outer], [h1, h2])
    assert _planar_area(polys) == pytest.approx(100.0 - 9.0 - 9.0)


def test_7xx_fragmented_mixed_orientation_with_hole():
    """Outer split into four fragments (some reversed) + hole split into two
    open chains: ring assembly walks unordered mixed-orientation members."""
    outer_frags = [
        [(0, 0), (10, 0)],
        [(10, 10), (10, 0)],   # reversed
        [(10, 10), (0, 10)],
        [(0, 10), (0, 0)],
    ]
    hole_frags = [
        [(3, 3), (7, 3), (7, 7)],
        [(7, 7), (3, 7), (3, 3)],
    ]
    kind, polys = build_multipolygon(outer_frags, hole_frags)
    assert len(polys) == 1 and len(polys[0]) == 2
    assert _planar_area(polys) == pytest.approx(100.0 - 16.0)


def test_7xx_figure8_outer_splits_at_shared_vertex():
    """A closed way whose ring touches itself at one vertex (figure-8): the
    segment walk splits it into two rings sharing the vertex — two polygons
    touching at a common node (valid, same class as mod/706)."""
    fig8 = [
        (0, 0), (2, 0), (1, 1), (2, 2), (0, 2), (1, 1), (0, 0),
    ]
    kind, polys = build_multipolygon([fig8], [])
    assert len(polys) == 2
    assert _planar_area(polys) == pytest.approx(1.0 + 1.0)


def test_7xx_repeated_interior_vertex_invalid():
    """A ring revisiting an interior vertex without closing (spike through a
    repeated node, odd parity at the spike tip) → error ⇒ empty geometry."""
    bad = [(0, 0), (2, 0), (2, 2), (1, 0), (0, 2), (0, 0)]
    # edge (2,2)-(1,0) crosses (0,2)-(0,0)? No — but (2,0)->(2,2)->(1,0)
    # creates a proper crossing with (1,0)->(0,2) against the base edge
    with pytest.raises(MultiPolygonBuildError):
        build_multipolygon([bad], [])


def test_outer_vertex_noded_overlap_mutual_difference():
    """Two outers overlapping through SHARED VERTICES only (the MultiPoint
    intersection class): the reference shaves both with mutual differences
    (handleIntersectingAndTouchingPolygons:141-149) — the overlap lens
    belongs to NEITHER afterwards."""
    a = [(0, 0), (4, 0), (4, 2), (4, 4), (2, 4), (0, 4), (0, 0)]
    b = [(2, 2), (4, 2), (6, 2), (6, 6), (2, 6), (2, 4), (2, 2)]
    kind, polys = build_multipolygon([a, b], [])
    assert len(polys) == 2
    # 16 + 16 minus the [2,4]² lens removed from BOTH = 24
    assert _planar_area(polys) == pytest.approx(24.0)


def test_inner_vertex_noded_overlap_mutual_difference():
    """Same repair for inner rings: overlapping vertex-noded holes are
    mutually shaved, then carved via the difference path — the lens stays
    part of the polygon (it is inside neither shaved hole)."""
    outer = [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]
    h_a = [(1, 1), (5, 1), (5, 3), (5, 5), (3, 5), (1, 5), (1, 1)]
    h_b = [(3, 3), (5, 3), (7, 3), (7, 7), (3, 7), (3, 5), (3, 3)]
    kind, polys = build_multipolygon([outer], [h_a, h_b])
    assert _planar_area(polys) == pytest.approx(100.0 - 12.0 - 12.0)


def test_hole_sharing_boundary_edges_with_shell_carved():
    """An inner notched into the shell's corner shares two collinear
    boundary runs with the outer (intersection = LineString): the difference
    repair erases the coincident opposite edge pairs and the hole merges
    into the exterior — JTS `outerPoly.difference(innerPoly)` semantics
    (`GeometryBuilder.java:87-105`), same class as mod/756."""
    big = [(0, 0), (8, 0), (8, 8), (0, 8), (0, 0)]
    corner = [(0, 0), (2, 0), (2, 2), (0, 2), (0, 0)]
    exp = mp_from_wkt("MULTIPOLYGON(((2 0,8 0,8 8,0 8,0 2,2 2,2 0)))")
    # inner role, and the same ring arriving with role outer (nesting makes
    # it a hole first), must both carve identically
    assert norm_mp(build_multipolygon([big], [corner])) == exp
    assert norm_mp(build_multipolygon([big, list(corner)], [])) == exp


def test_hole_notched_into_shell_edge_interior():
    """A hole sharing one boundary run strictly inside a shell edge (no
    shared shell vertex at all): carved into a notch — the inner-vs-outer
    difference path has no common-node requirement."""
    big = [(0, 0), (8, 0), (8, 8), (0, 8), (0, 0)]
    notch = [(3, 0), (5, 0), (5, 2), (3, 2), (3, 0)]
    exp = mp_from_wkt("MULTIPOLYGON(((0 0,3 0,3 2,5 2,5 0,8 0,8 8,0 8,0 0)))")
    assert norm_mp(build_multipolygon([big], [notch])) == exp


def test_outers_touching_at_two_isolated_nodes_both_kept():
    """Two outers whose rings touch at exactly two isolated common vertices
    with disjoint interiors: vertex-noded MultiPoint whose polygon
    intersection is the same MultiPoint — allowed, both polygons survive
    unshaved (`handleIntersectingAndTouchingPolygons:137-141` continue)."""
    a = [(0, 0), (2, 1), (4, 0), (4, 3), (0, 3), (0, 0)]
    b = [(0, 0), (2, -0.5), (4, 0), (4, -3), (0, -3), (0, 0)]
    kind, polys = build_multipolygon([a, b], [])
    assert len(polys) == 2
    assert _planar_area(polys) == pytest.approx(10.0 + 11.0)


def test_inners_touching_at_two_isolated_nodes_frame_survives():
    """Same pair as HOLES: the enclosed pocket between the two chains stays
    covered exactly once — the frame face must survive even though every
    fan-centroid sample candidate lands inside a hole (regression: the
    frame was dropped and only the pocket face came back). Total covered
    area equals the JTS difference (48 − 10 − 11 = 27); the pocket lives
    implicitly in shell-minus-holes (documented ring-grouping deviation)."""
    a = [(0, 0), (2, 1), (4, 0), (4, 3), (0, 3), (0, 0)]
    b = [(0, 0), (2, -0.5), (4, 0), (4, -3), (0, -3), (0, 0)]
    big = [(-1, -4), (5, -4), (5, 4), (-1, 4), (-1, -4)]
    kind, polys = build_multipolygon([big], [list(a), list(b)])
    assert _planar_area(polys) == pytest.approx(48.0 - 10.0 - 11.0)


def test_randomized_boundary_notches_area_invariant():
    """Fuzz the coincident-edge cancellation: a big square with random
    non-overlapping axis-aligned notches riding ON the bottom boundary plus
    random interior holes. Every arrangement must carve to exactly
    big − Σ(holes) of covered area (JTS difference semantics), with no
    trace/validity errors."""
    import random

    rng = random.Random(20260816)
    for trial in range(25):
        big = [(0.0, 0.0), (100.0, 0.0), (100.0, 50.0), (0.0, 50.0), (0.0, 0.0)]
        inners = []
        expected = 100.0 * 50.0
        # boundary notches: disjoint intervals along the bottom edge
        xs = sorted(rng.sample(range(1, 99), rng.randint(1, 4) * 2))
        for a, b in zip(xs[::2], xs[1::2]):
            h = float(rng.randint(1, 10))
            inners.append([(float(a), 0.0), (float(b), 0.0),
                           (float(b), h), (float(a), h), (float(a), 0.0)])
            expected -= (b - a) * h
        # strictly interior holes on a disjoint grid band (y 20..45)
        for k in range(rng.randint(0, 3)):
            x0 = 5.0 + 25.0 * k
            w, h = float(rng.randint(2, 10)), float(rng.randint(2, 10))
            y0 = float(rng.randint(20, 34))
            inners.append([(x0, y0), (x0 + w, y0), (x0 + w, y0 + h),
                           (x0, y0 + h), (x0, y0)])
            expected -= w * h
        kind, polys = build_multipolygon([list(big)], inners)
        assert _planar_area(polys) == pytest.approx(expected), (
            f"trial {trial}: {inners}")


@pytest.mark.parametrize("name,inners,expected", [
    ("adjacent_same_height",
     [[(2, 0), (5, 0), (5, 3), (2, 3), (2, 0)],
      [(5, 0), (8, 0), (8, 3), (5, 3), (5, 0)]], 200 - 9 - 9),
    ("adjacent_diff_height",
     [[(2, 0), (5, 0), (5, 4), (2, 4), (2, 0)],
      [(5, 0), (8, 0), (8, 2), (5, 2), (5, 0)]], 200 - 12 - 6),
    ("notch_plus_touching_hole",
     [[(2, 0), (5, 0), (5, 3), (2, 3), (2, 0)],
      [(3, 3), (4, 3), (4, 5), (3, 5), (3, 3)]], 200 - 9 - 2),
    ("stacked_on_notch",
     [[(2, 0), (5, 0), (5, 3), (2, 3), (2, 0)],
      [(2, 3), (5, 3), (5, 6), (2, 6), (2, 3)]], 200 - 9 - 9),
])
def test_compound_notch_classes(name, inners, expected):
    """Interacting hole arrangements on/near the shell boundary: adjacent
    notches sharing a boundary vertex (equal and unequal heights → partial
    collinear overlap between the holes), a hole point-touching a notch
    top, and a hole stacked edge-on-edge on a notch. All merge/carve to the
    exact covered area (inner-union + coincident-edge cancellation
    composing correctly)."""
    big = [(0, 0), (20, 0), (20, 10), (0, 10), (0, 0)]
    kind, polys = build_multipolygon([list(big)], [list(map(tuple, r)) for r in inners])
    assert _planar_area(polys) == pytest.approx(expected)


# --- round 4: residual-closure goldens + further 7xx-class families ---------


def test_7xx_two_c_pocket_identical_segments_island():
    """Two interlocking C-shaped inners whose shared boundary arrives as
    IDENTICAL 2-node segments: the segment layer dedups them
    (`splitWays` segment HashSet + `NodeSegments.add` dup tracking +
    `filterOutRedundantSegments` at the odd-degree junctions,
    NodeSegments.java:11-59), so ring assembly yields the combined square
    plus the enclosed pocket as SEPARATE rings and area-desc nesting makes
    the pocket an explicit ISLAND polygon. Ring-structure golden (not just
    moments) — this is the reference's grouping on this input class; the
    JTS union/getExteriorRing path is never reached here."""
    outer = [(0, 0), (20, 0), (20, 20), (0, 20), (0, 0)]
    c1 = [(4, 4), (10, 4), (10, 6), (6, 6), (6, 14), (10, 14), (10, 16),
          (4, 16), (4, 4)]
    c2 = [(10, 4), (16, 4), (16, 16), (10, 16), (10, 14), (14, 14), (14, 6),
          (10, 6), (10, 4)]
    got = norm_mp(build_multipolygon([outer], [c1, c2]))
    exp = mp_from_wkt(
        "MULTIPOLYGON(((0 0,20 0,20 20,0 20,0 0),"
        "(4 4,10 4,16 4,16 16,10 16,4 16,4 4)),"
        "((6 6,10 6,14 6,14 14,10 14,6 14,6 6)))"
    )
    assert got == exp


def test_7xx_two_c_pocket_partial_edges_union_drops_pocket():
    """Same pocket topology but the shared boundary runs are PARTIAL edge
    overlaps (no shared 2-node segments, no shared vertices): segments stay
    distinct, both C rings assemble whole, nesting sees two same-shell
    inners with a line intersection → the union branch
    (`handleIntersectingAndTouchingPolygons:146-156` mergeTouching) fires
    and `getExteriorRing()` keeps ONLY the union shell as the hole — the
    enclosed pocket is dropped from the result entirely. Structure golden
    for the union-path grouping (pocket NOT an island here)."""
    outer = [(0, 0), (20, 0), (20, 20), (0, 20), (0, 0)]
    c1 = [(4, 4), (10, 4), (10, 6), (6, 6), (6, 14), (10, 14), (10, 16),
          (4, 16), (4, 4)]
    c2 = [(10, 5), (16, 5), (16, 15), (10, 15), (10, 13), (14, 13), (14, 7),
          (10, 7), (10, 5)]
    kind, polys = build_multipolygon([outer], [c1, c2])
    assert len(polys) == 1 and len(polys[0]) == 2  # shell + ONE hole, no island
    hole = polys[0][1]
    xs = [p[0] for p in hole]
    ys = [p[1] for p in hole]
    assert (min(xs), min(ys), max(xs), max(ys)) == (4.0, 4.0, 16.0, 16.0)


def test_contained_inner_sharing_run_with_containing_inner_is_island():
    """An inner wholly inside another inner while sharing part of its
    boundary run: the reference's nesting (`buildMultiPolygon:33-49`,
    `prevPoly.contains(currPoly)` with isInner alternation) makes it an
    ISLAND polygon — no union, no error. Grouping golden."""
    shell = [(0, 0), (20, 0), (20, 20), (0, 20), (0, 0)]
    a = [(2, 2), (10, 2), (10, 10), (2, 10), (2, 2)]
    b = [(3, 2), (7, 2), (7, 6), (3, 6), (3, 2)]
    kind, polys = build_multipolygon([shell], [a, b])
    assert len(polys) == 2
    assert sorted(len(p) for p in polys) == [1, 2]
    assert _planar_area(polys) == pytest.approx(400.0 - 64.0 + 16.0)


def test_mixed_intersection_fallthrough_keeps_overlapping_holes():
    """Interior-overlapping inners sharing a boundary run AND crossing
    transversally at a non-vertex: JTS reports the ring intersection as a
    GeometryCollection, which matches NEITHER instanceof branch of
    `handleIntersectingAndTouchingPolygons` — the reference SKIPS the pair
    silently and emits the polygon with both overlapping holes (an invalid
    multipolygon, stored as-is). The build now mirrors that fall-through
    instead of erroring. This closes the former 'interior-overlapping
    same-direction boundary sharing stays an error' docstring caveat."""
    shell = [(0, 0), (20, 0), (20, 20), (0, 20), (0, 0)]
    a = [(2, 2), (8, 2), (8, 8), (2, 8), (2, 2)]
    b = [(5, 2), (12, 2), (12, 6), (5, 6), (5, 2)]
    kind, polys = build_multipolygon([shell], [a, b])
    assert len(polys) == 1 and len(polys[0]) == 3  # shell + BOTH holes, verbatim
    holes = {norm_ring(r) for r in polys[0][1:]}
    assert holes == {
        norm_ring([(2, 2), (5, 2), (8, 2), (8, 8), (2, 8), (2, 2)]),
        norm_ring([(5, 2), (8, 2), (12, 2), (12, 6), (5, 6), (5, 2)]),
    }


def test_7xx_inner_role_outside_outer_salvaged_as_polygon():
    """Role-mismatch salvage: an inner-role ring DISJOINT from every outer
    is its own polygon (roles ignored, area-desc nesting only)."""
    a = [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]
    stray = [(20, 20), (24, 20), (24, 24), (20, 24), (20, 20)]
    kind, polys = build_multipolygon([a], [stray])
    assert len(polys) == 2
    assert _planar_area(polys) == pytest.approx(100.0 + 16.0)


def test_7xx_duplicate_way_deduped():
    """The same closed way appearing twice (duplicate member): `splitWays`
    dedups ways by coordinate SET (`GeometryBuilder.java:225-233`) — one
    polygon, not a parity error."""
    ring = [(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)]
    kind, polys = build_multipolygon([ring, list(ring)], [])
    assert len(polys) == 1
    assert _planar_area(polys) == pytest.approx(16.0)


def test_7xx_dangling_chain_parity_error_and_legacy_salvage():
    """A closed square plus an open dangling chain from another way: DEFAULT
    mode fails parity (odd degrees at the chain ends); LEGACY mode removes
    the mismatched single-way segments (`removeMismatchedSegments:105-135`)
    and salvages the square."""
    square = [(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)]
    dangle = [(4, 4), (6, 6), (8, 6)]
    with pytest.raises(MultiPolygonBuildError):
        build_multipolygon([square, dangle], [])
    kind, polys = build_multipolygon([square, dangle], [], mode="legacy")
    assert len(polys) == 1
    assert _planar_area(polys) == pytest.approx(16.0)


def test_7xx_hole_touching_outer_at_single_node():
    """Inner sharing exactly one vertex with the outer: Point-class
    intersection — allowed, plain hole (no difference repair)."""
    outer = [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]
    hole = [(0, 0), (4, 2), (2, 4), (0, 0)]
    kind, polys = build_multipolygon([outer], [hole])
    assert len(polys) == 1 and len(polys[0]) == 2
    assert _planar_area(polys) == pytest.approx(100.0 - 6.0)


# --- round-5 grid-7xx-class additions (VERDICT r4 item 6) -------------------


def test_7xx_touching_inners_enclose_pocket_union_semantics():
    """714-class: four rectangular inners touching edge-to-edge form a frame
    enclosing a center pocket. The engine unions touching inners and carves
    the union's EXTERIOR ring — the enclosed pocket is swallowed by the
    hole (same doctrine as test_7xx_two_c_pocket_partial_edges_union_drops_
    pocket): one polygon, one hole ring (1,1)-(9,9), area 100-64."""
    outer = [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]
    left = [(1, 1), (3, 1), (3, 9), (1, 9), (1, 1)]
    right = [(7, 1), (9, 1), (9, 9), (7, 9), (7, 1)]
    top = [(3, 7), (7, 7), (7, 9), (3, 9), (3, 7)]
    bot = [(3, 1), (7, 1), (7, 3), (3, 3), (3, 1)]
    kind, polys = build_multipolygon([outer], [left, right, top, bot])
    assert len(polys) == 1 and len(polys[0]) == 2
    assert _planar_area(polys) == pytest.approx(100.0 - 64.0)


def test_7xx_self_crossing_ring_error():
    """744-class: a bowtie ring with a PROPER edge crossing (no shared
    vertex, unlike the valid figure-8 split) → error ⇒ empty geometry."""
    bow = [(0, 0), (4, 4), (4, 0), (0, 4), (0, 0)]
    with pytest.raises(MultiPolygonBuildError):
        build_multipolygon([bow], [])


def test_7xx_two_disjoint_outers_each_with_own_hole():
    """707-class: two disjoint outer rings, each containing its own inner —
    hole assignment is per-containing-outer, never cross-polygon."""
    o1 = [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]
    h1 = [(2, 2), (4, 2), (4, 4), (2, 4), (2, 2)]
    o2 = [(20, 0), (30, 0), (30, 10), (20, 10), (20, 0)]
    h2 = [(22, 2), (26, 2), (26, 6), (22, 6), (22, 2)]
    kind, polys = build_multipolygon([o1, o2], [h1, h2])
    assert len(polys) == 2
    assert sorted(len(p) for p in polys) == [2, 2]
    assert _planar_area(polys) == pytest.approx((100 - 4) + (100 - 16))


def test_7xx_outer_from_two_open_ways_one_reversed():
    """705-class: the outer ring assembled from exactly two open ways whose
    stored directions disagree — the walk must stitch tail-to-tail."""
    w1 = [(0, 0), (10, 0), (10, 10)]
    w2 = [(0, 0), (0, 10), (10, 10)]
    kind, polys = build_multipolygon([w1, w2], [])
    assert len(polys) == 1 and len(polys[0]) == 1
    assert _planar_area(polys) == pytest.approx(100.0)


def test_7xx_inner_ring_spike_removed():
    """743-class applied to an INNER ring: the doubling-back spike on the
    hole boundary is dropped and the remaining 4x4 hole carves cleanly."""
    outer = [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]
    spiked = [(2, 2), (6, 2), (6, 4), (8, 4), (6, 4), (6, 6), (2, 6), (2, 2)]
    kind, polys = build_multipolygon([outer], [spiked])
    assert len(polys) == 1 and len(polys[0]) == 2
    assert _planar_area(polys) == pytest.approx(100.0 - 16.0)


def test_7xx_degenerate_two_point_ring_empty():
    """A 'closed way' with zero enclosed area (A-B-A) contributes no ring:
    the result is the EMPTY multipolygon, not an error — degenerate members
    are filtered before ring assembly."""
    kind, polys = build_multipolygon([[(0, 0), (5, 5), (0, 0)]], [])
    assert polys == []
