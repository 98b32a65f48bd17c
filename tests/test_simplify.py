"""Douglas–Peucker simplification (functions/simplify.py)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ohsome_planet_spark.functions.simplify import douglas_peucker


def test_golden_classic():
    # the textbook example: a zigzag where only the big excursion survives
    line = np.array([
        [0.0, 0.0], [1.0, 0.1], [2.0, -0.1], [3.0, 5.0],
        [4.0, 6.0], [5.0, 7.0], [6.0, 8.1], [7.0, 9.0], [8.0, 9.0],
        [9.0, 9.0],
    ])
    out = douglas_peucker(line, 1.0)
    assert [list(p) for p in out] == [
        [0.0, 0.0], [2.0, -0.1], [3.0, 5.0], [7.0, 9.0], [9.0, 9.0]]


def test_straight_line_collapses_to_endpoints():
    line = np.stack([np.arange(100.0), 2 * np.arange(100.0)], axis=1)
    out = douglas_peucker(line, 1e-9)
    assert len(out) == 2
    assert (out[0] == line[0]).all() and (out[-1] == line[-1]).all()


def _max_deviation(orig, simp):
    """max distance from any original vertex to the simplified polyline."""
    def seg_dist(p, a, b):
        d = b - a
        L2 = d @ d
        if L2 == 0:
            return float(np.hypot(*(p - a)))
        t = max(0.0, min(1.0, float((p - a) @ d / L2)))
        return float(np.hypot(*(p - (a + t * d))))

    worst = 0.0
    for p in orig:
        best = min(seg_dist(p, simp[i], simp[i + 1])
                   for i in range(len(simp) - 1))
        worst = max(worst, best)
    return worst


coords = st.lists(
    st.tuples(st.floats(-100, 100, allow_nan=False).map(lambda x: round(x, 3)),
              st.floats(-100, 100, allow_nan=False).map(lambda x: round(x, 3))),
    min_size=2, max_size=40)


@settings(max_examples=150, deadline=None)
@given(coords, st.floats(0.01, 10.0))
def test_dp_properties(pts, eps):
    orig = np.asarray(pts, np.float64)
    out = douglas_peucker(orig, eps)
    # endpoints preserved, output is a subsequence of the input
    assert (out[0] == orig[0]).all() and (out[-1] == orig[-1]).all()
    idx = 0
    for p in out:
        while idx < len(orig) and not (orig[idx] == p).all():
            idx += 1
        assert idx < len(orig)
        idx += 1
    # bounded deviation (DP guarantees eps w.r.t. split segments; the
    # standard bound for vertex-to-result distance is eps as well)
    assert _max_deviation(orig, out) <= eps + 1e-9
    # idempotent
    again = douglas_peucker(out, eps)
    assert len(again) == len(out) and (again == out).all()


def test_simplify_lines_spark(spark):
    from pyspark.sql import functions as F

    from ohsome_planet_spark.functions.simplify import simplify_lines
    from ohsome_planet_spark.functions.wkb import wkb_dumps, wkb_loads

    zig = np.array([[0.0, 0.0], [1.0, 0.01], [2.0, 0.0], [3.0, 4.0]])
    pt = wkb_dumps(("Point", np.array([1.0, 2.0])))
    df = spark.createDataFrame(
        [(1, bytearray(wkb_dumps(("LineString", zig)))),
         (2, bytearray(pt)), (3, None)],
        "id long, geometry binary")
    out = {r["id"]: r["geometry"]
           for r in simplify_lines(df, 0.1).collect()}
    typ, data = wkb_loads(bytes(out[1]))
    assert typ == "LineString" and len(data) == 3  # middle zig dropped
    assert bytes(out[2]) == bytes(pt)  # non-linestring untouched
    assert out[3] is None


# --- session-2 additions: mask twin + coordinate-array op -------------------


def test_mask_matches_coords_kernel():
    from ohsome_planet_spark.functions.simplify import douglas_peucker_mask
    import hashlib

    def h(p, i):
        return int(hashlib.md5(f"{p}{i}".encode()).hexdigest()[:8], 16)

    for trial in range(4):
        n = 30 + 13 * trial
        x = np.array([h(f"x{trial}", i) % 1000 / 10.0 for i in range(n)])
        y = np.array([h(f"y{trial}", i) % 1000 / 10.0 for i in range(n)])
        for eps in (0.5, 5.0, 25.0):
            via_mask = np.column_stack([x, y])[
                douglas_peucker_mask(x, y, eps)]
            via_coords = douglas_peucker(np.column_stack([x, y]), eps)
            assert (via_mask == via_coords).all(), (trial, eps)


def test_overshoot_double_back_survives():
    from ohsome_planet_spark.functions.simplify import douglas_peucker_mask

    # the segment-vs-line distinction: a path overshooting the endpoint
    # and doubling back hugs the infinite LINE but is far from the SEGMENT
    x = np.array([0.0, 10.0, 5.0])
    y = np.array([0.0, 0.001, 0.0])
    assert douglas_peucker_mask(x, y, 1.0).all()


def test_simplify_coord_arrays(spark):
    from ohsome_planet_spark.functions.simplify import simplify_coord_arrays

    rows = [
        (1, [0.0, 1.0, 2.0, 3.0], [0.0, 0.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 2.0], [0.0, 5.0, 0.0]),
        (3, [7.0], [7.0]),
    ]
    df = spark.createDataFrame(
        rows, "way_id long, lons array<double>, lats array<double>")
    out = {r["way_id"]: r for r in
           simplify_coord_arrays(df, tolerance=0.5).collect()}
    assert out[1]["n_after"] == 2 and out[1]["lons"] == [0.0, 3.0]
    assert out[2]["n_after"] == 3
    assert out[3]["n_after"] == 1 and out[3]["n_before"] == 1


def test_epsilon_for_zoom_ladder():
    from ohsome_planet_spark.functions.simplify import epsilon_for_zoom

    # one pixel at z over 256-px tiles; halves per zoom step
    assert epsilon_for_zoom(0) == 360.0 / 256.0
    assert epsilon_for_zoom(8) == 360.0 / (256 * 256.0)
    assert epsilon_for_zoom(9) == epsilon_for_zoom(8) / 2
    assert epsilon_for_zoom(8, px_tolerance=2.0) == 2 * epsilon_for_zoom(8)


def test_simplify_for_zoom_wkb(spark):
    from ohsome_planet_spark.functions.simplify import simplify_for_zoom
    from ohsome_planet_spark.functions.wkb import wkb_dumps, wkb_loads

    # ±0.01° wiggles: dropped at z=2 (pixel 0.35°), kept at z=12
    zig = np.array([[float(i), 0.01 * (-1) ** i] for i in range(8)])
    df = spark.createDataFrame(
        [(1, bytearray(wkb_dumps(("LineString", zig))))],
        "id long, geometry binary")
    coarse = wkb_loads(bytes(simplify_for_zoom(df, 2).first()["geometry"]))
    fine = wkb_loads(bytes(simplify_for_zoom(df, 12).first()["geometry"]))
    assert len(coarse[1]) == 2
    assert len(fine[1]) > 2


def test_coord_arrays_null_geometry(spark):
    from ohsome_planet_spark.functions.simplify import simplify_coord_arrays

    df = spark.createDataFrame(
        [(1, [0.0, 1.0, 2.0], [0.0, 5.0, 0.0]), (2, None, None)],
        "way_id long, lons array<double>, lats array<double>")
    out = {r["way_id"]: r for r in
           simplify_coord_arrays(df, tolerance=0.5).collect()}
    assert out[2]["lons"] is None and out[2]["n_before"] == 0
    assert out[1]["n_after"] == 3
