"""Douglas–Peucker simplification (functions/simplify.py)."""

import numpy as np
import pytest

from ohsome_planet_spark.functions.simplify import (
    douglas_peucker_mask,
    simplify_lines,
)


def _ref_dp(x, y, tol):
    """Plain recursive reference implementation (segment-clamped)."""
    def d2_line(i, j, k):
        dx, dy = x[j] - x[i], y[j] - y[i]
        l2 = dx * dx + dy * dy
        if l2 == 0.0:
            return (x[k] - x[i]) ** 2 + (y[k] - y[i]) ** 2
        t = min(1.0, max(0.0, ((x[k] - x[i]) * dx + (y[k] - y[i]) * dy) / l2))
        ex = x[k] - x[i] - t * dx
        ey = y[k] - y[i] - t * dy
        return ex * ex + ey * ey

    keep = set()

    def rec(i, j):
        keep.add(i)
        keep.add(j)
        if j <= i + 1:
            return
        ks = list(range(i + 1, j))
        dk = [d2_line(i, j, k) for k in ks]
        m = int(np.argmax(dk))
        if dk[m] > tol * tol:
            rec(i, ks[m])
            rec(ks[m], j)

    rec(0, len(x) - 1)
    return sorted(keep)


def test_straight_line_collapses():
    x = np.arange(10, dtype=float)
    y = np.zeros(10)
    m = douglas_peucker_mask(x, y, 0.01)
    assert m.sum() == 2 and m[0] and m[-1]


def test_spike_survives():
    x = np.array([0.0, 1.0, 2.0, 3.0, 4.0])
    y = np.array([0.0, 0.0, 5.0, 0.0, 0.0])
    m = douglas_peucker_mask(x, y, 1.0)
    assert m[2]                       # the spike
    assert m.sum() == 3 or m.sum() == 5  # spike splits spans


def test_matches_recursive_reference():
    import hashlib

    def h(i, p):
        return int(hashlib.md5(f"{p}{i}".encode()).hexdigest()[:8], 16)

    for trial in range(5):
        n = 40 + trial * 17
        x = np.array([h(i, f"x{trial}") % 1000 / 10.0 for i in range(n)])
        y = np.array([h(i, f"y{trial}") % 1000 / 10.0 for i in range(n)])
        for tol in (0.5, 5.0, 25.0):
            got = list(np.flatnonzero(
                douglas_peucker_mask(x, y, tol)))
            assert got == _ref_dp(x, y, tol), (trial, tol)


def test_overshoot_double_back_survives():
    # the segment-vs-line distinction: a path overshooting the endpoint
    # and doubling back hugs the infinite LINE (line distance 0) but is
    # far from the SEGMENT — it must survive simplification
    x = np.array([0.0, 10.0, 5.0])
    y = np.array([0.0, 0.001, 0.0])
    m = douglas_peucker_mask(x, y, 1.0)
    assert m.all()


def test_for_zoom_ladder(spark):
    from ohsome_planet_spark.functions.simplify import simplify_for_zoom

    # wiggles of ~0.01 deg: invisible at z=2 (pixel 0.35 deg), visible
    # at z=12 (pixel 0.00034 deg)
    lons = [float(i) for i in range(8)]
    lats = [0.0, 0.01, 0.0, -0.01, 0.0, 0.01, 0.0, -0.01]
    df = spark.createDataFrame(
        [(1, lons, lats)], "way_id long, lons array<double>, lats array<double>")
    coarse = simplify_for_zoom(df, zoom=2).first()
    fine = simplify_for_zoom(df, zoom=12).first()
    assert coarse["n_after"] == 2
    # the ±0.01 peaks all survive at z=12 (the exact zero-crossing
    # points lie ON the peak-to-peak segments and drop legitimately)
    assert fine["n_after"] == 5


def test_idempotent():
    x = np.array([0.0, 1.0, 2.1, 3.0, 4.0, 5.5, 6.0])
    y = np.array([0.0, 0.4, -0.2, 0.9, 0.0, 0.3, 0.0])
    m1 = douglas_peucker_mask(x, y, 0.35)
    x2, y2 = x[m1], y[m1]
    m2 = douglas_peucker_mask(x2, y2, 0.35)
    assert m2.all()


def test_closed_ring_degenerate_endpoints():
    # first == last: span distances fall back to point distance
    x = np.array([0.0, 2.0, 2.0, 0.0, 0.0])
    y = np.array([0.0, 0.0, 2.0, 2.0, 0.0])
    m = douglas_peucker_mask(x, y, 0.5)
    assert m.sum() == 5 - 0  # every corner of a square survives


def test_spark_wrapper(spark):
    rows = [
        (1, [0.0, 1.0, 2.0, 3.0], [0.0, 0.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 2.0], [0.0, 5.0, 0.0]),
        (3, [7.0], [7.0]),
    ]
    df = spark.createDataFrame(
        rows, "way_id long, lons array<double>, lats array<double>")
    out = {r["way_id"]: r for r in
           simplify_lines(df, tolerance=0.5).collect()}
    assert out[1]["n_after"] == 2 and out[1]["lons"] == [0.0, 3.0]
    assert out[2]["n_after"] == 3          # the spike survives
    assert out[3]["n_after"] == 1 and out[3]["n_before"] == 1
