"""Getis–Ord Gi* hotspot detection (operators/hotspot.py)."""

import math

import pytest

from ohsome_planet_spark.operators.hotspot import getis_ord_gi


def _cells(spark, z, rows):
    mk = lambda x, y: z * (1 << 58) + (x << 29) + y
    data = [(mk(x, y), n) for x, y, n in rows]
    return spark.createDataFrame(data, "cell long, n long")


def test_gi_star_closed_form(spark):
    # 5 occupied cells: a hot pair at (10,10),(10,11) and cold singles
    z = 6
    rows = [(10, 10, 100), (10, 11, 90), (30, 30, 1), (40, 5, 2),
            (50, 50, 3)]
    df = _cells(spark, z, rows)
    out = {r["cell"]: r for r in getis_ord_gi(df, z=z).collect()}
    mk = lambda x, y: z * (1 << 58) + (x << 29) + y

    # python replay of the exact formula
    xs = [n for _, _, n in rows]
    N, sx, sxx = len(xs), sum(xs), sum(v * v for v in xs)
    xbar = sx / N
    s = math.sqrt(sxx / N - xbar * xbar)

    def gi(s1, k):
        return round((s1 - xbar * k)
                     / (s * math.sqrt((N * k - k * k) / (N - 1.0))), 9)

    hot = out[mk(10, 10)]
    assert (hot["x"], hot["k"], hot["s1"]) == (100, 2, 190)
    assert hot["gi_z"] == pytest.approx(gi(190, 2), abs=1e-9)
    assert hot["gi_z"] > 1.0
    cold = out[mk(30, 30)]
    assert (cold["k"], cold["s1"]) == (1, 1)
    assert cold["gi_z"] < 0
    assert len(out) == 5


def test_gi_star_degenerate_null(spark):
    z = 4
    # constant surface: S = 0 -> NULL everywhere
    df = _cells(spark, z, [(1, 1, 5), (8, 8, 5)])
    out = getis_ord_gi(df, z=z).collect()
    assert all(r["gi_z"] is None for r in out)
    # k == N (adjacent cells, whole universe in one block) -> NULL too
    df2 = _cells(spark, z, [(4, 4, 1), (4, 5, 9)])
    out2 = getis_ord_gi(df2, z=z).collect()
    assert all(r["gi_z"] is None for r in out2)


def test_gi_star_wraps_longitude(spark):
    z = 3  # 8x8 grid: x=0 and x=7 are neighbors
    df = _cells(spark, z, [(0, 4, 10), (7, 4, 20), (3, 1, 1)])
    out = {r["x"]: r for r in getis_ord_gi(df, z=z).collect()}
    assert out[10]["k"] == 2 and out[10]["s1"] == 30
    assert out[20]["k"] == 2 and out[20]["s1"] == 30
    assert out[1]["k"] == 1


def test_local_morans_closed_form(spark):
    from ohsome_planet_spark.operators.hotspot import local_morans_i

    z = 6
    rows = [(10, 10, 100), (10, 11, 90), (30, 30, 1), (40, 5, 2),
            (50, 50, 3)]
    df = _cells(spark, z, rows)
    out = {r["cell"]: r for r in local_morans_i(df, z=z).collect()}
    mk = lambda x, y: z * (1 << 58) + (x << 29) + y

    xs = [n for _, _, n in rows]
    N, sx, sxx = len(xs), sum(xs), sum(v * v for v in xs)
    xbar = sx / N
    m2 = sxx / N - xbar * xbar

    def moran(x, s1, k):
        lag = (s1 - x) - (k - 1) * xbar
        return round((x - xbar) / m2 * lag, 9)

    hot = out[mk(10, 10)]
    assert hot["moran_i"] == pytest.approx(moran(100, 190, 2), abs=1e-9)
    assert hot["quadrant"] == "HH"      # high value, high neighbor
    iso = out[mk(30, 30)]
    assert iso["moran_i"] is None and iso["quadrant"] == "NS"  # no nbrs


def test_local_morans_outlier_quadrants(spark):
    from ohsome_planet_spark.operators.hotspot import local_morans_i

    z = 6
    # a low cell surrounded by a high one (and vice versa) + two far
    # middling cells to anchor the mean between them
    rows = [(10, 10, 100), (10, 11, 1), (40, 40, 25), (50, 50, 26)]
    df = _cells(spark, z, rows)
    out = {r["x"]: r for r in local_morans_i(df, z=z).collect()}
    assert out[100]["quadrant"] == "HL"  # high among low
    assert out[1]["quadrant"] == "LH"    # low among high


def test_local_morans_degenerate_null(spark):
    from ohsome_planet_spark.operators.hotspot import local_morans_i

    z = 4
    df = _cells(spark, z, [(1, 1, 5), (1, 2, 5), (8, 8, 5)])
    out = local_morans_i(df, z=z).collect()
    assert all(r["moran_i"] is None for r in out)  # constant surface
