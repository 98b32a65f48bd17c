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


def test_emerging_hotspots_categories(spark):
    from datetime import datetime, timedelta

    from ohsome_planet_spark.operators.hotspot import emerging_hotspots

    z = 6
    # three spatial sites; activity over 3 daily bins:
    #  A (10,10): grows hot only in the last bin            -> new
    #  B (30,30): hot in every bin                          -> persistent/intensifying
    #  C (50,50): background singles (never hot)            -> none
    t0 = datetime(2020, 1, 1)
    rows = []
    pid = 0

    def burst(x, y, day, n):
        nonlocal pid
        lon = x * 360.0 / 64 - 180.0 + 0.01
        lat = 90.0 - y * 180.0 / 64 - 0.01
        for _ in range(n):
            rows.append((pid, t0 + timedelta(days=day, seconds=pid % 600),
                         lon, lat))
            pid += 1

    # 16 heterogeneous background sites (single-spike z is bounded by
    # sqrt(N-1), and simultaneous spikes suppress each other — the
    # universe must be big enough for two hot cells at once)
    bg_sites = [(4 + 3 * i, 60 - 3 * i) for i in range(16)]
    for day in (0, 1, 2):
        burst(30, 30, day, 40)            # B: always hot
        burst(50, 50, day, 1)             # C: background
        for i, (bx, by) in enumerate(bg_sites):
            burst(bx, by, day, 1 + i % 4)
    burst(10, 10, 2, 35)                  # A: bursts only on the last day

    df = spark.createDataFrame(
        rows, "pid long, ts timestamp_ntz, lon double, lat double")
    out = {r["cell"]: r for r in emerging_hotspots(
        df, z=z, bin_seconds=86400, origin="2020-01-01 00:00:00").collect()}
    mk = lambda x, y: z * (1 << 58) + (x << 29) + y
    a, b, c = out[mk(10, 10)], out[mk(30, 30)], out[mk(50, 50)]
    assert a["category"] == "new" and a["n_hot"] == 1 and a["last_hot"]
    assert b["category"] in ("persistent", "intensifying", "diminishing")
    assert b["n_hot"] == b["n_bins"] == 3
    assert c["category"] == "none" and not c["last_hot"]


def test_emerging_mk_trend_sign(spark):
    from datetime import datetime, timedelta

    from ohsome_planet_spark.operators.hotspot import emerging_hotspots

    z, t0 = 6, datetime(2020, 1, 1)
    rows = []
    pid = 0

    def at(x, y, day, n):
        nonlocal pid
        lon = x * 360.0 / 64 - 180.0 + 0.01
        lat = 90.0 - y * 180.0 / 64 - 0.01
        for _ in range(n):
            rows.append((pid, t0 + timedelta(days=day, seconds=pid % 600),
                         lon, lat))
            pid += 1

    # site ramps 20 -> 40 -> 80 against a fixed heterogeneous background:
    # its standardized spike (hence gi_z) rises monotonically
    for day, n in ((0, 20), (1, 40), (2, 80)):
        at(20, 20, day, n)
        for i in range(8):
            at(4 + 3 * i, 60 - 3 * i, day, 1 + i % 4)
    df = spark.createDataFrame(
        rows, "pid long, ts timestamp_ntz, lon double, lat double")
    out = {r["cell"]: r for r in emerging_hotspots(
        df, z=z, bin_seconds=86400, origin="2020-01-01 00:00:00").collect()}
    site = out[z * (1 << 58) + (20 << 29) + 20]
    assert site["mk_s"] > 0 and site["category"] == "intensifying"
