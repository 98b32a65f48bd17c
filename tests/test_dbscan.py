"""Grid DBSCAN (operators/dbscan.py)."""

import pytest
from pyspark.sql import functions as F

from ohsome_planet_spark.operators.dbscan import (
    dbscan,
    eps_neighbor_pairs,
    eps_zoom,
)


def _pts(spark, rows):
    return spark.createDataFrame(
        rows, "point_id long, lon double, lat double")


def test_eps_zoom_cell_covers_eps():
    import math
    for eps in (0.01, 0.15, 1.0, 5.0, 44.9):
        z = eps_zoom(eps)
        assert 180.0 / (1 << z) >= eps          # lat cell ≥ eps
        assert 180.0 / (1 << (z + 1)) < eps or z == 28  # and maximal
    with pytest.raises(ValueError):
        eps_zoom(0)


def test_neighbor_pairs_directed_and_exact(spark):
    # 3 points in a row spaced 1.0 apart; eps=1.0 exactly includes spacing
    df = _pts(spark, [(1, 0.0, 0.0), (2, 1.0, 0.0), (3, 2.0, 0.0),
                      (4, 10.0, 10.0)])
    got = {(r["_id"], r["_nid"])
           for r in eps_neighbor_pairs(df, 1.0).collect()}
    assert got == {(1, 2), (2, 1), (2, 3), (3, 2)}  # boundary inclusive


def test_textbook_cluster_border_noise(spark):
    # cluster: 4 mutually-close points (all core at min_pts=3);
    # border: close to one core only; noise: far away
    rows = [
        (1, 0.0, 0.0), (2, 0.1, 0.0), (3, 0.0, 0.1), (4, 0.1, 0.1),
        (5, 0.5, 0.0),    # exactly 0.4 from #2, >0.4 from the rest -> border
        (6, 30.0, 30.0),  # noise
    ]
    out = {r["point_id"]: r for r in
           dbscan(_pts(spark, rows), eps=0.4, min_pts=3).collect()}
    assert {i: out[i]["role"] for i in range(1, 7)} == {
        1: "core", 2: "core", 3: "core", 4: "core",
        5: "border", 6: "noise"}
    assert all(out[i]["cluster_id"] == 1 for i in range(1, 6))
    assert out[6]["cluster_id"] is None
    assert out[1]["n_neighbors"] == 3
    assert out[5]["n_neighbors"] == 1


def test_isolated_core_is_singleton_cluster(spark):
    # a dense stack of 3 coincident points, min_pts=3: all core, no core
    # neighbors elsewhere -> one cluster labeled by the min id
    rows = [(7, 5.0, 5.0), (8, 5.0, 5.0), (9, 5.0, 5.0)]
    out = {r["point_id"]: r for r in
           dbscan(_pts(spark, rows), eps=0.1, min_pts=3).collect()}
    assert all(out[i]["role"] == "core" for i in (7, 8, 9))
    assert all(out[i]["cluster_id"] == 7 for i in (7, 8, 9))


def test_matches_bruteforce_union_find(spark):
    # randomized-but-deterministic scatter vs a plain python DBSCAN
    import hashlib

    def h(p, i):
        return int(hashlib.md5(f"{p}{i}".encode()).hexdigest()[:15], 16)

    rows = [(i, (h("x", i) % 200) / 10.0, (h("y", i) % 200) / 10.0)
            for i in range(150)]
    eps, mp = 1.5, 4
    # python reference
    import itertools
    nb = {i: [] for i, _, _ in rows}
    for (i, xi, yi), (j, xj, yj) in itertools.combinations(rows, 2):
        if (xi - xj) ** 2 + (yi - yj) ** 2 <= eps * eps:
            nb[i].append(j)
            nb[j].append(i)
    core = {i for i in nb if len(nb[i]) + 1 >= mp}
    parent = {i: i for i in core}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for i in core:
        for j in nb[i]:
            if j in core:
                ra, rb = find(i), find(j)
                if ra != rb:
                    parent[ra] = rb
    comp = {}
    for i in core:
        comp.setdefault(find(i), []).append(i)
    label = {i: min(comp[find(i)]) for i in core}
    expect = {}
    for i, _, _ in rows:
        if i in core:
            expect[i] = ("core", label[i])
        else:
            cls = [label[j] for j in nb[i] if j in core]
            expect[i] = ("border", min(cls)) if cls else ("noise", None)

    out = {r["point_id"]: (r["role"], r["cluster_id"])
           for r in dbscan(_pts(spark, rows), eps=eps, min_pts=mp).collect()}
    assert out == expect


def test_haversine_metric(spark):
    # ~111 km between adjacent 1-degree latitude steps at lon=0: a
    # 120 km eps connects the chain, a 60 km eps does not
    rows = [(i, 0.0, float(i)) for i in range(4)] + [(9, 90.0, 0.0)]
    df = _pts(spark, rows)
    wide = {r["point_id"]: r for r in
            dbscan(df, eps=120_000.0, min_pts=2,
                   metric="haversine").collect()}
    assert all(wide[i]["role"] == "core" and wide[i]["cluster_id"] == 0
               for i in range(4))
    assert wide[9]["role"] == "noise"
    narrow = {r["point_id"]: r for r in
              dbscan(df, eps=60_000.0, min_pts=2,
                     metric="haversine").collect()}
    assert all(narrow[i]["role"] == "noise" for i in range(4))


def test_eps_zoom_meters_lat_aware():
    from ohsome_planet_spark.operators.dbscan import (
        M_PER_DEG, eps_zoom_meters)
    import math

    # higher latitude bound -> lon degrees shrink -> coarser grid needed
    z_eq = eps_zoom_meters(10_000.0, max_abs_lat=10.0)
    z_hi = eps_zoom_meters(10_000.0, max_abs_lat=85.0)
    assert z_hi <= z_eq
    # cell lon span at the returned zoom covers eps at the bound latitude
    for lat in (10.0, 60.0, 85.0):
        z = eps_zoom_meters(10_000.0, max_abs_lat=lat)
        lon_deg_needed = 10_000.0 / (M_PER_DEG * math.cos(math.radians(lat)))
        assert 360.0 / (1 << z) >= lon_deg_needed
