"""PolygonIndex: PIP join parity, covered-cell shortcut equivalence."""

import numpy as np
import pytest

from ohsome_planet_spark.functions.pip_index import PolygonIndex
from ohsome_planet_spark.sources.countries import fixture_features, parse_countries_csv
from ohsome_planet_spark.sources.gazetteer import GAZETTEER


@pytest.fixture(scope="module")
def index():
    return PolygonIndex(fixture_features(), grid_zoom=8)


@pytest.fixture(scope="module")
def index_nogrid():
    return PolygonIndex(fixture_features(), grid_zoom=None)


GOLDEN = {
    # entity → expected sorted country set (hand-checked against the fixture)
    "Alpha_City": ["AAA"],  # (12.3, 7.6)
    "Delta_Town": ["DDD"],  # (21.5, 14.2) in DDD only (EEE starts at lon 15? no: lon 14.2 < 15)
    "Epsilon_Village": ["AAA"],  # (3.3, 3.9)
    "Zeta_Port": ["DDD"],  # (28.7, 33.1) in DDD part 2 (30..36 × 25..31)? lon=33.1 lat=28.7 → yes
    "Eta_Springs": ["DDD"],  # (35.5, 5.5) lon=5.5 lat=35.5 → DDD part1 (0..18 × 20..40)
    "Theta_Falls": ["BBB"],  # (8.8, 26.5)
    "Iota_Ridge": ["BBB", "EEE"],  # (17.0, 28.0): BBB (10..30 × 0..20)? lat 17 → yes; EEE (15..30 × 10..32) → yes
    "Kappa_Bay": ["BBB", "EEE"],  # (5.0, 15.0)? lat=5: BBB yes; EEE lat≥10 no → ["BBB"]
    "Pi_Junction": ["AAA", "BBB"],  # on shared border lon=10
    "Rho_Corner": ["BBB", "EEE", "FFF"],  # (lat 20, lon 20): BBB top edge, EEE interior, FFF bottom edge
    "Sigma_Edge": ["BBB"],  # (0.0, 22.5) on lat=0 bottom edge of BBB
    "Tau_Meridian": ["AAA"],  # (15.0, 0.0) on lon=0 west edge of AAA
    "Upsilon_Isle": [],
    "Phi_Outpost": [],
    "Omega_Anchor": ["AAA"],  # inside CCC's hole → AAA only
}


def test_golden_assignments(index):
    gaz = {name: (lat, lon) for name, lat, lon in GAZETTEER}
    # fix the two golden entries computed inline above
    golden = dict(GOLDEN)
    golden["Kappa_Bay"] = ["BBB"]
    for entity, expected in golden.items():
        lat, lon = gaz[entity]
        got = index.join_points(np.array([lon]), np.array([lat]))[0]
        assert got == expected, (entity, got, expected)


def test_grid_equals_exact(index, index_nogrid):
    rng = np.random.default_rng(42)
    lon = rng.uniform(-5, 45, 3000)
    lat = rng.uniform(-5, 45, 3000)
    exact = index_nogrid.join_points(lon, lat)
    grid = index.join_points_grid(lon, lat)
    assert exact == grid


def test_grid_has_covered_cells(index):
    covered = [c for c, (cov, cand) in index.grid.items() if cov]
    assert len(covered) > 0, "fixture polygons should fully cover interior cells"


def test_overlap_emits_set(index):
    # EEE overlaps BBB in (15..30 × 10..20)
    got = index.join_points(np.array([20.0]), np.array([15.0]))[0]
    assert got == ["BBB", "EEE"]


def test_hole_boundary_is_inside_inner_country(index):
    # point on CCC's hole edge: boundary of hole belongs to CCC (JTS intersects)
    got = index.join_points(np.array([6.0]), np.array([6.5]))[0]
    assert "CCC" in got and "AAA" in got


def test_multipolygon_exploded():
    feats = parse_countries_csv("id;wkt\nMM;MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))\n")
    assert len(feats) == 2
    assert all(fid == "MM" for fid, _ in feats)


def test_csv_header_sniffing():
    feats = parse_countries_csv("ISO_A3;Geometry\nXYZ;POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))\n")
    assert feats[0][0] == "XYZ"
    with pytest.raises(ValueError):
        parse_countries_csv("foo;bar\nX;POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))\n")


def test_empty_index():
    idx = PolygonIndex([], grid_zoom=8)
    assert idx.join_points(np.array([1.0]), np.array([1.0])) == [[]]
