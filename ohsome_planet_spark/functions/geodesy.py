"""Geodesic area / length — vectorized NumPy ports of the public formulas.

Semantics parity with the reference's kernels (values must match to double
precision):

- `geodesic_ring_area` / `geodesic_polygon_area`: Chamberlain & Duquette
  (JPL 07-03) spherical-excess area with the reference's WGS84 latitude
  correction and mid-latitude flattening factor
  (`/root/reference/ohsome-contributions/src/main/java/org/heigit/ohsome/
  contributions/util/GeometryTools.java:126-237`): |outer| − Σ|inner|,
  clamped ≥ 0.
- `geodesic_length`: spheroid-corrected great-circle-ish sum with mean
  radius 6371000 and SPHERE_FACT latitude conversion
  (`GeometryTools.java:29-60`).
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS_MEAN = 6371000.0
EARTH_RADIUS_EQUATOR = 6378137.0
EARTH_INVERSE_FLATTENING = 298.257223563
F_ = 1.0 - 1.0 / EARTH_INVERSE_FLATTENING
SPHERE_FACT = F_**1.5


def geodesic_length(lons: np.ndarray, lats: np.ndarray) -> float:
    """Length in meters of the polyline (lons[i], lats[i]).

    Matches GeometryTools.lengthOf(Coordinate[]): per-segment planar distance
    on spheroid-corrected radians, deltaLon scaled by cos(midLat), summed and
    scaled by the mean radius.
    """
    lons = np.asarray(lons, np.float64)
    lats = np.asarray(lats, np.float64)
    if lons.size < 2:
        return 0.0
    lon_r = np.radians(lons)
    lat_r = np.arctan(SPHERE_FACT * np.tan(np.radians(lats)))
    dlon = np.diff(lon_r)
    dlat = np.diff(lat_r)
    mid = (lat_r[1:] + lat_r[:-1]) / 2.0
    dlon = dlon * np.cos(mid)
    return float(np.sum(np.sqrt(dlon * dlon + dlat * dlat)) * EARTH_RADIUS_MEAN)


def geodesic_ring_area(lons: np.ndarray, lats: np.ndarray) -> float:
    """Signed area (m²) of a closed ring (first == last coordinate).

    Positive for clockwise rings, mirroring GeometryTools.ringArea —
    including its exact index scheme p1=coords[i], p2=coords[i+1],
    p3=coords[i+2] with wraparound over the *closed* coordinate array, and
    its mid-latitude (bbox-based) flattening correction.
    """
    lons = np.asarray(lons, np.float64)
    lats = np.asarray(lats, np.float64)
    n = lons.size
    if n <= 2:
        return 0.0
    # p1 = coords[i], p3 = coords[(i+2) % n], sinLat from coords[(i+1) % n]
    p1x = lons
    p3x = np.roll(lons, -2)
    p2y = np.roll(lats, -1)
    x = F_ * np.tan(np.radians(p2y))
    sin_lat = x / np.sqrt(x * x + 1.0)
    area = float(np.sum(np.radians(p3x - p1x) * sin_lat))
    mid_lat = (lats.max() + lats.min()) / 2.0
    area *= (
        0.5
        * EARTH_RADIUS_EQUATOR
        * EARTH_RADIUS_EQUATOR
        * (1.0 - 1.0 / EARTH_INVERSE_FLATTENING * np.cos(np.radians(mid_lat)) ** 2)
    )
    return area


def geodesic_polygon_area(
    outer: tuple[np.ndarray, np.ndarray],
    inners: list[tuple[np.ndarray, np.ndarray]] | None = None,
) -> float:
    """|outer| − Σ|inner|, clamped at 0 (GeometryTools.areaOf(Polygon))."""
    area = abs(geodesic_ring_area(*outer))
    for ring in inners or []:
        area -= abs(geodesic_ring_area(*ring))
    return max(0.0, area)
