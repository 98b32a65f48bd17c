"""Way geometry semantics (K2/K3): point/line/polygon decision + area rules.

Parity targets:
- `wayGeometry` (`/root/reference/ohsome-contributions/src/main/java/org/
  heigit/ohsome/contributions/contrib/ContributionGeometry.java:137-167`):
  coordinates of visible + in-range member nodes in ref order; closed ring
  (first ref id == last ref id, > 2 members) passing the area-tag test and
  forming a valid ring (≥ 4 points) ⇒ Polygon; else ≥ 2 points ⇒ LineString;
  else 1 point ⇒ Point; 0 ⇒ empty.
- `isArea` (`ContributionGeometry.java:169-182`) driven by the
  polygon-features table (`src/main/resources/polygon_features.csv`, 27 rows;
  key;all|whitelist|blacklist;values) with the `area=no` override. The table
  is OSM community data, re-expressed here as a dict.
"""

from __future__ import annotations

import numpy as np

# key → ("all", None) | ("whitelist", frozenset) | ("blacklist", frozenset)
POLYGON_FEATURES: dict[str, tuple[str, frozenset | None]] = {
    "building": ("all", None),
    "highway": ("whitelist", frozenset({"services", "rest_area", "escape", "elevator"})),
    "natural": ("blacklist", frozenset({"coastline", "cliff", "ridge", "arete", "tree_row"})),
    "landuse": ("all", None),
    "waterway": ("whitelist", frozenset({"riverbank", "dock", "boatyard", "dam"})),
    "amenity": ("all", None),
    "leisure": ("all", None),
    "barrier": (
        "whitelist",
        frozenset({"city_wall", "ditch", "hedge", "retaining_wall", "wall", "spikes"}),
    ),
    "railway": ("whitelist", frozenset({"station", "turntable", "roundhouse", "platform"})),
    "area": ("all", None),
    "boundary": ("all", None),
    "man_made": ("blacklist", frozenset({"cutline", "embankment", "pipeline"})),
    "power": ("whitelist", frozenset({"plant", "substation", "generator", "transformer"})),
    "place": ("all", None),
    "shop": ("all", None),
    "aeroway": ("blacklist", frozenset({"taxiway"})),
    "tourism": ("all", None),
    "historic": ("all", None),
    "public_transport": ("all", None),
    "office": ("all", None),
    "building:part": ("all", None),
    "military": ("all", None),
    "ruins": ("all", None),
    "area:highway": ("all", None),
    "craft": ("all", None),
    "golf": ("all", None),
    "indoor": ("all", None),
}


def test_polygon_feature(key: str, value: str) -> bool:
    rule = POLYGON_FEATURES.get(key)
    if rule is None:
        return False
    kind, values = rule
    if kind == "all":
        return True
    if kind == "whitelist":
        return value in values
    return value not in values  # blacklist


def is_area(tags: dict[str, str], first_ref: int, last_ref: int, n_refs: int) -> bool:
    """`isArea` parity (`ContributionGeometry.java:169-182`): area=no
    (case-insensitive) ⇒ False; member list must have > 2 entries with
    first id == last id; any tag matching the polygon-features table ⇒ True.
    Note: the closed-ness test is on the *member id list* (all members,
    including invisible ones), not on the surviving coordinates."""
    if (tags.get("area") or "").lower() == "no":
        return False
    if n_refs <= 2 or first_ref != last_ref:
        return False
    return any(test_polygon_feature(k, v) for k, v in tags.items())


def _segments_self_intersect(x: np.ndarray, y: np.ndarray) -> bool:
    """True if the closed ring (first == last) has non-adjacent segment
    intersections or repeated interior vertices — approximates JTS
    Polygon.isValid for single rings (O(n²), rings are small)."""
    n = x.size - 1  # segments
    if n < 3:
        return True
    # repeated vertices (other than the closing one)
    pts = set()
    for i in range(n):
        p = (x[i], y[i])
        if p in pts:
            return True
        pts.add(p)
    for i in range(n):
        for j in range(i + 1, n):
            if j == i or abs(i - j) == 1 or (i == 0 and j == n - 1):
                continue
            if _seg_intersects(x[i], y[i], x[i + 1], y[i + 1], x[j], y[j], x[j + 1], y[j + 1]):
                return True
    return False


def _seg_intersects(ax, ay, bx, by, cx, cy, dx, dy) -> bool:
    d1 = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    d2 = (bx - ax) * (dy - ay) - (by - ay) * (dx - ax)
    d3 = (dx - cx) * (ay - cy) - (dy - cy) * (ax - cx)
    d4 = (dx - cx) * (by - cy) - (dy - cy) * (bx - cx)
    if ((d1 > 0) != (d2 > 0)) and ((d3 > 0) != (d4 > 0)):
        return True
    # collinear touching
    def on(px, py, qx, qy, rx, ry):
        return (
            min(px, qx) <= rx <= max(px, qx)
            and min(py, qy) <= ry <= max(py, qy)
        )
    if d1 == 0 and on(ax, ay, bx, by, cx, cy):
        return True
    if d2 == 0 and on(ax, ay, bx, by, dx, dy):
        return True
    if d3 == 0 and on(cx, cy, dx, dy, ax, ay):
        return True
    if d4 == 0 and on(cx, cy, dx, dy, bx, by):
        return True
    return False


def ring_is_valid(x: np.ndarray, y: np.ndarray) -> bool:
    """isValidLineRing + JTS isValid approximation: empty ⇒ valid; else ≥ 4
    points, closed, simple (no self-intersection / repeated vertices)."""
    if x.size == 0:
        return True
    if x.size < 4 or x[0] != x[-1] or y[0] != y[-1]:
        return False
    return not _segments_self_intersect(x, y)


def way_geometry(
    lons: np.ndarray,
    lats: np.ndarray,
    visible: np.ndarray,
    tags: dict[str, str],
    first_ref: int,
    last_ref: int,
    n_refs: int,
):
    """→ internal geometry tuple (see functions/wkt.py representation).

    Coordinates are the snapshot positions of visible, in-range member nodes
    in ref order (invalid/missing members dropped — `ContributionGeometry.
    java:142-146`).
    """
    lons = np.asarray(lons, np.float64)
    lats = np.asarray(lats, np.float64)
    visible = np.asarray(visible, bool)
    ok = (
        visible
        & ~np.isnan(lons)
        & ~np.isnan(lats)
        & (lons >= -180.0)
        & (lons <= 180.0)
        & (lats >= -90.0)
        & (lats <= 90.0)
    )
    x = lons[ok]
    y = lats[ok]
    # decision order mirrors ContributionGeometry.wayGeometry:137-160:
    # area + valid ring → Polygon; len==0 or ≥2 → LineString; else Point
    if is_area(tags, first_ref, last_ref, n_refs) and ring_is_valid(x, y):
        if x.size == 0:
            return ("Polygon", None)  # empty polygon
        return ("Polygon", [np.column_stack([x, y])])
    if x.size == 0:
        return ("LineString", None)  # empty linestring
    if x.size >= 2:
        return ("LineString", np.column_stack([x, y]))
    return ("Point", (float(x[0]), float(y[0])))
