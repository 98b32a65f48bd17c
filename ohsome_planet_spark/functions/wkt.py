"""Minimal WKT reader/writer for the geometry kinds the engine handles.

Replaces the reference's JTS WKTReader usage in the country-CSV source
(`/root/reference/ohsome-contributions/src/main/java/org/heigit/ohsome/
contributions/spatialjoin/SpatialJoiner.java:34-66`). Supports POINT,
LINESTRING, POLYGON, MULTIPOLYGON, MULTILINESTRING, MULTIPOINT,
GEOMETRYCOLLECTION — 2D only.

Internal representation (columnar-friendly):
    ("Point", (x, y))
    ("LineString", np.ndarray (N,2))
    ("Polygon", [ring0 (N,2), ring1, ...])           # ring0 = shell
    ("MultiPolygon", [polygon, polygon, ...])
    ("MultiLineString", [line, ...])
    ("MultiPoint", np.ndarray (N,2))
    ("GeometryCollection", [geom, ...])
"""

from __future__ import annotations

import re

import numpy as np

_NUM = r"[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?"


def _parse_coords(body: str) -> np.ndarray:
    pts = []
    for pair in body.split(","):
        parts = pair.split()
        pts.append((float(parts[0]), float(parts[1])))
    return np.asarray(pts, dtype=np.float64)


def _split_groups(body: str) -> list[str]:
    """Split a parenthesized list at depth 0 commas: '(a),(b)' → ['a','b']."""
    groups = []
    depth = 0
    start = None
    for i, ch in enumerate(body):
        if ch == "(":
            if depth == 0:
                start = i + 1
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                groups.append(body[start:i])
    return groups


def wkt_loads(text: str):
    text = text.strip()
    m = re.match(r"^([A-Za-z]+)\s*(EMPTY|\(.*\))$", text, re.S)
    if not m:
        raise ValueError(f"unparseable WKT: {text[:80]}")
    kind = m.group(1).upper()
    body = m.group(2)
    if body == "EMPTY":
        return (kind.title() if kind != "GEOMETRYCOLLECTION" else "GeometryCollection", None)
    inner = body[1:-1].strip()
    if kind == "POINT":
        arr = _parse_coords(inner)
        return ("Point", (float(arr[0, 0]), float(arr[0, 1])))
    if kind == "LINESTRING":
        return ("LineString", _parse_coords(inner))
    if kind == "MULTIPOINT":
        inner2 = inner.replace("(", "").replace(")", "")
        return ("MultiPoint", _parse_coords(inner2))
    if kind == "POLYGON":
        return ("Polygon", [_parse_coords(g) for g in _split_groups(inner)])
    if kind == "MULTILINESTRING":
        return ("MultiLineString", [_parse_coords(g) for g in _split_groups(inner)])
    if kind == "MULTIPOLYGON":
        polys = []
        for poly_body in _split_groups(inner):
            polys.append([_parse_coords(g) for g in _split_groups(poly_body)])
        return ("MultiPolygon", polys)
    if kind == "GEOMETRYCOLLECTION":
        geoms = []
        depth = 0
        start = 0
        for i, ch in enumerate(inner):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                geoms.append(wkt_loads(inner[start:i]))
                start = i + 1
        geoms.append(wkt_loads(inner[start:]))
        return ("GeometryCollection", geoms)
    raise ValueError(f"unsupported WKT kind: {kind}")


def _fmt(v: float) -> str:
    s = repr(float(v))
    return s[:-2] if s.endswith(".0") else s


def _coords_str(arr: np.ndarray) -> str:
    return ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in np.asarray(arr))


def wkt_dumps(geom) -> str:
    kind, data = geom
    if data is None:
        return f"{kind.upper()} EMPTY"
    if kind == "Point":
        return f"POINT ({_fmt(data[0])} {_fmt(data[1])})"
    if kind == "LineString":
        return f"LINESTRING ({_coords_str(data)})"
    if kind == "MultiPoint":
        return f"MULTIPOINT ({_coords_str(data)})"
    if kind == "Polygon":
        rings = ", ".join(f"({_coords_str(r)})" for r in data)
        return f"POLYGON ({rings})"
    if kind == "MultiLineString":
        lines = ", ".join(f"({_coords_str(line)})" for line in data)
        return f"MULTILINESTRING ({lines})"
    if kind == "MultiPolygon":
        polys = ", ".join(
            "(" + ", ".join(f"({_coords_str(r)})" for r in poly) + ")" for poly in data
        )
        return f"MULTIPOLYGON ({polys})"
    if kind == "GeometryCollection":
        return "GEOMETRYCOLLECTION (" + ", ".join(wkt_dumps(g) for g in data) + ")"
    raise ValueError(f"unsupported kind {kind}")


def polygon_parts(geom) -> list[list[np.ndarray]]:
    """Explode any geometry into polygon parts (list of ring lists).

    Mirrors the reference country loader's per-part explode
    (`SpatialJoiner.java:57-61`): MULTIPOLYGON → its polygons; POLYGON → one.
    """
    kind, data = geom
    if kind == "Polygon":
        return [data]
    if kind == "MultiPolygon":
        return list(data)
    if kind == "GeometryCollection":
        out = []
        for g in data:
            out.extend(polygon_parts(g))
        return out
    return []
