"""Broadcast polygon index for point-in-polygon country joins.

Pure-NumPy re-expression of the reference's two spatial-join strategies:

- `SpatialIndexJoiner` (`/root/reference/ohsome-contributions/src/main/java/
  org/heigit/ohsome/contributions/spatialjoin/SpatialIndexJoiner.java:17-43`):
  bbox-prefilter on a packed tree, then exact prepared-geometry intersects.
  Here: vectorized bbox test over packed (F,4) arrays + ray-casting PIP with
  boundary inclusion.
- `SpatialGridJoiner` (`SpatialGridJoiner.java:26-96`, grid build
  `BuildGridAction.java:43-93`): a precomputed grid where cells fully covered
  by features skip the exact test, and only boundary cells fall back to exact
  PIP ("ray-casting tie-break on boundaries"). Here: a zxy-cell dictionary
  cell → (covered ids, boundary candidate parts).

The index is built once on the driver from the exploded country parts and
broadcast; executors probe Arrow batches against it with zero per-row Python
(all candidate tests are vectorized per part, not per point).

Output contract matches the reference joiner: a **sorted set** of feature ids
per geometry (`SpatialGridJoiner.join:49-62` returns a Set; we sort for
determinism).
"""

from __future__ import annotations

import numpy as np

from . import geometry_np as gnp
from .cells import zxy_cell


class PolygonIndex:
    """Packed polygon-part index: ids, bboxes, rings; optional covered grid."""

    def __init__(self, features: list[tuple[str, list[np.ndarray]]], grid_zoom: int | None = 8):
        """features: [(id, [ring (N,2) arrays; ring0 = shell]), ...] —
        already exploded into single-polygon parts (one entry per part, ids
        may repeat, mirroring SpatialJoiner.readCSV's per-part explode)."""
        self.ids: list[str] = []
        self.rings: list[list[tuple[np.ndarray, np.ndarray]]] = []
        boxes = []
        for fid, rings in features:
            shell = np.asarray(rings[0], np.float64)
            rs = [(np.asarray(r, np.float64)[:, 0], np.asarray(r, np.float64)[:, 1]) for r in rings]
            self.ids.append(str(fid))
            self.rings.append(rs)
            boxes.append(
                (shell[:, 0].min(), shell[:, 1].min(), shell[:, 0].max(), shell[:, 1].max())
            )
        self.boxes = np.asarray(boxes, np.float64).reshape(len(boxes), 4)
        self.grid_zoom = grid_zoom
        # cell → (tuple of fully-covering ids, tuple of candidate part indexes)
        self.grid: dict[int, tuple[tuple[str, ...], tuple[int, ...]]] = {}
        if grid_zoom is not None and len(self.ids) > 0:
            self._build_grid(grid_zoom)

    # -- grid build (BuildGridAction analog) --------------------------------
    def _build_grid(self, zoom: int) -> None:
        n = 1 << zoom
        cell_w = 360.0 / n
        cell_h = 180.0 / n
        per_cell: dict[int, tuple[list[str], list[int]]] = {}
        self._nongrid_parts: list[int] = []
        for pi, (fid, rings) in enumerate(zip(self.ids, self.rings)):
            xmin, ymin, xmax, ymax = self.boxes[pi]
            ix0 = max(0, int((xmin + 180.0) // cell_w))
            ix1 = min(n - 1, int((xmax + 180.0) // cell_w))
            iy0 = max(0, int((90.0 - ymax) // cell_h))
            iy1 = min(n - 1, int((90.0 - ymin) // cell_h))
            if (ix1 - ix0 + 1) * (iy1 - iy0 + 1) > 250_000:
                # degenerate: part spans too many cells at this zoom —
                # exclude it from the grid and probe it exactly every time
                self._nongrid_parts.append(pi)
                continue
            shell_x, shell_y = rings[0]
            seg_x1 = np.concatenate([r[0][:-1] for r in rings])
            seg_y1 = np.concatenate([r[1][:-1] for r in rings])
            seg_x2 = np.concatenate([r[0][1:] for r in rings])
            seg_y2 = np.concatenate([r[1][1:] for r in rings])
            for ix in range(ix0, ix1 + 1):
                for iy in range(iy0, iy1 + 1):
                    cell = (zoom << 58) | (ix << 29) | iy
                    bxmin = ix * cell_w - 180.0
                    bxmax = bxmin + cell_w
                    bymax = 90.0 - iy * cell_h
                    bymin = bymax - cell_h
                    touches_boundary = gnp.segments_intersect_bbox(
                        seg_x1, seg_y1, seg_x2, seg_y2, bxmin, bymin, bxmax, bymax
                    )
                    if touches_boundary:
                        per_cell.setdefault(cell, ([], []))[1].append(pi)
                        continue
                    # no boundary inside the cell ⇒ cell is fully inside or
                    # fully outside: test the center
                    cx = np.asarray([(bxmin + bxmax) / 2.0])
                    cy = np.asarray([(bymin + bymax) / 2.0])
                    if gnp.points_in_polygon(cx, cy, rings)[0]:
                        per_cell.setdefault(cell, ([], []))[0].append(fid)
        self.grid = {
            c: (tuple(sorted(set(cov))), tuple(cand)) for c, (cov, cand) in per_cell.items()
        }

    # -- probes (SpatialIndexJoiner / SpatialGridJoiner analogs) ------------
    def _bbox_candidates(self, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        """(P, F) bool: point within part bbox."""
        b = self.boxes
        return (
            (px[:, None] >= b[None, :, 0])
            & (px[:, None] <= b[None, :, 2])
            & (py[:, None] >= b[None, :, 1])
            & (py[:, None] <= b[None, :, 3])
        )

    def join_points(self, px: np.ndarray, py: np.ndarray) -> list[list[str]]:
        """Sorted id set per point — exact-index path (J4 semantics)."""
        px = np.asarray(px, np.float64)
        py = np.asarray(py, np.float64)
        out_sets: list[set] = [set() for _ in range(px.size)]
        if len(self.ids) == 0:
            return [sorted(s) for s in out_sets]
        cand = self._bbox_candidates(px, py)
        for pi in range(len(self.ids)):
            sel = np.nonzero(cand[:, pi])[0]
            if sel.size == 0:
                continue
            hit = gnp.points_in_polygon(px[sel], py[sel], self.rings[pi])
            for idx in sel[hit]:
                out_sets[idx].add(self.ids[pi])
        return [sorted(s) for s in out_sets]

    def join_points_grid(self, px: np.ndarray, py: np.ndarray) -> list[list[str]]:
        """Sorted id set per point using the covered-cell shortcut (J5).

        Fully-covered cells contribute their ids without any exact test;
        boundary cells ray-cast only against the cell's candidate parts.
        Produces identical results to join_points (grid is an optimization,
        exactly as SpatialGridJoiner vs SpatialIndexJoiner).
        """
        if self.grid_zoom is None or not self.grid:
            return self.join_points(px, py)
        px = np.asarray(px, np.float64)
        py = np.asarray(py, np.float64)
        cells = zxy_cell(px, py, self.grid_zoom)
        out_sets: list[set] = [set() for _ in range(px.size)]
        order = np.argsort(cells, kind="stable")
        sorted_cells = cells[order]
        bounds = np.nonzero(np.diff(sorted_cells))[0] + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [sorted_cells.size]])
        for s, e in zip(starts, ends):
            cell = int(sorted_cells[s])
            idxs = order[s:e]
            entry = self.grid.get(cell)
            if entry is None:
                continue
            covered, candidates = entry
            for idx in idxs:
                out_sets[idx].update(covered)
            for pi in candidates:
                hit = gnp.points_in_polygon(px[idxs], py[idxs], self.rings[pi])
                for idx in idxs[hit]:
                    out_sets[idx].add(self.ids[pi])
        # parts too large for the grid are probed exactly for every point
        for pi in getattr(self, "_nongrid_parts", []):
            b = self.boxes[pi]
            sel = np.nonzero(
                (px >= b[0]) & (px <= b[2]) & (py >= b[1]) & (py <= b[3])
            )[0]
            if sel.size:
                hit = gnp.points_in_polygon(px[sel], py[sel], self.rings[pi])
                for idx in sel[hit]:
                    out_sets[idx].add(self.ids[pi])
        return [sorted(s) for s in out_sets]

    def join_geom(self, kind: str, data) -> list[str]:
        """Sorted id set for one geometry (JTS `intersects` analog, J4).

        Point → PIP; LineString/Polygon → intersects = any geometry vertex in
        the part, OR any part-shell vertex in the geometry (polygon only), OR
        any edge crossing. Mirrors the exact-test fallback of
        `SpatialIndexJoiner.join:32-43`.
        """
        from .geometry_np import points_in_polygon

        if data is None:
            return []
        if kind == "Point":
            return self.join_points(np.asarray([data[0]]), np.asarray([data[1]]))[0]
        if kind == "LineString":
            coords = np.asarray(data, np.float64)
            rings = [coords]
            closed = False
        elif kind == "Polygon":
            rings = [np.asarray(r, np.float64) for r in data]
            coords = rings[0]
            closed = True
        else:
            raise ValueError(kind)
        gx0, gy0 = coords[:, 0].min(), coords[:, 1].min()
        gx1, gy1 = coords[:, 0].max(), coords[:, 1].max()
        hits: set[str] = set()
        for pi in range(len(self.ids)):
            b = self.boxes[pi]
            if gx1 < b[0] or gx0 > b[2] or gy1 < b[1] or gy0 > b[3]:
                continue
            part = self.rings[pi]
            # any geometry vertex inside the part
            allv = np.vstack(rings)
            if points_in_polygon(allv[:, 0], allv[:, 1], part).any():
                hits.add(self.ids[pi])
                continue
            # part shell vertex inside the (closed) geometry
            if closed:
                sx, sy = part[0]
                inside = points_in_polygon(
                    np.asarray(sx), np.asarray(sy),
                    [(r[:, 0], r[:, 1]) for r in rings],
                )
                if inside.any():
                    hits.add(self.ids[pi])
                    continue
            # edge crossings
            if self._edges_cross(rings, part):
                hits.add(self.ids[pi])
        return sorted(hits)

    @staticmethod
    def _edges_cross(rings: list[np.ndarray], part_rings) -> bool:
        for arr in rings:
            ax1, ay1 = arr[:-1, 0], arr[:-1, 1]
            ax2, ay2 = arr[1:, 0], arr[1:, 1]
            for rx, ry in part_rings:
                bx1, by1 = rx[:-1], ry[:-1]
                bx2, by2 = rx[1:], ry[1:]
                # vectorized proper-crossing test over the (A,B) edge grid
                d1 = (ax2[:, None] - ax1[:, None]) * (by1[None, :] - ay1[:, None]) - (
                    ay2[:, None] - ay1[:, None]
                ) * (bx1[None, :] - ax1[:, None])
                d2 = (ax2[:, None] - ax1[:, None]) * (by2[None, :] - ay1[:, None]) - (
                    ay2[:, None] - ay1[:, None]
                ) * (bx2[None, :] - ax1[:, None])
                d3 = (bx2[None, :] - bx1[None, :]) * (ay1[:, None] - by1[None, :]) - (
                    by2[None, :] - by1[None, :]
                ) * (ax1[:, None] - bx1[None, :])
                d4 = (bx2[None, :] - bx1[None, :]) * (ay2[:, None] - by1[None, :]) - (
                    by2[None, :] - by1[None, :]
                ) * (ax2[:, None] - bx1[None, :])
                cross = ((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0))
                if cross.any():
                    return True
                touch = (d1 == 0) | (d2 == 0) | (d3 == 0) | (d4 == 0)
                if touch.any():
                    # exact-touch check over ALL flagged pairs, vectorized
                    # elementwise (no truncation — a touch past any cap
                    # would silently drop a country hit)
                    ii, jj = np.nonzero(touch)
                    a1x, a1y, a2x, a2y = ax1[ii], ay1[ii], ax2[ii], ay2[ii]
                    b1x, b1y, b2x, b2y = bx1[jj], by1[jj], bx2[jj], by2[jj]
                    if (
                        _on_segment(b1x, b1y, a1x, a1y, a2x, a2y).any()
                        or _on_segment(b2x, b2y, a1x, a1y, a2x, a2y).any()
                        or _on_segment(a1x, a1y, b1x, b1y, b2x, b2y).any()
                    ):
                        return True
        return False


def _on_segment(px, py, x1, y1, x2, y2) -> np.ndarray:
    """Elementwise: point i exactly on segment i (collinear + within bbox)."""
    cross = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
    return (
        (cross == 0.0)
        & (px >= np.minimum(x1, x2))
        & (px <= np.maximum(x1, x2))
        & (py >= np.minimum(y1, y2))
        & (py <= np.maximum(y1, y2))
    )
