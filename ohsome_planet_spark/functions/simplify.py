"""Douglas–Peucker polyline simplification — NumPy kernel + Arrow batch op.

The classic cartographic generalization step for way geometries before
tile rendering / export at coarse zooms (pairs with
`operators/tiling.smooth_tile_counts` on the raster side). Reference
parity: ohsome-planet exports full-resolution WKB and leaves
generalization to consumers; this operator closes that step for tile
pipelines built on this engine.

Kernel: iterative-stack DP over coordinate arrays (recursion depth on a
100k-vertex coastline would overflow Python's stack), with the per-span
point-to-line distances fully vectorized. Distances compare as SQUARED
values against tol² — no sqrt, no libm — and the kept set is a pure
function of the inputs, so results are identical across runs, engines,
and cluster sizes. Degenerate spans (coincident endpoints — closed
rings) fall back to point distance.

Spark shape: one `mapInPandas` pass (the documented Arrow-batch
exception — DP's data-dependent recursion tree has no DataFrame-op
composition), preserving the input's partitioning; per-row cost is
O(n log n) expected on the vertex count, memory O(n). Rows shorter than
3 vertices pass through untouched.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame


def douglas_peucker_mask(
    x: np.ndarray, y: np.ndarray, tolerance: float
) -> np.ndarray:
    """Boolean keep-mask: endpoints always kept; an interior point
    survives iff its span's max point-to-line distance exceeds the
    tolerance (strictly — points AT the tolerance are dropped, the
    common library convention)."""
    n = x.size
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    if n <= 2:
        return keep
    t2 = float(tolerance) * float(tolerance)
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        dx = x[j] - x[i]
        dy = y[j] - y[i]
        px = x[i + 1:j] - x[i]
        py = y[i + 1:j] - y[i]
        l2 = dx * dx + dy * dy
        if l2 == 0.0:
            d2 = px * px + py * py
        else:
            cross = px * dy - py * dx
            d2 = (cross * cross) / l2
        k = int(np.argmax(d2))
        if d2[k] > t2:
            keep[i + 1 + k] = True
            stack.append((i, i + 1 + k))
            stack.append((i + 1 + k, j))
    return keep


def simplify_lines(
    df: DataFrame,
    tolerance: float,
    lons_col: str = "lons",
    lats_col: str = "lats",
) -> DataFrame:
    """Replaces the coordinate-array columns with their DP-simplified
    versions and appends `n_before`/`n_after` vertex counts. Schema
    otherwise passes through unchanged."""
    import pandas as pd

    from pyspark.sql.types import LongType, StructField, StructType

    # StructType.add mutates in place — build the output schema from a
    # fresh field list or df's own cached schema grows phantom columns
    out_schema = StructType(
        list(df.schema.fields)
        + [StructField("n_before", LongType()),
           StructField("n_after", LongType())]
    )
    tol = float(tolerance)

    def fn(batches):
        for pdf in batches:
            n_before = []
            n_after = []
            new_lons = []
            new_lats = []
            for lons, lats in zip(pdf[lons_col], pdf[lats_col]):
                xa = np.asarray(lons, dtype=np.float64)
                ya = np.asarray(lats, dtype=np.float64)
                m = douglas_peucker_mask(xa, ya, tol)
                n_before.append(xa.size)
                n_after.append(int(m.sum()))
                new_lons.append(xa[m])
                new_lats.append(ya[m])
            pdf = pdf.copy()
            pdf[lons_col] = new_lons
            pdf[lats_col] = new_lats
            pdf["n_before"] = pd.array(n_before, dtype="int64")
            pdf["n_after"] = pd.array(n_after, dtype="int64")
            yield pdf

    return df.mapInPandas(fn, schema=out_schema)
