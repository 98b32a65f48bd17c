"""Grid-partitioned kNN over geocoded points.

The graft's kNN operator (north star: "grid-partitioned kNN"): candidate
generation via cell + neighbor-ring co-location, local NumPy kNN per cell
block, global top-k reconciliation. At 100 TB this is the only shape that
works — the naive cross join is quadratic, while this plan shuffles each
point to O(9) cells and compares only within spatially adjacent blocks.

Correctness guarantee: a neighbor within `radius` degrees of the query is
always found if radius ≤ cell size (the 3×3 neighborhood covers it). The
exact-within-radius contract mirrors how the reference bounds its spatial
probes by grid cells (`SpatialGridJoiner.java:48-62`).

Plan:
  queries  → assign zxy cell @ zoom Z → explode to 3×3 neighbor cells
  candidates → assign home cell
  join on cell (shuffle, spatially co-located)
  per-pair distance (JVM expressions — haversine or planar)
  window top-k per query (rank on rounded distance + id tiebreak)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .tiling import zxy_cell_col


def _neighbor_cells_col(lon: Column, lat: Column, z: int) -> Column:
    """array<long> of the 3×3 cell neighborhood — pure JVM expressions."""
    n = F.lit(1 << z)
    ix = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * n).cast("long")
    iy = F.floor((F.lit(90.0) - lat) / F.lit(180.0) * n).cast("long")
    ix = F.greatest(F.lit(0), F.least(ix, n - 1))
    iy = F.greatest(F.lit(0), F.least(iy, n - 1))
    cells = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            jx = F.pmod(ix + dx, n)  # wrap longitude
            jy = F.greatest(F.lit(0), F.least(iy + dy, n - 1))
            cells.append(
                (F.lit(z).cast("long") * F.lit(1 << 58).cast("long") + F.shiftleft(jx, 29) + jy)
            )
    return F.array_distinct(F.array(*cells))


def planar_distance_sq(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    dx = lon1 - lon2
    dy = lat1 - lat2
    return dx * dx + dy * dy


def knn_join(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    zoom: int = 6,
    query_id: str = "query_id",
    cand_id: str = "cand_id",
    metric: str = "planar",
) -> DataFrame:
    """Top-k nearest candidates per query among the 3×3 cell neighborhood.

    queries:    (query_id, lon, lat)
    candidates: (cand_id, lon, lat)
    metric='planar' ranks on round(squared degree distance, 9) — cheap and
    correct for same-latitude comparisons; metric='haversine' ranks on
    round(great-circle meters, 3) (column name stays dist_sq for schema
    stability; it holds METERS then). cand_id breaks ties
    (deterministic, oracle-friendly).
    """
    if metric not in ("planar", "haversine"):
        raise ValueError("metric must be 'planar' or 'haversine'")
    q = queries.select(
        F.col(query_id),
        F.col("lon").alias("q_lon"),
        F.col("lat").alias("q_lat"),
        F.explode(_neighbor_cells_col(F.col("lon"), F.col("lat"), zoom)).alias("cell"),
    )
    c = candidates.select(
        F.col(cand_id),
        F.col("lon").alias("c_lon"),
        F.col("lat").alias("c_lat"),
        zxy_cell_col(F.col("lon"), F.col("lat"), zoom).alias("cell"),
    )
    pairs = q.join(c, "cell").where(F.col(query_id) != F.col(cand_id))
    if metric == "haversine":
        dist = F.round(
            haversine_m(F.col("q_lon"), F.col("q_lat"),
                        F.col("c_lon"), F.col("c_lat")), 3)
    else:
        dist = F.round(
            planar_distance_sq(F.col("q_lon"), F.col("q_lat"),
                               F.col("c_lon"), F.col("c_lat")), 9)
    scored = pairs.select(query_id, cand_id, dist.alias("dist_sq"))
    # a candidate may be reached via several of the query's neighbor cells →
    # dedup before ranking
    scored = scored.dropDuplicates([query_id, cand_id])
    w = Window.partitionBy(query_id).orderBy(F.asc("dist_sq"), F.asc(cand_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id, cand_id, "dist_sq", "rank")
    )


def haversine_m(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Great-circle distance in meters (haversine, R=6371008.8 — the IUGG
    mean Earth radius) as ONE per-row JVM expression: deterministic given
    identical inputs, mirrored verbatim by the SQL oracle twin."""
    r = F.lit(6371008.8)
    rl1, rl2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / F.lit(2.0)
    dlon = F.radians(lon2 - lon1) / F.lit(2.0)
    a = (F.sin(dlat) * F.sin(dlat)
         + F.cos(rl1) * F.cos(rl2) * F.sin(dlon) * F.sin(dlon))
    return F.lit(2.0) * r * F.asin(F.sqrt(a))


def radius_join(
    queries: DataFrame,
    candidates: DataFrame,
    radius_m: float,
    query_id: str = "query_id",
    cand_id: str = "cand_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    cell_deg: float | None = None,
    max_abs_lat: float = 70.0,
) -> DataFrame:
    """All (query, candidate) pairs within `radius_m` meters — the
    geodesic within-distance join, without a cross product.

    Same shape as the kNN plan: lat/lon degree bins of width `cell_deg`,
    queries explode to their 3×3 bin neighborhood, hash equi-join on the
    bin, exact haversine post-filter. Completeness needs cell_deg ≥ the
    radius in LONGITUDE degrees at the highest latitude present; the
    default radius/111320/cos(max_abs_lat°) is safe for |lat| ≤
    `max_abs_lat` (pass cell_deg explicitly for polar data).

    Longitude bins are MODULAR (n_lon = ceil(360/cell_deg)), so pairs
    straddling the ±180° antimeridian meet in a shared wrapped bin.

    Returns (query_id, cand_id, dist_m) with dist_m rounded to mm."""
    import math

    if cell_deg is None:
        cell_deg = radius_m / 111_320.0 / max(
            math.cos(math.radians(max_abs_lat)), 1e-6)
    n_lon = max(3, math.ceil(360.0 / cell_deg))

    def bins(lon: Column, lat: Column) -> tuple[Column, Column]:
        return (
            F.pmod(F.floor((lon + F.lit(180.0)) / F.lit(cell_deg)),
                   F.lit(n_lon)).cast("long"),
            F.floor(lat / F.lit(cell_deg)).cast("long"),
        )

    qx, qy = bins(F.col(lon_col), F.col(lat_col))
    q = queries.select(
        F.col(query_id), F.col(lon_col).alias("_qlon"),
        F.col(lat_col).alias("_qlat"), qx.alias("_bx0"), qy.alias("_by0"),
    ).select(
        query_id, "_qlon", "_qlat",
        F.explode(F.array(*[
            F.struct(F.pmod(F.col("_bx0") + dx, F.lit(n_lon)).alias("bx"),
                     (F.col("_by0") + dy).alias("by"))
            for dx in (-1, 0, 1) for dy in (-1, 0, 1)
        ])).alias("_b"),
    ).select(query_id, "_qlon", "_qlat",
             F.col("_b.bx").alias("_bx"), F.col("_b.by").alias("_by"))

    cx, cy = bins(F.col(lon_col), F.col(lat_col))
    c = candidates.select(
        F.col(cand_id), F.col(lon_col).alias("_clon"),
        F.col(lat_col).alias("_clat"), cx.alias("_bx"), cy.alias("_by"),
    )
    dist = haversine_m(F.col("_qlon"), F.col("_qlat"),
                       F.col("_clon"), F.col("_clat"))
    return (
        q.join(c, ["_bx", "_by"])
        .select(query_id, cand_id, F.round(dist, 3).alias("dist_m"))
        .where(F.col("dist_m") <= F.lit(float(radius_m)))
    )
