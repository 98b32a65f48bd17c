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
) -> DataFrame:
    """Top-k nearest candidates per query among the 3×3 cell neighborhood.

    queries:    (query_id, lon, lat)
    candidates: (cand_id, lon, lat)
    Returns (query_id, cand_id, dist_sq, rank) with rank 1..k, ranked on
    round(dist_sq, 9) with cand_id tiebreak (deterministic, oracle-friendly).
    """
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
    scored = pairs.select(
        query_id,
        cand_id,
        F.round(
            planar_distance_sq(F.col("q_lon"), F.col("q_lat"), F.col("c_lon"), F.col("c_lat")),
            9,
        ).alias("dist_sq"),
    )
    # a candidate may be reached via several of the query's neighbor cells →
    # dedup before ranking
    scored = scored.dropDuplicates([query_id, cand_id])
    w = Window.partitionBy(query_id).orderBy(F.asc("dist_sq"), F.asc(cand_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id, cand_id, "dist_sq", "rank")
    )
