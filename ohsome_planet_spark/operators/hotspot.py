"""Getis–Ord Gi* hotspot detection over grid cells.

The standard local spatial-autocorrelation statistic behind "hotspot
maps" (Getis & Ord 1992/1995): for each cell, compare the sum of its
3×3-neighborhood values against the global mean and variance; large
positive z → hot cluster, large negative → cold. Here over the engine's
packed zxy cells with binary contiguity weights on the OCCUPIED-cell
universe (w_ij = 1 for occupied j in i's (2r+1)² block, including i —
the Gi* convention; empty cells are outside the study set, the standard
"observed units" framing).

Engine-exact discipline: every aggregate is an int64 sum (neighborhood
sum S1, neighborhood size k, global N / Σx / Σx²), and the z-score is
ONE closed-form expression of those integers with two sqrts, rounded to
9 dp — the pmi/bm25 single-libm-call doctrine, so the float column IS
cross-engine hashable.

Scale shape: one explode of each occupied cell to its (2r+1)² block +
a map-side-combined aggregate (the `smooth_tile_counts` pattern), one
inner join back to the occupied universe, and a 1-row broadcast of the
global scalars. Nothing quadratic, nothing driver-side.

Reference parity: ohsome-planet aggregates per cell but has no spatial
statistics; this extends the graft's tile family (SURVEY §2 addendum)
beside zonal_stats / tile_entropy / smooth_tile_counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _block_sums(counts, z, radius, cell_col, n_col):
    """Shared (center, x, k, s1) + 1-row globals builder for the local
    spatial statistics: k/s1 are the (2r+1)²-block occupied-cell count
    and value sum INCLUDING the center (callers subtract the center for
    neighbors-only statistics)."""
    n_tiles = 1 << z
    mask = (1 << 29) - 1
    # base feeds THREE consumers (donations, globals, centers); without a
    # persist Spark recomputes the upstream counts aggregate — typically a
    # full shuffle over the raw points — once per consumer (the dbscan
    # lesson). The cached frame is O(occupied cells), tiny next to points.
    base = counts.select(
        F.shiftright(cell_col, 29).bitwiseAND(F.lit(mask)).alias("_x"),
        F.col(cell_col).bitwiseAND(F.lit(mask)).alias("_y"),
        F.col(n_col).cast("long").alias("_n"),
    ).persist()
    offs = F.explode(
        F.array(*[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in range(-radius, radius + 1)
            for dy in range(-radius, radius + 1)
        ])
    ).alias("_o")
    donated = (
        base.select("_x", "_y", F.col("_n").alias("_dn"), offs)
        .select(
            F.pmod(F.col("_x") + F.col("_o.dx"), F.lit(n_tiles)).alias("_cx"),
            (F.col("_y") + F.col("_o.dy")).alias("_cy"),
            "_dn",
        )
        .where((F.col("_cy") >= 0) & (F.col("_cy") < n_tiles))
        .groupBy("_cx", "_cy")
        .agg(F.sum("_dn").alias("s1"), F.count("*").alias("k"))
    )
    glob = base.agg(
        F.count("*").alias("_N"),
        F.sum("_n").alias("_sx"),
        F.sum(F.col("_n") * F.col("_n")).alias("_sxx"),
    )
    center = base.select(
        F.col("_x").alias("_ix"), F.col("_y").alias("_iy"),
        F.col("_n").alias("_xval"),
    )
    return (
        center.join(
            donated,
            (F.col("_ix") == F.col("_cx")) & (F.col("_iy") == F.col("_cy")),
        )
        .crossJoin(F.broadcast(glob))
    )


def local_morans_i(
    counts: DataFrame,
    z: int,
    radius: int = 1,
    cell_col: str = "cell",
    n_col: str = "n",
) -> DataFrame:
    """(cell, x, k, s1, moran_i, quadrant) — Local Moran's I (Anselin
    1995), Gi*'s sibling: I_i = (x_i − X̄)/m₂ · Σ_{j∈nbr} (x_j − X̄)
    with binary contiguity weights over the occupied-cell universe and
    the NEIGHBORS-ONLY lag (the center is excluded, per the statistic's
    definition — unlike Gi*). `quadrant` labels the cluster type the
    Moran scatterplot reads off the two signs: HH/LL (hot/cold cluster
    core), HL/LH (spatial outliers), NS when either factor is exactly 0
    or the cell has no neighbors.

    Same engine-exact shape as `getis_ord_gi` (one block-donation
    aggregate + 1-row globals; I_i is one rounded closed form of exact
    integers, NULL when m₂ degenerates) — and both statistics reuse the
    identical `_block_sums` plan."""
    j = _block_sums(counts, z, radius, cell_col, n_col)
    d = lambda c: F.col(c).cast("double")
    xbar = d("_sx") / d("_N")
    m2 = d("_sxx") / d("_N") - xbar * xbar
    zval = d("_xval") - xbar
    # neighbors-only lag from the center-inclusive block sums
    lag = (d("s1") - d("_xval")) - (d("k") - F.lit(1.0)) * xbar
    has_nbr = F.col("k") > 1
    moran = F.when(
        has_nbr & (F.col("_sxx") * F.col("_N") != F.col("_sx") * F.col("_sx")),
        F.round(zval / m2 * lag, 9),
    )
    quad = (
        F.when(~has_nbr | (zval == 0) | (lag == 0), F.lit("NS"))
        .when((zval > 0) & (lag > 0), F.lit("HH"))
        .when((zval < 0) & (lag < 0), F.lit("LL"))
        .when((zval > 0) & (lag < 0), F.lit("HL"))
        .otherwise(F.lit("LH"))
    )
    return j.select(
        (
            F.lit(z).cast("long") * F.lit(1 << 58).cast("long")
            + F.shiftleft(F.col("_ix"), 29) + F.col("_iy")
        ).alias("cell"),
        F.col("_xval").alias("x"),
        F.col("k").cast("long").alias("k"),
        F.col("s1").cast("long").alias("s1"),
        moran.alias("moran_i"),
        quad.alias("quadrant"),
    )


def getis_ord_gi(
    counts: DataFrame,
    z: int,
    radius: int = 1,
    cell_col: str = "cell",
    n_col: str = "n",
) -> DataFrame:
    """(cell, x, k, s1, gi_z) per OCCUPIED cell.

    x = the cell's own value, k = occupied cells in its (2r+1)² block
    (self included), s1 = their value sum, gi_z = the Gi* z-score

        gi_z = (S1 − X̄·k) / (S·sqrt((N·k − k²)/(N−1)))

    with X̄ = Σx/N, S = sqrt(Σx²/N − X̄²) over the N occupied cells —
    one rounded (9 dp) expression of exact integer aggregates. Cells
    whose denominator degenerates (k = N: the whole universe is one
    block, or S = 0: constant surface) get NULL. x wraps in longitude,
    block rows past the poles are simply absent (same edge semantics as
    `smooth_tile_counts`)."""
    j = _block_sums(counts, z, radius, cell_col, n_col)
    d = lambda c: F.col(c).cast("double")
    xbar = d("_sx") / d("_N")
    s = F.sqrt(d("_sxx") / d("_N") - xbar * xbar)
    denom = s * F.sqrt(
        (d("_N") * d("k") - d("k") * d("k")) / (d("_N") - F.lit(1.0)))
    gi = F.when(
        (F.col("k") < F.col("_N")) & (F.col("_sxx") * F.col("_N")
                                      != F.col("_sx") * F.col("_sx")),
        F.round((d("s1") - xbar * d("k")) / denom, 9),
    )
    return j.select(
        (
            F.lit(z).cast("long") * F.lit(1 << 58).cast("long")
            + F.shiftleft(F.col("_ix"), 29) + F.col("_iy")
        ).alias("cell"),
        F.col("_xval").alias("x"),
        F.col("k").cast("long").alias("k"),
        F.col("s1").cast("long").alias("s1"),
        gi.alias("gi_z"),
    )
