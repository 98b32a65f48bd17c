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

from .tiling import zxy_cell_col


def _block_sums(counts, z, radius, cell_col, n_col, by=None,
                cache_slot="hotspot_base"):
    """Shared (center, x, k, s1) + globals builder for the local spatial
    statistics: k/s1 are the (2r+1)²-block occupied-cell count and value
    sum INCLUDING the center (callers subtract the center for
    neighbors-only statistics). `by` (optional column name in `counts`)
    partitions everything — donations, globals, the center join — per
    group: the per-time-bin mode `emerging_hotspots` runs in (globals
    then broadcast-join on the group key instead of a cross join)."""
    n_tiles = 1 << z
    if 2 * radius + 1 > n_tiles:
        # a block wider than the grid wraps two offsets onto the same x
        # cell, double-counting that neighbor in k and s1
        raise ValueError("block span 2*radius+1 must be <= 2^z tiles")
    mask = (1 << 29) - 1
    keys = [by] if by else []
    # base feeds THREE consumers (donations, globals, centers); without a
    # persist Spark recomputes the upstream counts aggregate — typically a
    # full shuffle over the raw points — once per consumer (the dbscan
    # lesson). The cached frame is O(occupied cells), tiny next to points.
    # The persist is slot-bounded (r7, cache_util) so repeated calls keep
    # ONE live cache entry; callers whose input is already a computed
    # tiny frame (the streaming per-window loop) pass cache_slot=None to
    # skip caching entirely rather than thrash the slot.
    base = counts.select(
        *keys,
        F.shiftright(cell_col, 29).bitwiseAND(F.lit(mask)).alias("_x"),
        F.col(cell_col).bitwiseAND(F.lit(mask)).alias("_y"),
        F.col(n_col).cast("long").alias("_n"),
    )
    if cache_slot:
        from .cache_util import swap_persist

        base = swap_persist(cache_slot, base)
    offs = F.explode(
        F.array(*[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in range(-radius, radius + 1)
            for dy in range(-radius, radius + 1)
        ])
    ).alias("_o")
    donated = (
        base.select(*keys, "_x", "_y", F.col("_n").alias("_dn"), offs)
        .select(
            *keys,
            F.pmod(F.col("_x") + F.col("_o.dx"), F.lit(n_tiles)).alias("_cx"),
            (F.col("_y") + F.col("_o.dy")).alias("_cy"),
            "_dn",
        )
        .where((F.col("_cy") >= 0) & (F.col("_cy") < n_tiles))
        .groupBy(*keys, "_cx", "_cy")
        .agg(F.sum("_dn").alias("s1"), F.count("*").alias("k"))
    )
    glob = base.groupBy(*keys).agg(
        F.count("*").alias("_N"),
        F.sum("_n").alias("_sx"),
        F.sum(F.col("_n") * F.col("_n")).alias("_sxx"),
        # min/max carry the variance-degeneracy test: S == 0 iff all
        # values are equal iff min == max — exact AND overflow-free,
        # unlike comparing Σx²·N with (Σx)² (whose longs wrap once
        # Σx > ~3e9 — ARITHMETIC_OVERFLOW under ANSI, silent corruption
        # without)
        F.min("_n").alias("_mnv"),
        F.max("_n").alias("_mxv"),
    )
    center = base.select(
        *keys,
        F.col("_x").alias("_ix"), F.col("_y").alias("_iy"),
        F.col("_n").alias("_xval"),
    )
    cond = (F.col("_ix") == F.col("_cx")) & (F.col("_iy") == F.col("_cy"))
    if by:
        return (
            center.join(
                donated.withColumnRenamed(by, "_gd"),
                (F.col(by) == F.col("_gd")) & cond,
            )
            .join(
                F.broadcast(glob.withColumnRenamed(by, "_gg")),
                F.col(by) == F.col("_gg"),
            )
            .drop("_gd", "_gg")
        )
    return center.join(donated, cond).crossJoin(F.broadcast(glob))


def _repack_cell(z):
    return (
        F.lit(z).cast("long") * F.lit(1 << 58).cast("long")
        + F.shiftleft(F.col("_ix"), 29) + F.col("_iy")
    ).alias("cell")


def _gi_z_expr():
    """The Gi* z-score closed form over a `_block_sums` row — shared by
    the static and the per-time-bin (emerging) statistics."""
    d = lambda c: F.col(c).cast("double")
    xbar = d("_sx") / d("_N")
    s = F.sqrt(d("_sxx") / d("_N") - xbar * xbar)
    denom = s * F.sqrt(
        (d("_N") * d("k") - d("k") * d("k")) / (d("_N") - F.lit(1.0)))
    return F.when(
        (F.col("k") < F.col("_N")) & (F.col("_mnv") != F.col("_mxv")),
        F.round((d("s1") - xbar * d("k")) / denom, 9),
    )


def emerging_hotspots(
    points: DataFrame,
    z: int,
    bin_seconds: int,
    origin: str = "2020-01-01 00:00:00",
    radius: int = 1,
    hot_z: float = 1.96,
    ts_col: str = "ts",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Emerging-hotspot analysis (the space-time-cube workflow): Gi* per
    (time bin, cell) with the per-bin occupied-cell universe, then a
    per-cell Mann–Kendall trend over the bin-ordered z-series and a
    category inspired by the ArcGIS taxonomy:

      none          never hot (|gi| series has no bin > hot_z)
      new           hot in the latest bin, never before
      intensifying  hot in the latest bin, MK S > 0 (rising trend)
      diminishing   hot in the latest bin, MK S < 0
      persistent    hot in the latest bin, MK S = 0
      historical    hot in some earlier bin only

    Engine-exact throughout: bins are integer microsecond arithmetic
    from a fixed origin (no session-timezone epoch), the per-bin Gi* is
    the shared rounded closed form, and MK S = Σ_{i<j} sign(g_j − g_i)
    is an integer computed by exact double comparisons over the sorted
    series (NULL-gi bins excluded; cells absent from a bin contribute no
    slot — the occupied-cube convention, documented engine choice vs
    ArcGIS's dense cube). `last_hot` keys off the GLOBAL latest bin.

    Output: (cell, n_bins, n_hot, mk_s, last_hot, category).

    Scale: one (bin, cell) aggregate over the points, the `_block_sums`
    per-bin donation join, one per-cell series aggregate whose arrays
    are bounded by the bin count. Nothing quadratic in cells or points;
    the MK pair loop is O(bins²) per cell with bins ≤ dozens."""
    bin_c = F.floor(
        F.expr(f"timestampdiff(MICROSECOND, TIMESTAMP'{origin}', {ts_col})")
        / F.lit(int(bin_seconds) * 1_000_000)
    ).cast("long").alias("bin")
    counts = (
        points.select(
            bin_c,
            zxy_cell_col(F.col(lon_col), F.col(lat_col), z).alias("cell"),
        )
        .groupBy("bin", "cell").agg(F.count("*").alias("n"))
    )
    j = _block_sums(counts, z, radius, "cell", "n", by="bin")
    from .cache_util import swap_persist

    per = swap_persist("hotspot_per_bin", j.select(
        F.col("bin"), _repack_cell(z), _gi_z_expr().alias("gi_z")
    ).where(F.col("gi_z").isNotNull()))

    latest = per.agg(F.max("bin").alias("_bin_max"))
    hot = F.col("gi_z") > F.lit(float(hot_z))
    ser = (
        per.crossJoin(F.broadcast(latest))
        .groupBy("cell")
        .agg(
            F.count("*").alias("n_bins"),
            F.sum(hot.cast("long")).alias("n_hot"),
            F.max((hot & (F.col("bin") == F.col("_bin_max"))).cast("int"))
            .alias("_last_hot_i"),
            F.array_sort(F.collect_list(F.struct("bin", "gi_z")))
            .alias("_arr"),
        )
    )
    # MK S: Σ over ordered pairs of sign(later − earlier); Spark's
    # sequence(1, 0) DESCENDS, so the <2-slot case is guarded explicitly
    mk = F.expr(
        "CASE WHEN size(_arr) < 2 THEN 0L ELSE aggregate(flatten("
        "  transform(sequence(1, size(_arr) - 1), j ->"
        "    transform(sequence(0, j - 1), i ->"
        "      CASE WHEN _arr[j].gi_z > _arr[i].gi_z THEN 1L"
        "           WHEN _arr[j].gi_z < _arr[i].gi_z THEN -1L"
        "           ELSE 0L END))),"
        "  0L, (acc, x) -> acc + x) END"
    )
    last_hot = F.col("_last_hot_i") == 1
    cat = (
        F.when(F.col("n_hot") == 0, F.lit("none"))
        .when(last_hot & (F.col("n_hot") == 1), F.lit("new"))
        .when(last_hot & (F.col("mk_s") > 0), F.lit("intensifying"))
        .when(last_hot & (F.col("mk_s") < 0), F.lit("diminishing"))
        .when(last_hot, F.lit("persistent"))
        .otherwise(F.lit("historical"))
    )
    return (
        ser.withColumn("mk_s", mk)
        .select(
            "cell",
            F.col("n_bins").cast("long").alias("n_bins"),
            F.col("n_hot").cast("long").alias("n_hot"),
            "mk_s",
            last_hot.alias("last_hot"),
            cat.alias("category"),
        )
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
        has_nbr & (F.col("_mnv") != F.col("_mxv")),
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
    cache_slot: str | None = "hotspot_base",
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
    j = _block_sums(counts, z, radius, cell_col, n_col,
                    cache_slot=cache_slot)
    return j.select(
        _repack_cell(z),
        F.col("_xval").alias("x"),
        F.col("k").cast("long").alias("k"),
        F.col("s1").cast("long").alias("s1"),
        _gi_z_expr().alias("gi_z"),
    )
