"""The flagship enrichment pipeline: pages → geocoded, tiled contributions.

End-to-end Spark plan mirroring the reference's main job
(`Contributions2Parquet.call`, `/root/reference/ohsome-contributions/src/main/
java/org/heigit/ohsome/contributions/Contributions2Parquet.java:93-146`) over
the graft's input shape:

    pages(url, warc_ts, html, text, lang)
      → extract entity mentions        (JVM regexp + posexplode)
      → geocode                        (broadcast join to gazetteer)
      → country PIP join               (broadcast polygon index, Arrow UDF)
      → cell assignment                (hex r7–10, S2, zxy, XZ2)
      → WKB point geometry             (Arrow UDF)
      → per-cell aggregation           (salted two-level for mega-cells)

Every stage is a DataFrame transformation: Catalyst prunes `html` out of the
scan (we never touch it after generation), pushes filters, and broadcasts the
small sides. The only Python is inside Arrow-batched kernels.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

from ..operators.geocode import extract_mentions, geocode_mentions
from ..operators.spatial_join import build_index, with_countries
from ..operators.tiling import with_cells
from ..sources.countries import fixture_features
from ..sources.gazetteer import gazetteer_df


@F.pandas_udf(BinaryType())
def point_wkb_udf(lon: pd.Series, lat: pd.Series) -> pd.Series:
    """WKB point (JTS-default big-endian 2D); empty point (NaN,NaN) for
    invalid coords (the reference stores an empty geometry for invalid
    nodes — `ContributionGeometry.java:185-191`).

    Fully vectorized: a point WKB is a fixed 21-byte record
    (byte-order 0x00, >u4 type=1, >f8 x, >f8 y), so the whole batch is
    assembled as one (N,21) uint8 matrix — invalid rows masked to NaN —
    and sliced into per-row bytes. No per-row arithmetic in Python."""
    import numpy as np

    x = np.asarray(pd.to_numeric(lon, errors="coerce"), dtype=np.float64)
    y = np.asarray(pd.to_numeric(lat, errors="coerce"), dtype=np.float64)
    valid = (x >= -180.0) & (x <= 180.0) & (y >= -90.0) & (y <= 90.0)  # NaN→False
    x = np.where(valid, x, np.nan)
    y = np.where(valid, y, np.nan)
    n = x.shape[0]
    buf = np.empty((n, 21), dtype=np.uint8)
    buf[:, 0:5] = np.array([0, 0, 0, 0, 1], dtype=np.uint8)  # big-endian, Point
    buf[:, 5:13] = x.astype(">f8").view(np.uint8).reshape(n, 8)
    buf[:, 13:21] = y.astype(">f8").view(np.uint8).reshape(n, 8)
    mem = buf.tobytes()
    return pd.Series([mem[i * 21 : i * 21 + 21] for i in range(n)])


def _empty_point_wkb() -> bytes:
    """The exact 21 bytes point_wkb_udf emits for invalid/missing coords
    (big-endian Point with the masked-NaN ordinates), built with the same
    numpy ops so the coalesce fallback is bit-identical."""
    import numpy as np

    buf = np.empty(21, dtype=np.uint8)
    buf[0:5] = np.array([0, 0, 0, 0, 1], dtype=np.uint8)
    nan = np.array([np.nan], dtype=np.float64).astype(">f8").view(np.uint8)
    buf[5:13] = nan
    buf[13:21] = nan
    return buf.tobytes()


_EMPTY_POINT_WKB = _empty_point_wkb()


# zxy_cell_col evaluated on NULL lon/lat: Spark's greatest/least SKIP
# null operands, so greatest(0, least(null, n-1)) = n-1 for both axes —
# the per-mention JVM expression emitted this concrete cell for
# unmatched mentions, and the join-carried plan must coalesce to the
# identical value (z=12 → ix=iy=4095).
_ZXY_NULL_CELL = 12 * 288230376151711744 + 4095 * 536870912 + 4095


_GAZ_LOCAL_MAX = 50_000  # rows; above this fall back to the Spark path

# Enriched-DEFAULT-gazetteer memo, keyed per session + options. The
# default gazetteer and country features are CODE LITERALS
# (sources/gazetteer.GAZETTEER, sources/countries.fixture_features) —
# their enrichment is a pure function of program constants, equivalent
# to precomputing it at import time. Nothing derived from any input
# table is ever memoized (the rule this respects: every bench/oracle
# run computes from the parquet inputs).
_GAZ_DEFAULT_MEMO: dict = {}


def _enrich_gazetteer_local(
    spark: SparkSession,
    gazetteer: DataFrame,
    index,
    hex_resolutions: tuple[int, ...],
    with_geometry: bool,
    rows: list | None = None,
) -> DataFrame | None:
    """Enriched gazetteer computed DRIVER-SIDE with the same numpy
    kernels the Arrow UDFs wrap (r7): the gazetteer is broadcast-tiny by
    contract, but enriching it through Spark jobs cost a FIXED ~0.6 s of
    Python-worker stage dispatch per pipeline run — measured as the
    whole flagship regression at 1M pages (2.12 s vs 1.43 s), invisible
    at 10M. Returns None when the gazetteer exceeds _GAZ_LOCAL_MAX rows
    (caller falls back to the distributed path).

    Value contract (pinned by the enrich equality tests): identical to
    with_countries + with_cells + point_wkb_udf row by row — including
    NULL cells for invalid/missing coords (the _series_udf mask), [] for
    invalid countries, the zxy clamp (C.zxy_cell is the expression's
    bit-exact twin; NULL coords get _ZXY_NULL_CELL, the JVM expression's
    null-skipping greatest/least output), and the masked-NaN WKB."""
    import numpy as np
    from pyspark.sql.types import (
        ArrayType, BinaryType, DoubleType, LongType, StringType,
        StructField, StructType,
    )

    from ..functions import cells as C

    if rows is None:
        rows = [
            (r["entity"], r["lat"], r["lon"])
            for r in gazetteer.select("entity", "lat", "lon").limit(
                _GAZ_LOCAL_MAX + 1).collect()
        ]
    if len(rows) > _GAZ_LOCAL_MAX:
        return None
    n = len(rows)
    ent = [r[0] for r in rows]
    lat = np.array([float("nan") if r[1] is None else r[1]
                    for r in rows], dtype=np.float64)
    lon = np.array([float("nan") if r[2] is None else r[2]
                    for r in rows], dtype=np.float64)
    with np.errstate(invalid="ignore"):
        ok = (~(np.isnan(lon) | np.isnan(lat))
              & (lon >= -180.0) & (lon <= 180.0)
              & (lat >= -90.0) & (lat <= 90.0))
        # countries: the pip UDF's semantics — [] unless valid
        countries: list[list[str]] = [[] for _ in range(n)]
        if ok.any():
            sel = np.nonzero(ok)[0]
            pts = np.column_stack([lon[sel], lat[sel]])
            uniq, inverse = np.unique(pts, axis=0, return_inverse=True)
            hits = index.join_points_grid(uniq[:, 0], uniq[:, 1])
            for pos, inv in zip(sel, inverse):
                countries[pos] = hits[inv]
        # cell kernels: valid → kernel value, else NULL (_series_udf)
        notnan = ~(np.isnan(lon) | np.isnan(lat))

        def series(fn):
            out = [None] * n
            if notnan.any():
                vals = fn(lat[notnan], lon[notnan])
                for pos, v in zip(np.nonzero(notnan)[0], vals):
                    out[pos] = int(v)
            return out

        hex_cols = {
            r: series(lambda la, lo, r=r: C.hex_cell(la, lo, r))
            for r in hex_resolutions
        }
        s2 = series(lambda la, lo: C.s2_cell_id(la, lo, 12))
        xz2 = series(lambda la, lo: C.xz2_point(lo, la, 16))
        zxy = series(lambda la, lo: C.zxy_cell(lo, la, 12))
        for i in range(n):
            if zxy[i] is None:  # NULL coords: the JVM expression's
                zxy[i] = _ZXY_NULL_CELL  # null-skipping clamp output
        geom = None
        if with_geometry:
            x = np.where(ok, lon, np.nan)
            y = np.where(ok, lat, np.nan)
            buf = np.empty((n, 21), dtype=np.uint8)
            buf[:, 0:5] = np.array([0, 0, 0, 0, 1], dtype=np.uint8)
            buf[:, 5:13] = x.astype(">f8").view(np.uint8).reshape(n, 8)
            buf[:, 13:21] = y.astype(">f8").view(np.uint8).reshape(n, 8)
            mem = buf.tobytes()
            geom = [mem[i * 21:(i + 1) * 21] for i in range(n)]

    def opt(v):
        return None if v is None else v

    data = []
    for i in range(n):
        row = [ent[i],
               None if np.isnan(lat[i]) else float(lat[i]),
               None if np.isnan(lon[i]) else float(lon[i]),
               list(countries[i])]
        row += [opt(hex_cols[r][i]) for r in hex_resolutions]
        row += [opt(s2[i]), int(zxy[i]), opt(xz2[i])]
        if with_geometry:
            row.append(geom[i])
        data.append(tuple(row))
    fields = [
        StructField("entity", StringType()),
        StructField("lat", DoubleType()),
        StructField("lon", DoubleType()),
        StructField("countries", ArrayType(StringType())),
    ]
    fields += [StructField(f"hex_r{r}", LongType())
               for r in hex_resolutions]
    fields += [StructField("s2_cell", LongType()),
               StructField("zxy_cell", LongType()),
               StructField("xz2_code", LongType())]
    if with_geometry:
        fields.append(StructField("geometry", BinaryType()))
    return spark.createDataFrame(data, StructType(fields))


def enrich_pages(
    spark: SparkSession,
    pages: DataFrame,
    features=None,
    gazetteer: DataFrame | None = None,
    hex_resolutions: tuple[int, ...] = (7, 8, 9, 10),
    with_geometry: bool = True,
) -> DataFrame:
    """pages → one enriched row per entity mention."""
    default_fixture = features is None and gazetteer is None
    mentions = extract_mentions(pages)
    # r7 (guide §8: decide with small rows): every mention's coordinates
    # come FROM the gazetteer, so the country set is a function of the
    # entity row — run the PIP kernel once over the (tiny) gazetteer and
    # let the geocode broadcast join carry `countries`, instead of
    # probing the index per mention (the per-mention Arrow PIP stage was
    # ~1.4 s of the 10M-page pipeline). Unmatched mentions get the same
    # empty array the per-mention kernel produced for invalid coords.
    if default_fixture:
        # default fixture gazetteer+features are code literals: enrich
        # once per session from gazetteer_rows() (no collect job, no
        # index rebuild per call — see _GAZ_DEFAULT_MEMO note)
        # applicationId is unique per context — id(spark) could be
        # reused by a NEW session after the old one is GC'd, handing a
        # dead-session DataFrame out of the memo
        key = (spark.sparkContext.applicationId, hex_resolutions,
               with_geometry)
        gaz_cty = _GAZ_DEFAULT_MEMO.get(key)
        if gaz_cty is None:
            from ..sources.gazetteer import gazetteer_rows

            gaz_cty = _enrich_gazetteer_local(
                spark, None, build_index(fixture_features()),
                hex_resolutions, with_geometry, rows=gazetteer_rows(),
            )
            _GAZ_DEFAULT_MEMO[key] = gaz_cty
        geocoded = geocode_mentions(mentions, gaz_cty)
        return _assemble_enriched(geocoded, hex_resolutions, with_geometry)

    features = features if features is not None else fixture_features()
    gazetteer = gazetteer if gazetteer is not None else gazetteer_df(spark)
    index = build_index(features)
    gaz_cty = _enrich_gazetteer_local(
        spark, gazetteer, index, hex_resolutions, with_geometry
    )
    if gaz_cty is None:
        # gazetteer too large to collect: same enrichment as Spark jobs
        gaz_cty = with_cells(
            with_countries(gazetteer, index),
            hex_resolutions=hex_resolutions,
        )
        if with_geometry:
            gaz_cty = gaz_cty.withColumn(
                "geometry", point_wkb_udf(F.col("lon"), F.col("lat"))
            )
    geocoded = geocode_mentions(mentions, gaz_cty)
    return _assemble_enriched(geocoded, hex_resolutions, with_geometry)


def _assemble_enriched(
    geocoded: DataFrame,
    hex_resolutions: tuple[int, ...],
    with_geometry: bool,
) -> DataFrame:
    """Final column order + unmatched-mention fallbacks.

    Unmatched mentions carry NULL enrichment columns from the left
    join. Matching the per-mention plan exactly: the Arrow cell
    kernels (_series_udf) emitted NULL for null coords — the join's
    NULLs already agree — while countries ([]), the JVM zxy
    expression (a concrete clamp cell, see _ZXY_NULL_CELL) and the
    WKB kernel (NaN empty point) emitted non-null values that the
    coalesces below reproduce bit-for-bit."""
    base = [c for c in geocoded.columns
            if not (c.startswith("hex_r") or c in (
                "countries", "s2_cell", "zxy_cell", "xz2_code",
                "geometry"))]
    return geocoded.select(
        *base,
        F.coalesce(
            F.col("countries"), F.array().cast("array<string>")
        ).alias("countries"),
        *[F.col(f"hex_r{r}") for r in hex_resolutions],
        F.col("s2_cell"),
        F.coalesce(F.col("zxy_cell"), F.lit(_ZXY_NULL_CELL))
        .alias("zxy_cell"),
        F.col("xz2_code"),
        *([F.coalesce(F.col("geometry"), F.lit(_EMPTY_POINT_WKB))
           .alias("geometry")] if with_geometry else []),
    )


def enrich_cell_counts(
    spark: SparkSession,
    pages: DataFrame,
    cell_col: str = "zxy_cell",
    salted: bool = True,
) -> DataFrame:
    """The headline aggregate: mentions per cell per country."""
    enriched = enrich_pages(spark, pages, with_geometry=False)
    exploded = enriched.where(F.col("coord_valid")).select(
        cell_col, F.explode_outer("countries").alias("country")
    )
    from ..operators.skew import salted_count

    if salted:
        return salted_count(exploded, [cell_col, "country"], out_col="n")
    return exploded.groupBy(cell_col, "country").agg(F.count("*").alias("n"))


def enrich_tile_counts(
    spark: SparkSession,
    pages: DataFrame,
    salted: bool = True,
) -> DataFrame:
    """The full headline pipeline (BASELINE metric): extract → geocode → PIP
    country join → ALL cell encodes (hex r7–10, S2, zxy, XZ2) → salted
    per-(hex_r8, country) counts carrying the coarser hex levels.

    Unlike enrich_cell_counts (whose agg key lets Catalyst prune the Arrow
    cell kernels), this aggregate consumes every cell column, so the timing
    includes the complete encode work the metric advertises.
    """
    enriched = enrich_pages(spark, pages, with_geometry=False)
    return tile_counts_from_enriched(enriched, salted=salted)


def tile_counts_from_enriched(enriched: DataFrame, salted: bool = True) -> DataFrame:
    """The aggregate half of enrich_tile_counts, over already-enriched rows.

    Factored out so the STREAMING twin shares it verbatim: the stream stage
    materializes enriched rows (per-row transforms only — nothing in the
    micro-batch shuffles) and this aggregate runs over the sink.

    The `approx_*` distinct-cell columns are Datasketches HLL estimates:
    per-salt `hll_sketch_agg` partials merged with `hll_union_agg`. Sketch
    union is exact (unlike the previous summed `count_distinct` partials,
    which over-counted any cell straddling two salt buckets), so the salted
    estimate is bit-identical to a single unsalted sketch of the same rows —
    the salting changes only the shuffle shape, never the value. Estimate
    error is the standard HLL bound (~1.6% rel. std. at lgConfigK=12).

    BEHAVIOR CHANGE (r5, flagged r5-advice): before the sketch switch the
    UNSALTED path used exact `count_distinct`; both paths now return HLL
    estimates, so small inputs that previously saw exact distinct counts
    see ~±1.6% values instead. This is deliberate: the columns are named
    `approx_*`, salted and unsalted must agree bit-for-bit (they are the
    same sketch), and at the 100 TB design point exact distinct per cell
    is a full extra shuffle. Consumers needing exact counts at small
    scale should aggregate `count_distinct` off `enrich_pages` directly.
    """
    exploded = enriched.where(F.col("coord_valid")).select(
        "hex_r7", "hex_r8", "hex_r9", "hex_r10", "s2_cell", "zxy_cell", "xz2_code",
        F.explode_outer("countries").alias("country"),
    )
    from ..operators.skew import salted_agg

    partials = [
        F.count("*").alias("c"),
        F.min("hex_r7").alias("h7"),
        F.hll_sketch_agg("hex_r9").alias("d9p"),
        F.hll_sketch_agg("hex_r10").alias("d10p"),
        F.hll_sketch_agg("s2_cell").alias("s2p"),
        F.hll_sketch_agg("zxy_cell").alias("zxp"),
        F.min("xz2_code").alias("xzp"),
    ]
    finals = [
        F.sum("c").alias("n"),
        F.min("h7").alias("hex_r7"),
        F.hll_sketch_estimate(F.hll_union_agg("d9p")).alias("approx_r9_cells"),
        F.hll_sketch_estimate(F.hll_union_agg("d10p")).alias("approx_r10_cells"),
        F.hll_sketch_estimate(F.hll_union_agg("s2p")).alias("approx_s2_cells"),
        F.hll_sketch_estimate(F.hll_union_agg("zxp")).alias("approx_zxy_cells"),
        F.min("xzp").alias("min_xz2"),
    ]
    if salted:
        return salted_agg(exploded, ["hex_r8", "country"], partials, finals)
    return exploded.groupBy("hex_r8", "country").agg(
        F.count("*").alias("n"),
        F.min("hex_r7").alias("hex_r7"),
        F.hll_sketch_estimate(F.hll_sketch_agg("hex_r9")).alias("approx_r9_cells"),
        F.hll_sketch_estimate(F.hll_sketch_agg("hex_r10")).alias("approx_r10_cells"),
        F.hll_sketch_estimate(F.hll_sketch_agg("s2_cell")).alias("approx_s2_cells"),
        F.hll_sketch_estimate(F.hll_sketch_agg("zxy_cell")).alias("approx_zxy_cells"),
        F.min("xz2_code").alias("min_xz2"),
    )
