"""Broadcast point-in-polygon spatial join (country enrichment).

The Spark shape of the reference's spatial join stage
(`SpatialGridJoiner.join`, `/root/reference/ohsome-contributions/src/main/
java/org/heigit/ohsome/contributions/spatialjoin/SpatialGridJoiner.java:48-62`):

- the polygon index is built once on the driver and **broadcast** (the
  reference builds its HPR-tree/grid once per process — same idea, but
  Spark's broadcast gives it to every executor);
- the probe runs inside an Arrow-batched pandas UDF, vectorized per polygon
  part over the whole batch — zero per-row Python;
- the executor-side index object is cached per Python worker process via the
  broadcast (deserialized once, reused across batches), mirroring the
  reference's prepared-geometry cache (`SpatialGridJoiner.fromCSVGrid:19-23`);
- output is a sorted `array<string>` of country ids per point — set
  semantics exactly like the reference (a point in overlapping features gets
  all of them).

Invalid coordinates (per coord_valid) get an empty array — the reference's
empty-geometry → empty-set behavior.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from ..functions.pip_index import PolygonIndex


def build_index(features, grid_zoom: int | None = 8) -> PolygonIndex:
    return PolygonIndex(features, grid_zoom=grid_zoom)


def countries_udf(spark, index: PolygonIndex, use_grid: bool = True):
    """Returns a pandas UDF (lon, lat) → array<string> over broadcast index."""
    bc = spark.sparkContext.broadcast(index)

    @F.pandas_udf(ArrayType(StringType()))
    def pip_countries(lon: pd.Series, lat: pd.Series) -> pd.Series:
        idx = bc.value
        lon_v = lon.to_numpy(dtype=np.float64, na_value=np.nan)
        lat_v = lat.to_numpy(dtype=np.float64, na_value=np.nan)
        ok = ~(np.isnan(lon_v) | np.isnan(lat_v))
        ok &= (lon_v >= -180.0) & (lon_v <= 180.0) & (lat_v >= -90.0) & (lat_v <= 90.0)
        result: list[list[str]] = [[]] * len(lon_v)
        if ok.any():
            sel = np.nonzero(ok)[0]
            # memoize repeated coordinates: entity mentions repeat massively,
            # so probe only the batch's unique points (the reference memoizes
            # geometry per contribution the same way — Contribution.data,
            # `contrib/Contribution.java:26-28`)
            pts = np.column_stack([lon_v[sel], lat_v[sel]])
            uniq, inverse = np.unique(pts, axis=0, return_inverse=True)
            join = idx.join_points_grid if use_grid else idx.join_points
            hits = join(uniq[:, 0], uniq[:, 1])
            for pos, inv in zip(sel, inverse):
                result[pos] = hits[inv]
        return pd.Series(result)

    # asNondeterministic (r7, optimization-guide §4.4): a filter derived
    # from the UDF's output (e.g. the size(countries) > 0 an explode
    # generates) otherwise gets pushed below the projection WITH A COPY
    # of the UDF — the executed r6 pip_countries plan ran this kernel
    # twice per row, once below the pushed filter and once above it.
    # The kernel is pure; the flag only forbids the optimizer to
    # duplicate/reorder it, it does not change any result.
    return pip_countries.asNondeterministic()


def with_countries(
    points: DataFrame,
    index: PolygonIndex,
    lon_col: str = "lon",
    lat_col: str = "lat",
    out_col: str = "countries",
    use_grid: bool = True,
) -> DataFrame:
    udf = countries_udf(points.sparkSession, index, use_grid=use_grid)
    return points.withColumn(out_col, udf(F.col(lon_col), F.col(lat_col)))
