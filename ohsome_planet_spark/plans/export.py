"""Contribution export: the reference's output layout, Spark-side.

Mirrors `contributions/{latest,history}/...` hive partitioning with GeoParquet
files (`/root/reference/ohsome-contributions/src/main/java/org/heigit/ohsome/
contributions/transformer/Transformer.java:186-209`, `README.md:86-109`):
rows route by `status` (latest / history / deleted / invalid), each partition
directory holds GeoParquet files with the `geo` footer, and a small JSON
manifest records per-status row counts (the `geoparquet_counts` golden of
FIXTURES.md §8).
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..io.geoparquet import write_geoparquet


def write_contribution_export(
    contribs: DataFrame,
    path: str | Path,
    geometry_col: str = "geometry",
    statuses: tuple[str, ...] = ("latest", "history", "deleted", "invalid"),
) -> dict[str, int]:
    """Write status-partitioned GeoParquet; returns per-status row counts."""
    out = Path(path)
    out.mkdir(parents=True, exist_ok=True)
    counts: dict[str, int] = {}
    for status in statuses:
        part = contribs.where(F.col("status") == status)
        n = part.count()
        counts[status] = n
        if n == 0:
            continue
        write_geoparquet(
            part,
            out / f"status={status}",
            geometry_col=geometry_col,
            no_dict_columns=(geometry_col, "osm_id"),
        )
    (out / "_counts.json").write_text(json.dumps(counts, indent=1, sort_keys=True))
    return counts
