"""Contribution export: the reference's output layout, Spark-side.

Mirrors `contributions/{latest,history}/...` hive partitioning with GeoParquet
files (`/root/reference/ohsome-contributions/src/main/java/org/heigit/ohsome/
contributions/transformer/Transformer.java:186-209`, `README.md:86-109`):
rows route by `status` (latest / history / deleted / invalid), each partition
directory holds GeoParquet files with the `geo` footer, and a small JSON
manifest records per-status row counts (the `geoparquet_counts` golden of
FIXTURES.md §8).

Single pass: the reference routes each row to a per-status writer during ONE
traversal (`Transformer.java:186-209`); this sink does the same via
`write_geoparquet(partition_by="status")` — tasks split their Arrow batches
by status and write into `status=<v>/` directly. Counts come from the
written parquet footers (metadata only), so the contributions DAG executes
exactly once regardless of how many statuses exist.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame

from ..io.geoparquet import partition_row_counts, write_geoparquet


def write_contribution_export(
    contribs: DataFrame,
    path: str | Path,
    geometry_col: str = "geometry",
    statuses: tuple[str, ...] = ("latest", "history", "deleted", "invalid"),
) -> dict[str, int]:
    """Write status-partitioned GeoParquet; returns per-status row counts."""
    out = Path(path)
    out.mkdir(parents=True, exist_ok=True)
    write_geoparquet(
        contribs,
        out,
        geometry_col=geometry_col,
        no_dict_columns=(geometry_col, "osm_id"),
        partition_by="status",
    )
    counts = {s: 0 for s in statuses}
    counts.update(partition_row_counts(out, "status"))
    (out / "_counts.json").write_text(json.dumps(counts, indent=1, sort_keys=True))
    return counts
