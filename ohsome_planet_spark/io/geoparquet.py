"""GeoParquet sink: distributed parquet writes with `geo` footer metadata.

Spark's parquet writer cannot attach custom key/value footer metadata, so the
sink writes files from inside the tasks with pyarrow (one file per partition,
Arrow batches — no driver collect). This mirrors the reference's writer
configuration (`/root/reference/ohsome-contributions/src/main/java/org/
heigit/ohsome/contributions/transformer/Transformer.java:110-149`): GeoParquet
`geo` metadata declaring the WKB geometry column, ZSTD compression, and the
same per-column tuning intents (bloom-filter columns, dictionary disabled for
id-like columns).
"""

from __future__ import annotations

import json
import os
import uuid
from pathlib import Path

from pyspark.sql import DataFrame

GEOPARQUET_VERSION = "1.1.0"


def geo_metadata(geometry_col: str = "geometry", geometry_types: list[str] | None = None) -> dict:
    return {
        "version": GEOPARQUET_VERSION,
        "primary_column": geometry_col,
        "columns": {
            geometry_col: {
                "encoding": "WKB",
                "geometry_types": geometry_types or [],
                "crs": None,  # OGC:CRS84 default per GeoParquet spec
            }
        },
    }


def write_geoparquet(
    df: DataFrame,
    path: str | Path,
    geometry_col: str = "geometry",
    geometry_types: list[str] | None = None,
    bloom_columns: tuple[str, ...] = (),
    no_dict_columns: tuple[str, ...] = (),
    compression: str = "zstd",
    row_group_rows: int = 128 * 1024,
) -> list[str]:
    """Write df as GeoParquet; returns the written file names.

    Each task writes its own file via mapInArrow (distributed, no shuffle);
    the 'geo' JSON lands in every footer.
    """
    import pyarrow as pa  # noqa: F401 (imported in tasks too)

    out_dir = Path(path)
    out_dir.mkdir(parents=True, exist_ok=True)
    meta_json = json.dumps(geo_metadata(geometry_col, geometry_types))
    out_str = str(out_dir)
    blooms = list(bloom_columns)
    no_dict = list(no_dict_columns)

    def write_partition(batches):
        import pyarrow as pa
        import pyarrow.parquet as pq

        batches = list(batches)
        if batches:
            table = pa.Table.from_batches(batches)
            schema = table.schema.with_metadata(
                {**(table.schema.metadata or {}), b"geo": meta_json.encode()}
            )
            table = table.replace_schema_metadata(schema.metadata)
            fname = os.path.join(out_str, f"part-{uuid.uuid4().hex}.parquet")
            use_dict: bool | list[str] = [
                c for c in table.column_names if c not in no_dict
            ] if no_dict else True
            kwargs = dict(
                compression=compression,
                row_group_size=row_group_rows,
                use_dictionary=use_dict,
                data_page_version="2.0",
            )
            try:  # bloom filters need pyarrow ≥ 17; degrade gracefully
                pq.write_table(table, fname, bloom_filter_columns=blooms or None, **kwargs)
            except TypeError:
                pq.write_table(table, fname, **kwargs)
        if False:
            yield  # generator with no output rows

    # mapInArrow needs an output schema; emit zero rows of a tiny schema
    import pyarrow as pa

    df.mapInArrow(write_partition, "dummy int").count()
    return sorted(os.path.basename(p) for p in Path(out_str).glob("part-*.parquet"))


def read_geo_metadata(file_path: str | Path) -> dict | None:
    import pyarrow.parquet as pq

    meta = pq.read_schema(str(file_path)).metadata or {}
    raw = meta.get(b"geo")
    return json.loads(raw.decode()) if raw else None
