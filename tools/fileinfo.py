"""fileinfo — the reference's second CLI entry point (`FileInfo.call`,
`/root/reference/ohsome-contributions/src/main/java/org/heigit/ohsome/
contributions/FileInfo.java:18-50`), Spark-side: print the metadata of an
input without scanning data.

  python tools/fileinfo.py <path.osm.pbf | snapshot-table-dir | parquet-dir>
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    target = Path(sys.argv[1])
    if target.is_file() and target.suffix == ".pbf" or str(target).endswith(".osm.pbf"):
        from ohsome_planet_spark.sources.pbf import (
            _read_blob_payload,
            decode_header_block,
            scan_blob_headers,
        )

        headers = scan_blob_headers(target)
        hdr_blob = next(h for h in headers if h["type"] == "OSMHeader")
        header = decode_header_block(
            _read_blob_payload(str(target), hdr_blob["offset"], hdr_blob["size"])
        )
        print(json.dumps(
            {
                "kind": "osm.pbf",
                "blobs": len(headers),
                "data_blobs": sum(1 for h in headers if h["type"] == "OSMData"),
                "bbox": header.get("bbox"),
                "required_features": header.get("required_features"),
                "optional_features": header.get("optional_features"),
                # osmosis replication block (`Header.java:57-93`)
                "replication_timestamp": header.get("replication_timestamp"),
                "replication_sequence_number": header.get(
                    "replication_sequence_number"),
                "replication_base_url": header.get("replication_base_url"),
            },
            indent=1,
        ))
        return
    if (target / "CURRENT").exists():
        from ohsome_planet_spark.io.snapshots import SnapshotTable

        t = SnapshotTable(target)
        m = t.manifest()
        print(json.dumps(
            {
                "kind": "snapshot-table",
                "current_snapshot": t.current_snapshot_id(),
                "snapshot_chain": t.snapshot_chain(),
                "partitions": {
                    k: {"rows": v["rows"], "files": len(v["files"])}
                    for k, v in (m or {}).get("partitions", {}).items()
                },
            },
            indent=1,
        ))
        return
    # parquet dir: schema + file stats without a full scan
    import pyarrow.parquet as pq

    files = sorted(target.glob("*.parquet"))
    total_rows = 0
    schema = None
    for f in files:
        md = pq.read_metadata(f)
        total_rows += md.num_rows
        schema = pq.read_schema(f)
    print(json.dumps(
        {
            "kind": "parquet",
            "files": len(files),
            "rows": total_rows,
            "columns": schema.names if schema else [],
            "geo": bool(schema and (schema.metadata or {}).get(b"geo")),
        },
        indent=1,
    ))


if __name__ == "__main__":
    main()
