"""icelite — snapshot-manifest tables: atomic commits, lineage, resume.

The container ships no Iceberg runtime jar, so the engine provides a
lightweight table layer with the Iceberg semantics the north rule needs:
snapshot isolation (readers see only committed manifests), atomic commit
(manifest write + CURRENT pointer swap), per-partition lineage + metrics,
and incremental resume (a failed run recommits only missing partitions from
the last snapshot checkpoint). The write path mirrors the reference's
progress/ → contributions/ atomic finalize (`/root/reference/
ohsome-contributions/src/main/java/org/heigit/ohsome/contributions/
transformer/Transformer.java:168-225`, `Writer.java:76-96`); on a real
deployment this layer is swapped for Iceberg catalog commits — the operator
API (write_partitions / resume) is deliberately identical in shape.
Environment re-verified round 6 (2026-08-18): no iceberg-spark-runtime jar
in pyspark/jars or elsewhere in the container — the stand-in remains.

Layout:
    <root>/data/<part_col>=<value>/snap-<id>-part-*.parquet
    <root>/manifests/snap-<id>.json
    <root>/CURRENT                      (text: current snapshot id)

Manifest: {snapshot_id, parent_id, partitions: {value: {files, rows,
metrics}}} — child manifests inherit the parent's committed partitions, so
lineage is the full chain and readers need only CURRENT.
"""

from __future__ import annotations

import json
import shutil
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SnapshotTable:
    def __init__(self, root: str | Path):
        self.root = Path(root)
        (self.root / "data").mkdir(parents=True, exist_ok=True)
        (self.root / "manifests").mkdir(parents=True, exist_ok=True)

    # -- metadata ------------------------------------------------------------
    def current_snapshot_id(self) -> str | None:
        cur = self.root / "CURRENT"
        if not cur.exists():
            return None
        return cur.read_text().strip() or None

    def manifest(self, snapshot_id: str | None = None) -> dict | None:
        sid = snapshot_id or self.current_snapshot_id()
        if sid is None:
            return None
        p = self.root / "manifests" / f"snap-{sid}.json"
        if not p.exists():
            return None
        return json.loads(p.read_text())

    def committed_partitions(self) -> dict[str, dict]:
        m = self.manifest()
        return dict(m["partitions"]) if m else {}

    def snapshot_chain(self) -> list[str]:
        chain = []
        sid = self.current_snapshot_id()
        while sid:
            chain.append(sid)
            m = self.manifest(sid)
            sid = m.get("parent_id") if m else None
        return chain

    # -- commit --------------------------------------------------------------
    def _commit(self, new_partitions: dict[str, dict], extra: dict | None = None) -> str:
        parent = self.current_snapshot_id()
        merged = self.committed_partitions()
        merged.update(new_partitions)
        sid = uuid.uuid4().hex[:12]
        manifest = {
            "snapshot_id": sid,
            "parent_id": parent,
            "partitions": merged,
            "new_partitions": sorted(new_partitions),
        }
        if extra:
            manifest.update(extra)
        mpath = self.root / "manifests" / f"snap-{sid}.json"
        tmp = mpath.with_suffix(".json.tmp")
        tmp.write_text(json.dumps(manifest, indent=1, sort_keys=True))
        tmp.rename(mpath)
        cur_tmp = self.root / "CURRENT.tmp"
        cur_tmp.write_text(sid)
        cur_tmp.rename(self.root / "CURRENT")  # atomic pointer swap
        return sid

    # -- write / resume --------------------------------------------------------
    def write_partitions(
        self,
        df: DataFrame,
        partition_col: str,
        only_missing: bool = True,
        metrics: dict | None = None,
        fail_partitions: set | None = None,
    ) -> dict:
        """Write df partitioned by `partition_col`; commit a new snapshot.

        SINGLE PASS over df: already-committed partitions are excluded by a
        pushed-down filter, the remainder is written once with
        `partitionBy` to a staging root, and the commit loop only moves
        files (row counts come from parquet footers — no re-read). The
        upstream DAG therefore executes exactly once, matching the
        reference's one-pass progress/ → contributions/ finalize
        (`Transformer.java:168-225`).

        only_missing=True → partitions already committed are skipped
        (idempotent resume: a re-run after a failure writes only the
        remainder); `skipped` reports the committed partitions that were
        not recomputed. fail_partitions injects failures mid-commit for
        tests (nothing is committed on failure — the manifest is atomic).
        Returns {snapshot_id, written, skipped}.
        """
        import pyarrow.parquet as pq

        committed = self.committed_partitions() if only_missing else {}
        batch = uuid.uuid4().hex[:8]
        staging_root = self.root / "data" / f"_staging-{batch}"
        part_key = "__snap_part"

        work = df
        if committed:
            work = work.where(
                ~F.col(partition_col).cast("string").isin(*committed.keys())
            )
        # duplicate the partition column: partitionBy consumes __snap_part,
        # so the data files keep the original column (schema parity on read)
        work = work.withColumn(part_key, F.col(partition_col).cast("string"))
        work.write.mode("overwrite").partitionBy(part_key).parquet(str(staging_root))

        fail_strs = {str(v) for v in (fail_partitions or ())}
        new_parts: dict[str, dict] = {}
        try:
            for d in sorted(staging_root.glob(f"{part_key}=*")):
                if not d.is_dir():
                    continue
                v = d.name.split("=", 1)[1]
                if v in fail_strs:
                    raise RuntimeError(f"injected failure writing partition {v}")
                part_dir = self.root / "data" / f"{partition_col}={v}"
                part_dir.mkdir(parents=True, exist_ok=True)
                files, rows = [], 0
                for f in sorted(d.glob("*.parquet")):
                    rows += pq.ParquetFile(f).metadata.num_rows  # footer only
                    dest = part_dir / f"snap-{batch}-{f.name}"
                    f.rename(dest)
                    files.append(str(dest.relative_to(self.root)))
                new_parts[v] = {
                    "files": files,
                    "rows": rows,
                    "metrics": (metrics or {}).get(v, {}),
                }
        finally:
            shutil.rmtree(staging_root, ignore_errors=True)
        sid = self._commit(new_parts)
        return {
            "snapshot_id": sid,
            "written": sorted(new_parts),
            "skipped": sorted(committed),
        }

    def overwrite_partitions(
        self,
        df: DataFrame,
        partition_col: str,
        metrics: dict | None = None,
    ) -> dict:
        """Dynamic partition overwrite (Iceberg's INSERT OVERWRITE /
        replaceWhere): every partition PRESENT IN df is atomically
        replaced in the new snapshot; partitions absent from df are
        carried forward untouched. The CDC refresh primitive — recompute
        yesterday's cell-range partitions, leave the rest of the table
        alone.

        Isolation comes from the manifest, not file deletion: replaced
        partitions' old files stay on disk backing earlier snapshots
        (time travel / rollback) until expire_snapshots() reclaims them.
        Readers of the previous snapshot are never disturbed; the commit
        is the same atomic CURRENT pointer swap as write_partitions."""
        return self.write_partitions(
            df, partition_col, only_missing=False, metrics=metrics)

    def read(self, spark: SparkSession, snapshot_id: str | None = None) -> DataFrame:
        """Read exactly the files of a snapshot (default: current) —
        snapshot isolation plus Iceberg-style time travel by snapshot id."""
        m = self.manifest(snapshot_id)
        if m is None:
            raise FileNotFoundError(f"no committed snapshot at {self.root}")
        files = [str(self.root / f) for p in m["partitions"].values() for f in p["files"]]
        if not files:
            raise FileNotFoundError(f"snapshot {m['snapshot_id']} has no files")
        return spark.read.parquet(*files)

    def rollback(self, snapshot_id: str) -> None:
        if self.manifest(snapshot_id) is None:
            raise KeyError(snapshot_id)
        cur_tmp = self.root / "CURRENT.tmp"
        cur_tmp.write_text(snapshot_id)
        cur_tmp.rename(self.root / "CURRENT")

    # -- maintenance (Iceberg rewriteDataFiles / expireSnapshots analogs) ----
    def compact(
        self,
        spark: SparkSession,
        target_file_bytes: int = 128 * 1024 * 1024,
        partitions: set[str] | None = None,
    ) -> dict:
        """Bin-pack each committed partition's files toward the target size,
        committing a NEW snapshot whose manifest points at the rewritten
        files (Iceberg's rewrite_data_files). The small-files problem is the
        classic failure mode of incremental 100 TB pipelines: thousands of
        resume commits × partitions → footer-read amplification on every
        scan. Old files stay on disk so earlier snapshots keep time-traveling
        until expire_snapshots() garbage-collects them. Row counts are
        re-checked per partition (footer sums must match the manifest).
        """
        import math

        import pyarrow.parquet as pq

        committed = self.committed_partitions()
        batch = uuid.uuid4().hex[:8]
        new_parts: dict[str, dict] = {}
        for v, meta in sorted(committed.items()):
            if partitions is not None and v not in partitions:
                continue
            files = [self.root / f for f in meta["files"]]
            total = sum(f.stat().st_size for f in files)
            n_out = max(1, math.ceil(total / target_file_bytes))
            if len(files) <= n_out:
                continue  # already compact enough
            staging = self.root / "data" / f"_compact-{batch}-{v}"
            spark.read.parquet(*[str(f) for f in files]).coalesce(
                n_out
            ).write.mode("overwrite").parquet(str(staging))
            part_dir = files[0].parent
            out_files, rows = [], 0
            try:
                for f in sorted(staging.glob("*.parquet")):
                    rows += pq.ParquetFile(f).metadata.num_rows
                    dest = part_dir / f"snap-{batch}-{f.name}"
                    f.rename(dest)
                    out_files.append(str(dest.relative_to(self.root)))
            finally:
                shutil.rmtree(staging, ignore_errors=True)
            if rows != meta["rows"]:
                raise RuntimeError(
                    f"compaction row mismatch in partition {v}: "
                    f"{rows} != {meta['rows']}")
            new_meta = dict(meta)
            new_meta.update(files=out_files, rows=rows)
            new_meta["metrics"] = dict(meta.get("metrics") or {})
            new_meta["metrics"]["compacted_from_files"] = len(files)
            new_parts[v] = new_meta
        if not new_parts:
            return {"snapshot_id": self.current_snapshot_id(), "compacted": []}
        sid = self._commit(new_parts, extra={"operation": "compact"})
        return {"snapshot_id": sid, "compacted": sorted(new_parts)}

    def expire_snapshots(self, keep_last: int = 1) -> dict:
        """Drop all but the newest `keep_last` snapshots of the chain and
        delete data files no kept manifest references (Iceberg's
        expire_snapshots — the point where compaction actually reclaims
        space; until then old files back time travel)."""
        chain = self.snapshot_chain()
        keep = set(chain[:max(1, keep_last)])
        keep_files: set[str] = set()
        for sid in keep:
            m = self.manifest(sid)
            for p in m["partitions"].values():
                keep_files.update(p["files"])
        removed_files = []
        for f in (self.root / "data").rglob("*.parquet"):
            rel = str(f.relative_to(self.root))
            if rel not in keep_files:
                f.unlink()
                removed_files.append(rel)
        removed_snapshots = []
        for mp in (self.root / "manifests").glob("snap-*.json"):
            sid = mp.stem[len("snap-"):]
            if sid not in keep:
                mp.unlink()
                removed_snapshots.append(sid)
        return {
            "removed_snapshots": sorted(removed_snapshots),
            "removed_files": sorted(removed_files),
            "kept": sorted(keep),
        }
