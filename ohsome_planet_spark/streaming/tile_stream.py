"""Incrementally-maintained tile counts: streaming → snapshot table.

The materialized-view story: per-cell counts live in a
`SnapshotTable` partitioned by a coarse parent tile, and every
micro-batch REFRESHES ONLY THE PARTITIONS IT TOUCHED via
`overwrite_partitions` (the CDC primitive) — merging the batch's delta
into the stored totals. Between commits readers keep snapshot isolation;
after each commit the table equals a full batch recompute over
everything ingested so far (tested).

Why this shape at scale:
* a complete-mode streaming aggregate would hold every cell in the state
  store and rewrite the whole sink each trigger;
* here the state IS the table; each trigger's work is proportional to
  the batch's spatial footprint (a crawl's updates cluster heavily), and
  failure recovery is the stream checkpoint + the table's atomic
  manifest — either the batch committed or it didn't.

The merge runs inside foreachBatch with the BATCH operators (zxy assign
+ groupBy count + parent rollup for the partition key), so stream and
batch semantics cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io.snapshots import SnapshotTable
from ..operators.tiling import zxy_cell_col, zxy_parent_col


def _batch_counts(df: DataFrame, zoom: int, partition_zoom: int) -> DataFrame:
    cells = df.select(
        zxy_cell_col(F.col("lon"), F.col("lat"), zoom).alias("cell"))
    counts = cells.groupBy("cell").agg(F.count("*").alias("n"))
    return counts.withColumn(
        "part", zxy_parent_col(F.col("cell"), zoom, partition_zoom))


def run_tile_maintenance_stream(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    table_root: str,
    zoom: int = 12,
    partition_zoom: int = 6,
    max_files_per_trigger: int = 1,
):
    """File-source point stream → incrementally-maintained per-cell count
    table. Drains available files (availableNow) and returns the query;
    read the result with SnapshotTable(table_root).read(spark)."""
    table = SnapshotTable(table_root)

    src = (
        spark.readStream.schema("lon double, lat double")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        delta = _batch_counts(batch_df, zoom, partition_zoom)
        touched = [r["part"] for r in delta.select("part").distinct().collect()]
        if not touched:
            return
        try:
            stored = table.read(batch_df.sparkSession).where(
                F.col("part").isin(touched))
        except FileNotFoundError:
            stored = None
        if stored is not None:
            merged = (
                delta.unionByName(stored)
                .groupBy("part", "cell").agg(F.sum("n").alias("n"))
            )
        else:
            merged = delta.select("part", "cell", "n")
        table.overwrite_partitions(merged, "part")

    q = (
        src.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    return q
