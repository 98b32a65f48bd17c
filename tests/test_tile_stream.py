"""Incrementally-maintained tile counts (streaming/tile_stream.py)."""

import numpy as np

from pyspark.sql import functions as F

from ohsome_planet_spark.io.snapshots import SnapshotTable
from ohsome_planet_spark.operators.tiling import zxy_cell_col
from ohsome_planet_spark.streaming.tile_stream import (
    run_tile_maintenance_stream,
)


def test_stream_equals_batch_recompute(spark, tmp_path):
    rng = np.random.default_rng(17)
    inp = tmp_path / "pts"
    inp.mkdir()
    all_pts = []
    # three micro-batch files with overlapping spatial footprints
    for b in range(3):
        lon = rng.uniform(-30 + b * 10, 30 + b * 10, 500)
        lat = rng.uniform(-20, 40, 500)
        pts = [(float(a), float(c)) for a, c in zip(lon, lat)]
        all_pts.extend(pts)
        spark.createDataFrame(pts, "lon double, lat double") \
            .coalesce(1).write.parquet(str(inp / f"batch{b}"))
    # flatten: the file source reads the directory tree
    import shutil

    flat = tmp_path / "flat"
    flat.mkdir()
    i = 0
    for sub in sorted(inp.glob("batch*")):
        for f in sorted(sub.glob("*.parquet")):
            shutil.copy(f, flat / f"part-{i:03d}.parquet")
            i += 1

    q = run_tile_maintenance_stream(
        spark, str(flat), str(tmp_path / "ckpt"), str(tmp_path / "tiles"),
        zoom=10, partition_zoom=5, max_files_per_trigger=1)
    q.awaitTermination(120)

    stored = SnapshotTable(str(tmp_path / "tiles")).read(spark)
    got = {(r["cell"], r["n"]) for r in stored.select("cell", "n").collect()}

    batch = (
        spark.createDataFrame(all_pts, "lon double, lat double")
        .select(zxy_cell_col(F.col("lon"), F.col("lat"), 10).alias("cell"))
        .groupBy("cell").agg(F.count("*").alias("n"))
    )
    want = {(r["cell"], r["n"]) for r in batch.collect()}
    assert got == want

    # every micro-batch committed a snapshot -> time travel sees history
    t = SnapshotTable(str(tmp_path / "tiles"))
    assert len(t.snapshot_chain()) == 3
    first = t.read(spark, snapshot_id=t.snapshot_chain()[-1])
    assert first.agg(F.sum("n")).collect()[0][0] == 500
