"""Streaming hotspot twin == batch Gi*, over a replayed file stream."""

from __future__ import annotations

import os
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from ohsome_planet_spark.operators.hotspot import getis_ord_gi
from ohsome_planet_spark.operators.tiling import zxy_cell_col
from ohsome_planet_spark.streaming.hotspot_stream import (
    hotspots_per_window,
    run_hotspot_stream,
)


def _mk_events(spark, n):
    t0 = datetime(2021, 3, 1)
    rows = []
    for i in range(n):
        # two hour-windows; a dense site + scattered background per hour
        hour = i % 2
        if i % 5 == 0:
            lon, lat = 12.01, 47.99       # dense site
        else:
            lon = (i * 37 % 80) - 40.0
            lat = (i * 53 % 60) - 30.0
        rows.append((i, t0 + timedelta(hours=hour, seconds=i % 3000),
                     lon, lat))
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, lon double, lat double")


@pytest.mark.timeout(600)
def test_hotspot_stream_equals_batch(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    sink_dir = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(input_dir)
    os.makedirs(sink_dir)

    events = _mk_events(spark, 240)
    # r7 (r6 advice, medium): split ORTHOGONALLY to the hour windows
    # (event_id halves, not parity) so BOTH windows span BOTH
    # micro-batches — this is the case where the old update-mode
    # partial-universe statistic was provably wrong
    for i, pred in enumerate([F.col("event_id") < 120,
                              F.col("event_id") >= 120]):
        events.where(pred).coalesce(1).write.parquet(
            f"{input_dir}/slice={i}")

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{input_dir}/slice=*")
    )

    def sink(df, batch_id):
        if df.take(1):
            df.withColumn("_b", F.lit(batch_id)).write.mode(
                "append").parquet(sink_dir)

    q = run_hotspot_stream(spark, stream, sink, zoom=6,
                           checkpoint_dir=ckpt)
    q.processAllAvailable()
    q.stop()

    got = spark.read.parquet(sink_dir)
    # the state-merged foreachBatch re-emits corrected rows: the LAST
    # batch's emission per (window, cell) is the converged value —
    # compare it against the batch statistic over all events
    last = (
        got.groupBy("window_start", "cell")
        .agg(F.max(F.struct("_b", "x", "k", "s1", "gi_z")).alias("_s"))
    )
    # batch replay: hour windows + per-window Gi*
    counts = (
        events.select(
            F.date_trunc("hour", F.col("ts").cast("timestamp"))
            .alias("window_start"),
            zxy_cell_col(F.col("lon"), F.col("lat"), 6).alias("cell"),
        )
        .groupBy("window_start", "cell").agg(F.count("*").alias("n"))
    )
    want = hotspots_per_window(counts, zoom=6)

    def rows(df):
        return sorted(
            (r["window_start"], r["cell"], r["x"], r["k"], r["s1"],
             r["gi_z"]) for r in df.collect())

    got_rows = sorted(
        (r["window_start"], r["cell"], r["_s"]["x"], r["_s"]["k"],
         r["_s"]["s1"], r["_s"]["gi_z"]) for r in last.collect())
    assert got_rows == rows(want)
    # sanity: the dense site is hot in both windows
    hot_cells = {(w, c) for w, c, x, k, s1, gi in got_rows
                 if gi is not None and gi > 1.96}
    assert len(hot_cells) >= 2


def test_hotspots_per_window_empty(spark):
    empty = spark.createDataFrame(
        [], "window_start timestamp_ntz, cell long, n long")
    assert hotspots_per_window(empty).count() == 0
