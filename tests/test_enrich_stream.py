"""Streaming enrich twin == batch flagship, over a replayed file stream.

Three page files → three micro-batches (maxFilesPerTrigger=1) through the
checkpointed foreachBatch stream; the sink-side aggregate must equal the
batch enrich_tile_counts over the union of all pages, and a restart of the
drained stream must process nothing new (checkpoint exactly-once)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ohsome_planet_spark.plans.enrich import enrich_tile_counts
from ohsome_planet_spark.sources.pages import pages_df
from ohsome_planet_spark.streaming.enrich_stream import (
    run_enrich_stream,
    tile_counts_from_sink,
)


def _rows(df):
    cols = sorted(df.columns)
    return sorted(
        (tuple(r[c] for c in cols) for r in df.select(*cols).collect()),
        key=repr,  # None-safe total order; both sides share types
    )


@pytest.mark.timeout(600)
def test_stream_equals_batch(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    sink_dir = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(input_dir)

    # three deterministic non-overlapping page slices -> three files
    all_pages = pages_df(spark, 360)
    for i in range(3):
        part = all_pages.where(F.crc32(F.col("url")) % 3 == i)
        part.coalesce(1).write.parquet(f"{input_dir}/chunk_{i}")
    # flatten: the file source reads a directory of parquet files
    flat = spark.read.parquet(f"{input_dir}/chunk_*")
    import shutil

    flat_dir = str(tmp_path / "flat")
    os.makedirs(flat_dir)
    n = 0
    for i in range(3):
        src = f"{input_dir}/chunk_{i}"
        for f in os.listdir(src):
            if f.endswith(".parquet"):
                shutil.copy(os.path.join(src, f), os.path.join(flat_dir, f"f{i}.parquet"))
                n += 1
    assert n == 3

    q = run_enrich_stream(spark, flat_dir, ckpt, sink_dir)
    q.awaitTermination(300)
    progress = q.recentProgress
    batches = [p for p in progress if p["numInputRows"] > 0]
    assert len(batches) >= 3  # one micro-batch per file

    got = _rows(tile_counts_from_sink(spark, sink_dir))
    expect = _rows(enrich_tile_counts(spark, all_pages, salted=True))
    assert got == expect and len(got) > 0

    # restart over the same checkpoint: nothing new to process
    q2 = run_enrich_stream(spark, flat_dir, ckpt, sink_dir)
    q2.awaitTermination(120)
    assert _rows(tile_counts_from_sink(spark, sink_dir)) == expect
