"""Streaming hotspot surface: windowed cell counts → per-batch Gi*.

Gi* needs the WHOLE occupied-cell universe of a window (global mean and
variance), so it cannot ride a watermarked streaming aggregation
directly — the statistic is non-incremental across cells. The standard
shape (the `enrich_stream` pattern) is therefore: Structured Streaming
maintains the windowed per-cell COUNTS, and `foreachBatch` recomputes
the hotspot statistic with the BATCH operator verbatim over the FULL
accumulated counts of every window the batch touched (foreachBatch
merges the update-mode deltas into its own per-window state first —
see run_hotspot_stream) — one code path, two execution modes,
streaming == batch over everything-seen-so-far by construction
(tested with windows spanning micro-batches).

At 100 TB-rate streams the per-window hotspot job is tiny: its input is
the aggregated cell counts (bounded by occupied cells per window), not
the event stream.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.hotspot import getis_ord_gi
from ..operators.tiling import zxy_cell_col


def streaming_cell_count_source(
    events_stream: DataFrame,
    zoom: int = 6,
    ts_col: str = "ts",
    lon_col: str = "lon",
    lat_col: str = "lat",
    watermark: str = "1 hour",
    window_len: str = "1 hour",
) -> DataFrame:
    """event stream → watermarked windowed per-cell counts (the stateful
    half; incremental, late rows beyond the watermark dropped)."""
    # watermarks require TIMESTAMP — fixture tables carry timestamp_ntz,
    # which Structured Streaming rejects as an event-time column
    cells = events_stream.select(
        F.col(ts_col).cast("timestamp").alias(ts_col),
        zxy_cell_col(F.col(lon_col), F.col(lat_col), zoom).alias("cell"),
    )
    return (
        cells.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_len).alias("win"), "cell")
        .agg(F.count("*").alias("n"))
        .select(F.col("win.start").alias("window_start"), "cell", "n")
    )


def hotspots_per_window(counts: DataFrame, zoom: int = 6,
                        radius: int = 1) -> DataFrame:
    """(window_start, cell, x, k, s1, gi_z): the batch Gi* applied to
    each window's cell universe independently — the foreachBatch body,
    also directly usable on any batch frame of windowed counts. One
    `getis_ord_gi` call per distinct window (windows are few — a bounded
    driver-side loop over a tiny distinct list, the k-centroids
    doctrine)."""
    wins = [r["window_start"]
            for r in counts.select("window_start").distinct().collect()]
    out = None
    for w in sorted(wins):
        # cache_slot=None (r7): the input is an already-computed tiny
        # windowed-counts frame; per-window persists would otherwise
        # accumulate every micro-batch (r6 advice, low #4)
        gi = getis_ord_gi(
            counts.where(F.col("window_start") == w).select("cell", "n"),
            z=zoom, radius=radius, cache_slot=None,
        ).withColumn("window_start", F.lit(w))
        out = gi if out is None else out.unionByName(gi)
    if out is None:
        empty = counts.sparkSession.createDataFrame(
            [], "window_start timestamp_ntz, cell long, x long, k long, "
                "s1 long, gi_z double")
        return empty
    return out.select("window_start", "cell", "x", "k", "s1", "gi_z")


def run_hotspot_stream(
    spark,
    events_stream: DataFrame,
    sink_writer,
    zoom: int = 6,
    watermark: str = "1 hour",
    window_len: str = "1 hour",
    query_name: str = "hotspot_stream",
    checkpoint_dir: str | None = None,
    state_dir: str | None = None,
):
    """Wire the stateful counts to the per-batch Gi* via foreachBatch:
    `sink_writer(df, batch_id)` receives each micro-batch's hotspot
    rows. Caller starts/stops the returned query.

    Correctness (r7, closes the r6 advice HIGH item): update mode hands
    foreachBatch only the (window, cell) rows whose counts CHANGED in
    the micro-batch, but Gi* is a global statistic of the window's whole
    occupied-cell universe — computing it over the partial batch emitted
    wrong z-scores whenever a window spanned micro-batches, and
    non-updated cells were never corrected. foreachBatch therefore
    maintains the accumulated windowed counts itself (one parquet
    directory per window under ``state_dir``; changed cells replace
    their previous rows, the batch being the new totals) and recomputes
    `getis_ord_gi` over the FULL merged universe of every window the
    batch touched — so every emission is the exact batch statistic of
    everything seen so far, and corrected rows are re-emitted
    (downstream keeps the last value per (window, cell), which the
    equality test pins). State is bounded by occupied cells per window
    — the same bound the statistic itself needs.

    ``state_dir`` defaults next to the checkpoint (or a temp dir for
    ad-hoc runs)."""
    import tempfile

    counts = streaming_cell_count_source(
        events_stream, zoom=zoom, watermark=watermark,
        window_len=window_len)
    if state_dir is None:
        state_dir = (
            os.path.join(checkpoint_dir, "_gi_counts_state")
            if checkpoint_dir
            else os.path.join(tempfile.mkdtemp(prefix="gi_state_"))
        )

    def fb(batch_df, batch_id):
        sess = batch_df.sparkSession
        wins = [r["window_start"]
                for r in batch_df.select("window_start").distinct()
                .collect()]
        if not wins:
            return
        merged_frames = []
        for w in sorted(wins):
            wdir = os.path.join(
                state_dir, w.strftime("w=%Y%m%dT%H%M%S"))
            batch_w = batch_df.where(
                F.col("window_start") == w).select("cell", "n")
            if os.path.exists(os.path.join(wdir, "_SUCCESS")):
                old = sess.read.parquet(wdir).select("cell", "n")
                merged = old.join(
                    batch_w, "cell", "left_anti").unionByName(batch_w)
            else:
                merged = batch_w
            tmp = wdir + ".tmp"
            merged.write.mode("overwrite").parquet(tmp)
            if os.path.exists(wdir):
                import shutil

                shutil.rmtree(wdir)
            os.rename(tmp, wdir)
            merged_frames.append(
                sess.read.parquet(wdir).select("cell", "n")
                .withColumn("window_start", F.lit(w)))
        full = merged_frames[0]
        for f in merged_frames[1:]:
            full = full.unionByName(f)
        sink_writer(hotspots_per_window(full, zoom=zoom), batch_id)

    writer = (
        counts.writeStream.outputMode("update")
        .queryName(query_name).foreachBatch(fb)
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
