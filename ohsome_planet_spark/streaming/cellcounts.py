"""Structured Streaming variant of the per-cell aggregation.

The reference is a bounded batch job (SURVEY §2.9: no streaming operators),
but the graft's pipeline shape — pages arriving continuously, per-cell
counts maintained incrementally — maps directly onto Structured Streaming:
readStream → extract/geocode (same JVM expressions as batch) → watermarked
event-time window → per-cell counts. The batch and streaming paths share
the same operator implementations; only the source/sink differ.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.geocode import extract_mentions, geocode_mentions
from ..operators.tiling import zxy_cell_col
from ..sources.gazetteer import gazetteer_df


def streaming_cell_counts(
    spark: SparkSession,
    pages_stream: DataFrame,
    zoom: int = 8,
    watermark: str = "1 hour",
    window_len: str = "1 hour",
) -> DataFrame:
    """pages readStream → windowed per-cell mention counts.

    pages_stream must have the pages schema (url, warc_ts, html, text, lang)
    and isStreaming=True. Late rows beyond `watermark` are dropped; output
    mode 'update'/'append' both work (append after watermark close).
    """
    mentions = extract_mentions(pages_stream)
    geocoded = geocode_mentions(mentions, gazetteer_df(spark))
    valid = geocoded.where(F.col("coord_valid"))
    cells = valid.select(
        "warc_ts", zxy_cell_col(F.col("lon"), F.col("lat"), zoom).alias("cell")
    )
    return (
        cells.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window_len).alias("win"), "cell")
        .agg(F.count("*").alias("n"))
        .select(F.col("win.start").alias("window_start"), "cell", "n")
    )


def run_file_stream(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    query_name: str = "cell_counts_stream",
    zoom: int = 8,
):
    """File-source streaming job with checkpointed state (exactly-once per
    the file-source + checkpoint contract)."""
    from ..sources.pages import pages_df

    schema = pages_df(spark, 1).schema
    stream = spark.readStream.schema(schema).parquet(input_dir)
    counts = streaming_cell_counts(spark, stream, zoom=zoom)
    return (
        counts.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
