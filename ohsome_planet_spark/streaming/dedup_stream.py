"""Streaming exact deduplication over a pages stream.

The streaming twin of `operators.dedup.exact_dedup` for a continuously
ingested corpus (the shape a crawl-replication feed has): each micro-batch's
pages are keyed by a content hash and duplicates arriving within the
watermark horizon are dropped, keeping the FIRST-seen instance.

Built on `dropDuplicatesWithinWatermark`, so state for a hash is evicted
once the watermark passes it — state size is bounded by (ingest rate ×
watermark horizon), not by corpus size, which is what makes this viable on
an unbounded 100 TB-scale feed where a full-history hash set cannot fit.
Duplicates that arrive FARTHER apart than the watermark horizon are not
suppressed by the stream (by design — bounded state); a periodic batch
`exact_dedup` compaction over the sink remains the global guarantee, and
the two compose because both keep deterministic representatives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def streaming_exact_dedup(
    pages_stream: DataFrame,
    watermark: str = "1 hour",
    key_cols: list[str] | None = None,
) -> DataFrame:
    """pages readStream → stream with within-watermark duplicates dropped.

    pages_stream must have the pages schema (url, warc_ts, html, text, lang)
    with isStreaming=True. The dedup key defaults to the text content hash
    (exact-duplicate semantics); pass key_cols to dedup by other columns
    (e.g. ["url"] for per-url latest-wins pipelines).
    """
    if key_cols is None:
        # only the default content-hash path pays the SHA-256 over text
        pages_stream = pages_stream.withColumn(
            "content_hash", F.sha2(F.col("text").cast("binary"), 256)
        )
        key_cols = ["content_hash"]
    return pages_stream.withWatermark("warc_ts", watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def run_dedup_stream(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    query_name: str = "dedup_stream",
    watermark: str = "1 hour",
):
    """File-source streaming dedup with checkpointed state (exactly-once per
    the file-source + checkpoint contract), sunk to an in-memory table for
    tests; a production sink would be the status-partitioned parquet writer
    (io/snapshots.py)."""
    from ..sources.pages import pages_df

    schema = pages_df(spark, 1).schema
    stream = spark.readStream.schema(schema).parquet(input_dir)
    deduped = streaming_exact_dedup(stream, watermark=watermark)
    return (
        deduped.writeStream.format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )
