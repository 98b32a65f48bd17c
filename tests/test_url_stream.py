"""Streaming latest-wins URL dedup == batch dedup_latest_per_url over a
replayed multi-batch feed (winners + capture counts identical, including
second-granularity timestamp collisions broken by raw url)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ohsome_planet_spark.operators.urls import dedup_latest_per_url
from ohsome_planet_spark.streaming.url_stream import streaming_url_dedup


@pytest.mark.timeout(600)
def test_url_stream_matches_batch(spark, tmp_path):
    # messy url spellings collapsing per canonical key + colliding ts
    e = F.col("id")
    pages = spark.range(600).select(
        F.concat(
            F.when(e % 4 == 0, F.lit("HTTPS")).otherwise(F.lit("https")),
            F.lit("://"),
            F.when(e % 3 == 0, F.lit("Site.Example.COM")).otherwise(
                F.lit("site.example.com")),
            F.lit("/p/"), (e % 40).cast("string"),
            F.when(e % 5 == 0, F.lit("/")).otherwise(F.lit("")),
            F.when(e % 6 == 0, F.lit("?utm_source=x&id=1")).otherwise(F.lit("")),
        ).alias("url"),
        F.timestamp_seconds(F.lit(1600000000) + (e % 7) * 3600).alias("warc_ts"),
        F.lit(b"").alias("html"),
        F.lit("t").alias("text"),
        F.lit("en").alias("lang"),
    )
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    for i in range(3):
        pages.where(e % 3 == i).coalesce(1).write.parquet(
            f"{tmp_path}/chunk_{i}")
        import shutil

        src = f"{tmp_path}/chunk_{i}"
        for f in os.listdir(src):
            if f.endswith(".parquet"):
                shutil.copy(os.path.join(src, f),
                            os.path.join(in_dir, f"f{i}.parquet"))

    stream = (
        spark.readStream.schema(pages.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    out = streaming_url_dedup(stream)
    q = (
        out.writeStream.format("memory").queryName("t_url_dedup")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    # 'update' emits one row per touched key per batch: the LAST update per
    # key is the stream's final answer
    got = spark.sql("""
        SELECT canonical_url, latest_url, latest_ts, n_captures FROM (
          SELECT *, row_number() OVER (
            PARTITION BY canonical_url ORDER BY n_captures DESC) rn
          FROM t_url_dedup) WHERE rn = 1
    """)
    expect = dedup_latest_per_url(pages)
    key = lambda r: r["canonical_url"]  # noqa: E731
    g = sorted(((r["canonical_url"], r["latest_url"], r["latest_ts"],
                 r["n_captures"]) for r in got.collect()))
    x = sorted(((r["canonical_url"], r["latest_url"], r["latest_ts"],
                 r["n_captures"]) for r in expect.collect()))
    assert len(g) == len(x) > 10
    assert g == x
