"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
  {"metric": "pages_geocoded_tiled_per_sec", "value": N, "unit": "sec",
   "queries": {...per-query seconds...}, "sf": ...}

The primary metric mirrors BASELINE.json: pages geocoded+tiled/sec through
the full enrichment pipeline (extract → geocode → PIP country join → H3-class
/S2/zxy/XZ2 cells → salted per-cell counts). Pages are generated
deterministically at a size proportional to the SF directory's events table
(pages = 10 × events rows), standing in for the SF sample of the notional
10^12-doc Iceberg table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from ohsome_planet_spark.session import get_spark

    spark = get_spark(app_name="bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    import tempfile

    import __spark_entry__ as entrymod
    from ohsome_planet_spark.plans.enrich import enrich_tile_counts
    from ohsome_planet_spark.sources.pages import pages_df, write_pages_table

    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    n_pages = n_events * 10

    # materialize the pages table once (generation excluded from the metric —
    # the advertised metric is enrichment over a stored Iceberg-style table)
    pages_dir = os.path.join(
        tempfile.gettempdir(), f"spark_graft_pages_{n_pages}"
    )
    if not os.path.exists(os.path.join(pages_dir, "_SUCCESS")):
        write_pages_table(spark, pages_dir, n_pages)
    pages = spark.read.parquet(pages_dir)

    # warm up the JVM + python workers once (excluded from timings)
    enrich_tile_counts(spark, pages_df(spark, 1000), salted=True).count()

    t0 = time.time()
    result_rows = enrich_tile_counts(spark, pages, salted=True).count()
    flagship_sec = time.time() - t0
    pages_per_sec = n_pages / flagship_sec

    # full-row enrichment WITH WKB geometry (the run_checkpointed
    # configuration — r1 verdict item 3: the vectorized point_wkb path must
    # stay within ~10% of geometry-off full-row materialization)
    from ohsome_planet_spark.plans.enrich import enrich_pages

    t0 = time.time()
    enrich_pages(spark, pages, with_geometry=False).write.format("noop").mode(
        "overwrite"
    ).save()
    geom_off_sec = round(time.time() - t0, 3)
    t0 = time.time()
    enrich_pages(spark, pages, with_geometry=True).write.format("noop").mode(
        "overwrite"
    ).save()
    geom_on_sec = round(time.time() - t0, 3)

    headline = [
        "pip_countries",
        "cell_assign_zxy",
        "cell_counts_salted",
        "xz2_points",
        "pricing_summary",
        "validity_window",
        "doc_exact_dedup",
        "embedding_topk",
        "hashtags",
    ]
    qtimes: dict[str, float] = {
        "enrich_pipeline": round(flagship_sec, 3),
        "enrich_rows_geom_off": geom_off_sec,
        "enrich_rows_geom_on": geom_on_sec,
    }
    qs = entrymod.queries()
    for name in headline:
        fn = qs.get(name)
        if fn is None:
            continue
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        qtimes[name] = round(time.time() - t0, 3)

    # the history merge (the reference's one custom operator): 10k ways ×
    # 3-node refs over 20-version node histories derived from events
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from ohsome_planet_spark.operators.history import way_contributions

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    m_nodes = ev.select(
        (F.col("event_id") % 30000).alias("id"),
        F.row_number()
        .over(Window.partitionBy(F.col("event_id") % 30000).orderBy("ts", "event_id"))
        .alias("version"),
        F.col("ts"),
        (F.col("event_id") % 17).alias("changeset"),
        F.col("user_id"), F.lit("u").alias("user"), F.lit(True).alias("visible"),
        ((F.col("event_id") * 7 % 360) - 180.0).alias("lon"),
        ((F.col("event_id") * 11 % 180) - 90.0).alias("lat"),
    )
    m_ways = spark.range(10000).select(
        F.col("id"), F.lit(1).alias("version"),
        F.lit("2020-01-01 00:00:00").cast("timestamp_ntz").alias("ts"),
        F.lit(1).cast("long").alias("changeset"),
        F.lit(1).cast("long").alias("user_id"),
        F.lit("u").alias("user"), F.lit(True).alias("visible"),
        F.create_map().cast("map<string,string>").alias("tags"),
        F.array(
            F.col("id") * 3 % 30000, (F.col("id") * 3 + 1) % 30000, (F.col("id") * 3 + 2) % 30000
        ).alias("refs"),
    )
    merge_df = way_contributions(m_ways, m_nodes)
    merge_df.count()  # warm
    t0 = time.time()
    merge_rows = merge_df.count()
    qtimes["way_merge_10k"] = round(time.time() - t0, 3)

    # declarative node pipeline (the planet-dominant path, pure window ops)
    from ohsome_planet_spark.operators.history import node_contributions

    n_df = node_contributions(m_nodes.withColumn("tags", F.create_map().cast("map<string,string>")))
    n_df.count()  # warm
    t0 = time.time()
    node_rows = n_df.count()
    qtimes["node_history_all"] = round(time.time() - t0, 3)

    # hardware-calibration control (context for the throughput number on
    # shared/throttled VMs): ideal-parallel pure-JVM compute, 1 task/core

    def control(k):
        return spark.range(0, 800_000_000, 1, cpus).select(
            F.sum(F.sqrt((F.col("id") + k) % 997 + 1.0)).alias("s")
        )

    control(1).collect()
    t0 = time.time()
    control(2).collect()
    control_sec = round(time.time() - t0, 3)

    try:
        sf = float(sf_dir.rstrip("/").split("sf")[-1])
    except ValueError:
        sf = -1.0

    print(
        json.dumps(
            {
                "metric": "pages_geocoded_tiled_per_sec",
                "value": round(pages_per_sec, 2),
                "unit": "sec",
                "queries": qtimes,
                "sf": sf,
                "pages": n_pages,
                "result_rows": result_rows,
                "merge_contrib_rows": merge_rows,
                "node_contrib_rows": node_rows,
                "cpus": cpus,
                "jvm_control_sec": control_sec,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
