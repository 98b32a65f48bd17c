"""Quick way_merge_10k breakdown: full op vs shuffle/Arrow floor.

Times (a) the full way_contributions count, (b) the packed-frame count
(scan+union+shuffle only, no Python kernel), (c) a pass-through mapInPandas
over the packed frame (adds Arrow transfer + no-op Python).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ohsome_planet_spark.session import get_spark
from ohsome_planet_spark.operators.history import way_contributions

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = get_spark(app_name="bench_way_merge", master=f"local[{cpus}]")
spark.sparkContext.setLogLevel("ERROR")

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
        F.col("id") * 3 % 30000, (F.col("id") * 3 + 1) % 30000,
        (F.col("id") * 3 + 2) % 30000
    ).alias("refs"),
)

merge_df = way_contributions(m_ways, m_nodes)


def timeit(name, fn, n=3):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    ts.sort()
    print(f"{name}: median {ts[n // 2]:.3f}s  [{ts[0]:.3f}, {ts[-1]:.3f}]")


timeit("way_merge_10k (full)", lambda: merge_df.count())

# floor: same packed frame, no kernel — rebuild packed exactly as in the op
refs_pairs = m_ways.select(
    F.col("id").alias("way_id"), F.explode("refs").alias("node_id")
).distinct()
member_hist = refs_pairs.join(
    m_nodes.withColumnRenamed("id", "node_id"), "node_id"
).select(
    "way_id", "node_id", "version", "ts", "changeset", "user_id", "user",
    "visible", "lon", "lat",
)
ways_packed = m_ways.select(
    F.col("id").alias("way_id"), F.lit("w").alias("kind"),
    "version", "ts", "changeset", "user_id", "user", "visible",
    "tags", "refs",
    F.lit(None).cast("long").alias("node_id"),
    F.lit(None).cast("double").alias("lon"),
    F.lit(None).cast("double").alias("lat"),
)
nodes_packed = member_hist.select(
    "way_id", F.lit("n").alias("kind"),
    "version", "ts", "changeset", "user_id", "user", "visible",
    F.lit(None).cast("map<string,string>").alias("tags"),
    F.lit(None).cast("array<long>").alias("refs"),
    "node_id", "lon", "lat",
)
packed = ways_packed.unionByName(nodes_packed).repartition("way_id")
timeit("packed only (no kernel)", lambda: packed.count())

import pandas as pd


def passthrough(batches):
    for b in batches:
        yield pd.DataFrame({"n": [len(b)]})


timeit("packed + noop mapInPandas",
       lambda: packed.mapInPandas(passthrough, "n long").count())
spark.stop()
