"""Entity extraction + geocoding: pages → (url, entity, lon, lat) points.

Extraction is a JVM-side regexp (`regexp_extract_all` + `explode`) — the hot
path has zero Python. Geocoding is a broadcast hash join against the (tiny)
gazetteer, the exact Spark analog of the reference's batched point lookups
(`RocksMap.multiGetAsList`, `/root/reference/ohsome-contributions/src/main/
java/org/heigit/ohsome/contributions/util/RocksMap.java:19-40` — a hand-rolled
broadcast join).

Coordinate-validity semantics follow `ContributionGeometry.invalid`
(`ContributionGeometry.java:193-195`): lon ∉ [-180,180] or lat ∉ [-90,90] ⇒
the mention yields an empty geometry; downstream joins emit empty sets. We
materialize that as `coord_valid boolean` instead of dropping rows, so row
counts stay auditable (the reference writes invalid rows too, with empty
geometry — `ContributionsAvroConverter.java:106`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import extract_entities_col


def extract_mentions(pages: DataFrame) -> DataFrame:
    """pages → one row per entity mention: (url, warc_ts, entity, mention_idx).

    posexplode keeps mention order so re-runs are deterministic.
    """
    return pages.select(
        "url",
        "warc_ts",
        F.posexplode(extract_entities_col(F.col("text"))).alias("mention_idx", "entity"),
    )


def geocode_mentions(mentions: DataFrame, gazetteer: DataFrame) -> DataFrame:
    """Broadcast-join mentions to gazetteer coordinates.

    Left join: unmatched entities keep null coords (analog of the reference's
    EmptyContributions for missing members, `contrib/Contributions.java:17-23`).

    r7: a gazetteer that already carries per-entity enrichment columns
    (countries / cell codes / WKB precomputed on the tiny frame — guide
    §8: decide on the small side, attach via the broadcast you already
    pay for) keeps ALL of them through the join.
    """
    cols = ["entity", "lat", "lon"] + [
        c for c in gazetteer.columns if c not in ("entity", "lat", "lon")
    ]
    g = F.broadcast(gazetteer.select(*cols))
    joined = mentions.join(g, "entity", "left")
    coord_valid = (
        F.col("lon").isNotNull()
        & F.col("lat").isNotNull()
        & (F.col("lon") >= -180.0)
        & (F.col("lon") <= 180.0)
        & (F.col("lat") >= -90.0)
        & (F.col("lat") <= 90.0)
    )
    return joined.withColumn("coord_valid", coord_valid)
