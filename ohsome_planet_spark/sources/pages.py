"""Deterministic Common-Crawl-style `pages` table generator.

Shape per BASELINE.json `input_hint`:
    pages(url string, warc_ts timestamp, html binary, text string, lang string)

Built entirely from Spark column expressions over `spark.range(n)` — no
Python in the generation path, so generating the SF sample of the notional
10^12-doc table distributes across executors and scales linearly (the 100 TB
version is the same plan over a bigger range, or an actual Iceberg scan).

Determinism: every derived value is integer arithmetic on `id` — the same
(n, salt) always produces byte-identical rows. Entity mentions are embedded
as `@@Entity_Name@@` markers drawn from the gazetteer fixture with a skewed
distribution: the first HOT_ENTITIES gazetteer entries receive ~60% of
mentions (mega-cell hotspots), and 40% of urls live on one hot domain —
exercising both the salted two-level aggregation and AQE skew handling.

The per-row invariant required by the north rule — extracted `text`
byte-identical per `url` through the whole pipeline — is checkable via
sha256(text) per url (tests/test_pages.py, operators/metrics.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .gazetteer import GAZETTEER, HOT_ENTITIES

_FILLERS = [
    "the quick survey of coastal shipping routes",
    "markets reopened after seasonal maintenance",
    "a regional council approved the new transit plan",
    "heavy rainfall was recorded across the basin",
    "local festivals drew record attendance this year",
    "the observatory published revised star charts",
    "engineers completed the bridge load assessment",
    "archaeologists catalogued artifacts from the dig",
]

_LANGS = ["en", "de", "fr", "es", "zh"]

BASE_EPOCH = 1_700_000_000  # 2023-11-14T22:13:20Z


def _entity_pick(id_col: Column, slot: int) -> Column:
    """Deterministic skewed entity index: ~60% of picks land on the first
    HOT_ENTITIES gazetteer entries."""
    n = len(GAZETTEER)
    h = (id_col * 97 + F.lit(slot * 31 + 7)) % 100
    hot_idx = h % HOT_ENTITIES
    cold_idx = HOT_ENTITIES + ((id_col * 131 + F.lit(slot * 53)) % (n - HOT_ENTITIES))
    idx = F.when(h < 60, hot_idx).otherwise(cold_idx)
    names = F.array(*[F.lit(name) for name, _, _ in GAZETTEER])
    return F.element_at(names, (idx + 1).cast("int"))


def pages_df(spark: SparkSession, n: int = 10_000, salt: int = 42) -> DataFrame:
    """Generate n deterministic pages (pure Spark expressions)."""
    df = spark.range(n).withColumn("id", F.col("id") + F.lit(salt) * 0)

    d = F.col("id") % 100
    domain = (
        F.when(d < 40, F.lit("hot.example.com"))
        .when(d < 60, F.lit("big.example.net"))
        .otherwise(F.concat(F.lit("site"), (F.col("id") % 37).cast("string"), F.lit(".example.org")))
    )
    url = F.concat(F.lit("https://"), domain, F.lit("/p/"), F.col("id").cast("string"))

    warc_ts = F.timestamp_seconds(F.lit(BASE_EPOCH) + (F.col("id") * 37) % 31_536_000)

    fillers = F.array(*[F.lit(s) for s in _FILLERS])
    f1 = F.element_at(fillers, ((F.col("id") * 13) % len(_FILLERS) + 1).cast("int"))
    f2 = F.element_at(fillers, ((F.col("id") * 29 + 3) % len(_FILLERS) + 1).cast("int"))

    e1 = _entity_pick(F.col("id"), 0)
    e2 = _entity_pick(F.col("id"), 1)
    e3 = _entity_pick(F.col("id"), 2)
    n_mentions = F.col("id") % 3  # 0,1,2 extra mentions beyond the first

    text = F.concat(
        f1,
        F.lit(" near @@"), e1, F.lit("@@ "),
        f2,
        F.when(n_mentions >= 1, F.concat(F.lit(" then @@"), e2, F.lit("@@"))).otherwise(F.lit("")),
        F.when(n_mentions >= 2, F.concat(F.lit(" and @@"), e3, F.lit("@@"))).otherwise(F.lit("")),
        F.lit(" (crawl "), F.col("id").cast("string"), F.lit(")"),
    )

    langs = F.array(*[F.lit(x) for x in _LANGS])
    lang = F.element_at(langs, ((F.col("id") * 17) % len(_LANGS) + 1).cast("int"))

    html = F.encode(
        F.concat(F.lit("<html><head></head><body><p>"), text, F.lit("</p></body></html>")),
        "UTF-8",
    )

    return df.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        text.alias("text"),
        lang.alias("lang"),
    )


def write_pages_table(spark: SparkSession, path: str, n: int = 10_000) -> None:
    """Materialize the pages table as parquet (the Iceberg stand-in warehouse)."""
    pages_df(spark, n).write.mode("overwrite").parquet(path)
