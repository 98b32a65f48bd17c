"""robots.txt parsing + disallow filtering (crawl politeness).

A corpus built from a crawl must honor robots.txt even though the fetch
already happened (the meta-robots filter in operators/linkgraph.py covers
page-level opt-outs; this covers the site-level rules). Everything is
JVM expressions — line explode + window functions for the group
structure, array semijoins for the prefix match — so the DuckDB oracle
replays it exactly.

Parsing model (RFC 9309 subset, documented simplifications):
* lines are trimmed, `#` comments stripped, keys case-insensitive;
* consecutive `User-agent:` lines form a GROUP HEADER; the group's rules
  run until the next header (per the RFC's grouping rule — a lone
  `Disallow:` between two UA lines belongs to the first group);
* only groups whose header contains `*` are applied (per-product UA
  matching is a policy knob above this operator);
* `Disallow:` with an empty value allows everything (dropped);
  `Allow:` precedence and `$`/`*` wildcards are NOT implemented — rules
  here are plain path PREFIXES (the overwhelmingly common case; a page
  blocked by a wildcard rule we miss is a false KEEP, the conservative
  direction for correctness of the filter itself is prefix-only and
  documented).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def parse_robots(df: DataFrame, url_col: str = "url",
                 text_col: str = "text") -> DataFrame:
    """(domain, disallow_prefix) rows from robots.txt response bodies.

    Input: one row per fetched robots.txt (any URL on the domain — the
    domain is extracted from the URL)."""
    from .urls import host_col

    lines = df.select(
        host_col(F.col(url_col)).alias("domain"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "_raw"),
    ).select(
        "domain", "pos",
        # strip comments, trim, lowercase the KEY only (values keep case:
        # paths are case-sensitive)
        F.trim(F.substring_index(F.col("_raw"), "#", 1)).alias("line"),
    )
    low = F.lower(F.col("line"))
    is_ua = low.startswith("user-agent:")
    is_dis = low.startswith("disallow:")

    w = Window.partitionBy("domain").orderBy("pos")
    marked = lines.withColumn("_is_ua", is_ua).withColumn(
        "_new_group",
        F.when(
            F.col("_is_ua")
            & ~F.coalesce(F.lag("_is_ua").over(w), F.lit(False)),
            1,
        ).otherwise(0),
    ).withColumn("section", F.sum("_new_group").over(w))

    ua_value = F.trim(F.substring(F.col("line"), 12, 10_000))
    star_sections = (
        marked.where(F.col("_is_ua") & (ua_value == "*"))
        .select("domain", "section").distinct()
    )
    dis_value = F.trim(F.substring(F.col("line"), 10, 10_000))
    disallows = marked.where(is_dis).select(
        "domain", "section", dis_value.alias("disallow_prefix"))
    return (
        disallows.join(star_sections, ["domain", "section"], "left_semi")
        .where(F.col("disallow_prefix") != "")
        .select("domain", "disallow_prefix").distinct()
    )


def url_path_col(url_c: Column) -> Column:
    """Path+query of a URL ('/' when absent) — the robots match target."""
    p = F.regexp_extract(url_c, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]+(/.*)?$", 1)
    return F.when(p == "", F.lit("/")).otherwise(p)


def filter_robots_disallowed(
    pages: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Drop pages whose path starts with any of their domain's disallow
    prefixes. The rules table is tiny (one row per (domain, prefix)) —
    broadcast; per-domain prefixes collapse to an array so the check is
    one `exists` over a small array, no row explosion of pages."""
    from .urls import host_col

    per_domain = rules.groupBy("domain").agg(
        F.collect_list("disallow_prefix").alias("_prefixes"))
    joined = pages.join(
        F.broadcast(per_domain),
        host_col(F.col(url_col)) == F.col("domain"), "left",
    )
    path = url_path_col(F.col(url_col))
    blocked = F.exists(
        F.coalesce(F.col("_prefixes"), F.array()),
        lambda pref: path.startswith(pref),
    )
    return joined.where(~blocked).drop("domain", "_prefixes")
