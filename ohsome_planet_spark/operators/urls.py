"""URL canonicalization + per-URL dedup for web-crawl corpora.

A crawl sees the same page under many spellings — mixed-case scheme/host,
default ports, trailing slashes, tracking parameters, fragments, params in
different orders. Canonicalizing before dedup/grouping is the standard
first step of a webtext pipeline (the `url` is the `pages` table's identity
column and the north rule's byte-identical-text invariant is keyed by it).

All pure JVM expressions (regexp + higher-order array functions): no UDF,
no shuffle — the canonical form is a per-row projection, and the
latest-wins dedup is one `max_by` aggregation on the canonical key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tracking parameters stripped during canonicalization (utm_* family plus
# the common click identifiers)
_TRACKING_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid|ref)(=.*)?$"


def canonical_url_col(url_c: Column) -> Column:
    """Canonical form of an http(s) URL, as a Column expression:

    * scheme and host lowercased;
    * default port dropped (:80 for http, :443 for https);
    * trailing slashes stripped from the path;
    * fragment dropped FIRST (so a '?' inside the fragment cannot leak
      bytes into the query);
    * tracking params (utm_*, fbclid, gclid, msclkid, ref) dropped;
    * remaining query params sorted byte-lexicographically.

    A URL that does not parse as `scheme://host...` (scheme-less,
    `mailto:`, garbage) falls back to its RAW string as its own canonical
    key — never to a shared sentinel that would collapse unrelated pages
    into one dedup group.
    """
    base = F.substring_index(url_c, "#", 1)  # drop fragment before anything
    scheme = F.lower(F.regexp_extract(base, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(
        F.regexp_extract(base, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    )
    # anchored regexp_replace, so only a default-port suffix is touched
    host = F.when(scheme == "http", F.regexp_replace(host, r":80$", "")).when(
        scheme == "https", F.regexp_replace(host, r":443$", "")
    ).otherwise(host)
    path = F.regexp_extract(base, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    path = F.regexp_replace(path, r"/+$", "")
    query = F.regexp_extract(base, r"\?([^#]*)", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
        )
    )
    qs = F.array_join(params, "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )
    return F.when((scheme != "") & (host != ""), canon).otherwise(url_c)


def dedup_latest_per_url(
    pages: DataFrame, url_col: str = "url", ts_col: str = "warc_ts"
) -> DataFrame:
    """Latest-wins crawl dedup: one row per canonical URL, keeping the raw
    url/timestamp of the newest capture plus the capture count. One
    map-side projection + one aggregation (partial combine before the
    shuffle); no window, no join. WARC timestamps are second-granularity
    and collide routinely, so the winner is ordered by (ts, url) — ties
    break on the raw url string, keeping the result deterministic across
    runs, retries, and cluster sizes."""
    canon = pages.withColumn("canonical_url", canonical_url_col(F.col(url_col)))
    return canon.groupBy("canonical_url").agg(
        F.max_by(url_col, F.struct(F.col(ts_col), F.col(url_col))).alias("latest_url"),
        F.max(ts_col).alias("latest_ts"),
        F.count("*").alias("n_captures"),
    )


def host_col(url_c: Column) -> Column:
    """Lowercased host of a parseable URL ('' otherwise)."""
    return F.lower(
        F.regexp_extract(
            F.substring_index(url_c, "#", 1),
            r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)", 1,
        )
    )


def registered_domain_col(url_c: Column, rules=None) -> Column:
    """Registered (eTLD+1) domain via the vendored Public Suffix List
    snapshot (`data/public_suffix.py` — ICANN country second-levels +
    private-section hosting suffixes, wildcard and exception rules), as a
    pure JVM expression: the suffix sets compile into Catalyst `InSet`
    hash lookups, so no UDF and no join.

    Matching follows the published PSL algorithm (longest rule wins,
    exceptions beat wildcards, unlisted TLD ⇒ last label). Pass
    `rules=load_psl(path)` to use a complete PSL file instead of the
    snapshot subset — identical semantics, zero code change."""
    from ..data.public_suffix import SNAPSHOT

    if rules is None:
        rules = SNAPSHOT
    host = host_col(url_c)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last1 = F.element_at(parts, -1)
    # ANSI mode: element_at(-k) throws on short arrays, and CaseWhen only
    # evaluates VALUE branches lazily (conditions are eager) — so the
    # suffix keys are built inside guarded value branches
    last2 = F.when(
        n >= 2, F.array_join(F.slice(parts, -2, 2), ".")
    ).otherwise(F.lit(""))
    last3 = F.when(
        n >= 3, F.array_join(F.slice(parts, -3, 3), ".")
    ).otherwise(F.lit(""))
    suffix_len = (
        F.when((n >= 3) & last3.isin(*sorted(rules.suffixes_3)), F.lit(3))
        .when((n >= 2) & last2.isin(*sorted(rules.exceptions_2)), F.lit(1))
        .when(
            (n >= 2)
            & (last2.isin(*sorted(rules.suffixes_2))
               | last1.isin(*sorted(rules.wildcard_1))),
            F.lit(2),
        )
        .otherwise(F.lit(1))
    )
    # registrable = suffix + 1 label; hosts at/below the suffix stay whole
    return F.when(
        n <= suffix_len, host
    ).otherwise(
        F.array_join(F.slice(parts, n - suffix_len, suffix_len + 1), ".")
    )


def domain_stats(
    pages: DataFrame, url_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """Per-registered-domain corpus profile: page count and mean text
    length — the table a crawl triage ranks and blocklists from. One
    aggregation; hot domains are exactly the skew case the salted
    two-level aggregate handles if a single domain dominates a task."""
    d = pages.withColumn("domain", registered_domain_col(F.col(url_col)))
    return d.groupBy("domain").agg(
        F.count("*").alias("n_pages"),
        F.avg(F.length(F.col(text_col))).alias("mean_text_len"),
    )


def filter_blocked_domains(
    pages: DataFrame, blocklist: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Drop pages whose registered domain is blocklisted (blocklist:
    one `domain` column, tiny → broadcast anti-join, corpus unshuffled)."""
    d = pages.withColumn("_domain", registered_domain_col(F.col(url_col)))
    return d.join(
        F.broadcast(blocklist.select(F.col("domain").alias("_domain"))),
        "_domain", "left_anti",
    ).drop("_domain")
