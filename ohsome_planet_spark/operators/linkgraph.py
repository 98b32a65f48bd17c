"""Web link graph: href extraction → domain edges → degrees → PageRank.

The link structure of a crawl drives both curation (seed quality, spam
farms) and retrieval (authority). This module keeps the whole chain in
DataFrame ops:

* ``extract_links`` — one regexp_extract_all over the html (absolute
  http(s) hrefs only; relative-URL resolution is a string rewrite the
  caller can add — kept out so the oracle twin stays a shared-regex
  expression);
* ``domain_edges`` — (src_domain, dst_domain, n_links) via the same host
  expression the URL operators use; self-loops dropped (they dominate
  counts and carry no authority);
* ``degree_stats`` — in/out degree + link totals per domain (one outer
  join of two aggregates);
* ``pagerank`` — k fixed iterations of r' = (1−d)/N + d·Σ r(u)/out(u).

Float determinism (same doctrine as operators/bm25.py): the per-target
sum runs as a LEFT FOLD over contributions SORTED by source domain, each
contribution rounded to 12 dp, and each new rank re-rounded to 12 dp —
every arithmetic step is then a single IEEE operation on identical
inputs in any engine and any row order, so k iterations stay bit-exact
(the DuckDB oracle unrolls the same iterations in SQL). Dangling-node
mass is NOT redistributed (documented; ranking-preserving for the
spam/authority use here, and it keeps the per-iteration plan one join +
one aggregate).

100 TB shape: extraction is an embarrassingly parallel map; edges
aggregate map-side; each PageRank iteration is one shuffle-join on src
(ranks are O(domains), usually broadcastable) + one aggregate on dst.
Iterations are a fixed small k — lineage stays shallow; checkpoint via
io/snapshots between runs, not inside the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HREF_RE = r'href="(https?://[^"]+)"'


def extract_links(df: DataFrame, url_col: str = "url",
                  html_col: str = "html") -> DataFrame:
    """(src_url, dst_url) — one row per absolute href occurrence."""
    html_str = F.col(html_col)
    # html may be binary (the input-hint schema) or string
    if dict(df.dtypes)[html_col] == "binary":
        html_str = F.decode(html_str, "UTF-8")
    return (
        df.select(
            F.col(url_col).alias("src_url"),
            F.explode(
                F.regexp_extract_all(html_str, F.lit(HREF_RE), 1)
            ).alias("dst_url"),
        )
    )


ANCHOR_RE = r'<a href="(https?://[^"]+)"[^>]*>([^<]*)</a>'

# attribute order as emitted by the canonical form (name before content);
# a production crawler normalizes attribute order before this filter
ROBOTS_NOINDEX_RE = r'<meta[^>]*name="robots"[^>]*content="[^"]*noindex'


def extract_anchor_texts(df: DataFrame, url_col: str = "url",
                         html_col: str = "html") -> DataFrame:
    """(src_url, dst_url, anchor) — absolute-href anchors WITH their link
    text (the #1 retrieval signal for the TARGET page: anchors describe
    what others call it).

    One regexp_extract_all for the full <a> elements, then per-element
    group extraction inside a JVM `transform` — still zero UDFs."""
    html_str = F.col(html_col)
    if dict(df.dtypes)[html_col] == "binary":
        html_str = F.decode(html_str, "UTF-8")
    elems = F.regexp_extract_all(html_str, F.lit(ANCHOR_RE), 0)
    pairs = F.transform(
        elems,
        lambda e: F.struct(
            F.regexp_extract(e, ANCHOR_RE, 1).alias("dst_url"),
            F.regexp_extract(e, ANCHOR_RE, 2).alias("anchor"),
        ),
    )
    return (
        df.select(F.col(url_col).alias("src_url"),
                  F.explode(pairs).alias("_p"))
        .select("src_url", F.col("_p.dst_url").alias("dst_url"),
                F.col("_p.anchor").alias("anchor"))
    )


def anchor_term_index(anchors: DataFrame) -> DataFrame:
    """(domain, term, n) — anchor-text term counts per TARGET domain,
    cross-site only (a site's self-description is not evidence)."""
    t = anchors.select(
        _host(F.col("src_url")).alias("src"),
        _host(F.col("dst_url")).alias("domain"),
        F.explode(
            F.filter(F.split(F.lower(F.trim(F.col("anchor"))), r"\s+"),
                     lambda w: w != "")
        ).alias("term"),
    ).where((F.col("src") != F.col("domain")) & (F.col("domain") != ""))
    return t.groupBy("domain", "term").agg(F.count("*").alias("n"))


def robots_noindex_col(html_c: Column, is_binary: bool = False) -> Column:
    """True when the page opts out of indexing via <meta name="robots">."""
    s = F.decode(html_c, "UTF-8") if is_binary else html_c
    return F.lower(s).rlike(ROBOTS_NOINDEX_RE)


def filter_indexable(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Drop pages whose robots meta says noindex — run BEFORE any stage
    that publishes content (a corpus must honor the opt-out even though
    the crawl stored the bytes)."""
    is_bin = dict(df.dtypes)[html_col] == "binary"
    return df.where(~robots_noindex_col(F.col(html_col), is_binary=is_bin))


def _host(c: Column) -> Column:
    from .urls import host_col

    return host_col(c)


def domain_edges(links: DataFrame) -> DataFrame:
    """(src, dst, n_links) between DOMAINS, self-loops dropped."""
    e = links.select(
        _host(F.col("src_url")).alias("src"),
        _host(F.col("dst_url")).alias("dst"),
    ).where(
        F.col("src").isNotNull() & F.col("dst").isNotNull()
        # host_col yields '' for unparseable URLs — drop those rows too
        & (F.col("src") != "") & (F.col("dst") != "")
        & (F.col("src") != F.col("dst"))
    )
    return e.groupBy("src", "dst").agg(F.count("*").alias("n_links"))


def degree_stats(edges: DataFrame) -> DataFrame:
    """(domain, out_degree, in_degree, links_out, links_in) — degree is
    distinct neighbor count, links_* the raw href totals."""
    out = edges.groupBy(F.col("src").alias("domain")).agg(
        F.count("*").alias("out_degree"),
        F.sum("n_links").alias("links_out"))
    inn = edges.groupBy(F.col("dst").alias("domain")).agg(
        F.count("*").alias("in_degree"),
        F.sum("n_links").alias("links_in"))
    z = F.lit(0)
    return (
        out.join(inn, "domain", "full_outer")
        .select(
            "domain",
            F.coalesce("out_degree", z).cast("long").alias("out_degree"),
            F.coalesce("in_degree", z).cast("long").alias("in_degree"),
            F.coalesce("links_out", z).cast("long").alias("links_out"),
            F.coalesce("links_in", z).cast("long").alias("links_in"),
        )
    )


def pagerank(edges: DataFrame, iterations: int = 2,
             damping: float = 0.85) -> DataFrame:
    """(domain, rank) after `iterations` deterministic PageRank steps.

    Edge WEIGHTS are ignored (classic PageRank splits rank evenly over
    distinct out-neighbors). See module docstring for the exact float
    discipline; the DuckDB oracle replays the identical arithmetic."""
    # materialize the static edge list ONCE (lineage truncation — the r2
    # iterative-DataFrame lesson): without this every iteration's plan
    # re-executes the whole upstream edge derivation (URL parsing, joins),
    # and nodes/outdeg/e each re-derive it again within one iteration
    edges = edges.select("src", "dst").localCheckpoint()
    nodes = (
        edges.select(F.col("src").alias("domain"))
        .union(edges.select(F.col("dst").alias("domain")))
        .distinct()
    )
    n = nodes.count()  # one scalar — the node count parameterizes literals
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    e = edges.join(F.broadcast(outdeg), "src")

    base = (1.0 - damping) / n
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iterations):
        contribs = (
            e.join(ranks.withColumnRenamed("domain", "src"), "src")
            .select(
                "dst", "src",
                F.round(F.col("rank") / F.col("outdeg").cast("double"), 12)
                .alias("_c"),
            )
        )
        summed = contribs.groupBy("dst").agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("src", "_c"))),
                F.lit(0.0),
                lambda acc, x: acc + x["_c"],
            ).alias("_s")
        )
        ranks = (
            nodes.join(summed.withColumnRenamed("dst", "domain"),
                       "domain", "left")
            .select(
                "domain",
                F.round(
                    F.lit(base)
                    + F.lit(damping) * F.coalesce("_s", F.lit(0.0)),
                    12,
                ).alias("rank"),
            )
        )
    return ranks
