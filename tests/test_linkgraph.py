"""Link graph + deterministic PageRank (operators/linkgraph.py)."""

import pytest

from ohsome_planet_spark.operators.linkgraph import (
    degree_stats,
    domain_edges,
    extract_links,
    pagerank,
)


@pytest.fixture(scope="module")
def pages(spark):
    rows = [
        ("https://a.com/1",
         '<p><a href="https://b.com/x">l</a> <a href="https://c.com/y">m</a>'
         ' <a href="/relative">skip</a> <a href="https://a.com/self">s</a>'),
        ("https://b.com/1", '<a href="https://c.com/z">n</a>'),
        ("https://c.com/1", '<a href="https://a.com/w">o</a>'),
    ]
    return spark.createDataFrame(rows, "url string, html string")


def test_extract_links(pages):
    out = {(r["src_url"], r["dst_url"]) for r in extract_links(pages).collect()}
    # relative href skipped; absolute self-link kept at URL level
    assert out == {
        ("https://a.com/1", "https://b.com/x"),
        ("https://a.com/1", "https://c.com/y"),
        ("https://a.com/1", "https://a.com/self"),
        ("https://b.com/1", "https://c.com/z"),
        ("https://c.com/1", "https://a.com/w"),
    }


def test_extract_links_binary_html(spark, pages):
    from pyspark.sql import functions as F

    bin_pages = pages.select("url", F.encode("html", "UTF-8").alias("html"))
    a = {(r["src_url"], r["dst_url"]) for r in extract_links(pages).collect()}
    b = {(r["src_url"], r["dst_url"]) for r in
         extract_links(bin_pages).collect()}
    assert a == b


def test_domain_edges_and_degrees(pages):
    edges = domain_edges(extract_links(pages))
    e = {(r["src"], r["dst"]): r["n_links"] for r in edges.collect()}
    # the a.com->a.com self-loop is dropped
    assert e == {("a.com", "b.com"): 1, ("a.com", "c.com"): 1,
                 ("b.com", "c.com"): 1, ("c.com", "a.com"): 1}
    deg = {r["domain"]: (r["out_degree"], r["in_degree"])
           for r in degree_stats(edges).collect()}
    assert deg == {"a.com": (2, 1), "b.com": (1, 1), "c.com": (1, 2)}


def test_pagerank_hand_computed(pages):
    edges = domain_edges(extract_links(pages))
    got = {r["domain"]: r["rank"] for r in pagerank(edges, 2).collect()}

    # replay the exact arithmetic (same rounding discipline)
    d, n = 0.85, 3
    base = (1.0 - d) / n
    r = {"a.com": 1.0 / n, "b.com": 1.0 / n, "c.com": 1.0 / n}
    out = {"a.com": ["b.com", "c.com"], "b.com": ["c.com"],
           "c.com": ["a.com"]}
    for _ in range(2):
        contrib = {}
        for src, dsts in out.items():
            for dst in dsts:
                contrib.setdefault(dst, []).append(
                    (src, round(r[src] / len(dsts), 12)))
        nr = {}
        for node in r:
            s = 0.0
            for _, c in sorted(contrib.get(node, [])):
                s += c
            nr[node] = round(base + d * s, 12)
        r = nr
    assert got == r
    # a.com is the sole target of c.com's undivided (largest) rank
    assert max(got, key=got.get) == "a.com"


def test_pagerank_determinism_across_runs(pages):
    edges = domain_edges(extract_links(pages))
    a = sorted(pagerank(edges, 3).collect())
    b = sorted(pagerank(edges, 3).collect())
    assert a == b


def test_zero_udf_plan(pages):
    edges = domain_edges(extract_links(pages))
    plan = pagerank(edges, 2)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_anchor_texts_and_term_index(spark):
    from pyspark.sql import functions as F

    from ohsome_planet_spark.operators.linkgraph import (
        anchor_term_index,
        extract_anchor_texts,
    )

    rows = [
        ("https://a.com/1",
         '<a href="https://b.com/x">great maps site</a>'
         '<a href="https://b.com/y" rel="nofollow">maps again</a>'
         '<a href="https://a.com/self">me</a>'),
        ("https://c.com/1", '<a href="https://b.com/z">Maps</a>'),
    ]
    pages = spark.createDataFrame(rows, "url string, html string")
    anchors = extract_anchor_texts(pages).collect()
    assert {(r["dst_url"], r["anchor"]) for r in anchors} == {
        ("https://b.com/x", "great maps site"),
        ("https://b.com/y", "maps again"),
        ("https://a.com/self", "me"),
        ("https://b.com/z", "Maps"),
    }
    idx = {(r["domain"], r["term"]): r["n"]
           for r in anchor_term_index(extract_anchor_texts(pages)).collect()}
    # self-link term "me" excluded; "maps" counted 3x cross-site
    assert idx[("b.com", "maps")] == 3
    assert ("a.com", "me") not in idx

    bin_pages = pages.select("url", F.encode("html", "UTF-8").alias("html"))
    a = sorted(map(tuple, extract_anchor_texts(pages).collect()))
    b = sorted(map(tuple, extract_anchor_texts(bin_pages).collect()))
    assert a == b


def test_robots_noindex_filter(spark):
    from pyspark.sql import functions as F

    from ohsome_planet_spark.operators.linkgraph import filter_indexable

    rows = [
        (1, '<html><head><meta name="robots" content="noindex,nofollow">'
            '</head><body>hidden</body></html>'),
        (2, '<html><head><meta name="robots" content="index,follow">'
            '</head><body>fine</body></html>'),
        (3, '<html><head><META NAME="robots" CONTENT="NOINDEX"></head>'
            '<body>case</body></html>'),
        (4, '<html><body>no meta at all</body></html>'),
    ]
    df = spark.createDataFrame(rows, "id long, html string")
    kept = {r["id"] for r in filter_indexable(df).collect()}
    assert kept == {2, 4}
    bin_df = df.select("id", F.encode("html", "UTF-8").alias("html"))
    assert {r["id"] for r in filter_indexable(bin_df).collect()} == {2, 4}
