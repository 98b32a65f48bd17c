"""End-to-end webtext plan: WARC bytes in → curated tile counts out."""

from __future__ import annotations

import gzip

from ohsome_planet_spark.plans.webtext import crawl_to_tiles
from tests.test_warc_source import _http, _record


def test_crawl_to_tiles(spark, tmp_path):
    # pages mention gazetteer entities via the @@Entity@@ markers the
    # extractor recognizes; duplicates + an older capture must vanish
    body = "<html><body>visit @@Zeta_Port@@ and @@Eta_Springs@@ today</body></html>"
    dup = body  # exact duplicate under a different URL
    older = "<html><body>stale @@Zeta_Port@@ page</body></html>"
    recs = [
        _record("response", "http://a.example/p", "2021-01-02T00:00:00Z",
                _http(body.encode())),
        _record("response", "http://b.example/q", "2021-01-03T00:00:00Z",
                _http(dup.encode())),
        _record("response", "http://A.EXAMPLE/p", "2020-06-01T00:00:00Z",
                _http(older.encode())),  # same canonical url, older capture
        _record("response", "http://c.example/r", "2021-01-04T00:00:00Z",
                _http(b"<html><body>no entities here at all</body></html>")),
    ]
    p = tmp_path / "crawl.warc.gz"
    p.write_bytes(b"".join(gzip.compress(r) for r in recs))

    tiles, manifest = crawl_to_tiles(
        spark, str(p),
        curation_kwargs={"min_tokens": 2, "max_punct_ratio": 1.0,
                         "max_dup_line_fraction": 1.0, "with_manifest": True},
    )
    rows = tiles.collect()
    # the old capture of a.example/p is gone (latest-wins), the exact dup
    # of the text is gone (exact dedup keeps one doc) -> entities come
    # from ONE surviving page mentioning two gazetteer entities
    assert manifest["input"] == 3  # after latest-wins URL dedup
    assert manifest["after_exact_dedup"] == 2
    total_mentions = sum(r["n"] for r in rows)
    assert total_mentions == 2  # the two entities once each
    assert all(r["country"] is not None or True for r in rows)


def test_crawl_link_graph(spark, tmp_path):
    from ohsome_planet_spark.plans.webtext import crawl_link_graph

    mk = lambda links: ("<html><body>" + "".join(
        f'<a href="{u}">l</a>' for u in links) + "</body></html>").encode()
    recs = [
        _record("response", "http://a.example/1", "2021-01-02T00:00:00Z",
                _http(mk(["http://b.example/x", "http://c.example/y"]))),
        _record("response", "http://b.example/1", "2021-01-02T00:00:00Z",
                _http(mk(["http://c.example/z"]))),
        _record("response", "http://c.example/1", "2021-01-02T00:00:00Z",
                _http(mk(["http://a.example/w"]))),
    ]
    p = tmp_path / "links.warc.gz"
    p.write_bytes(b"".join(gzip.compress(r) for r in recs))

    out = {r["domain"]: r for r in crawl_link_graph(spark, str(p)).collect()}
    assert set(out) == {"a.example", "b.example", "c.example"}
    assert (out["a.example"]["out_degree"], out["a.example"]["in_degree"]) == (2, 1)
    assert (out["c.example"]["out_degree"], out["c.example"]["in_degree"]) == (1, 2)
    assert abs(sum(r["rank"] for r in out.values()) - 1.0) < 0.2
    # a.example receives c.example's undivided rank -> highest authority
    assert max(out, key=lambda d: out[d]["rank"]) == "a.example"


def test_crawl_to_tiles_authority_and_robots_filters(spark, tmp_path):
    from ohsome_planet_spark.plans.webtext import crawl_to_tiles

    linked = ("<html><body>visit @@Zeta_Port@@ "
              '<a href="http://b.example/q">b</a></body></html>')
    linked_b = ("<html><body>also @@Eta_Springs@@ "
                '<a href="http://a.example/p">a</a></body></html>')
    orphan = "<html><body>spam farm @@Zeta_Port@@ island page</body></html>"
    noindex = ('<html><head><meta name="robots" content="noindex"></head>'
               '<body>@@Eta_Springs@@ hidden '
               '<a href="http://a.example/p">a</a></body></html>')
    recs = [
        _record("response", "http://a.example/p", "2021-01-02T00:00:00Z",
                _http(linked.encode())),
        _record("response", "http://b.example/q", "2021-01-03T00:00:00Z",
                _http(linked_b.encode())),
        _record("response", "http://orphan.example/r", "2021-01-04T00:00:00Z",
                _http(orphan.encode())),
        _record("response", "http://c.example/s", "2021-01-05T00:00:00Z",
                _http(noindex.encode())),
    ]
    p = tmp_path / "crawl2.warc.gz"
    p.write_bytes(b"".join(gzip.compress(r) for r in recs))

    _, manifest = crawl_to_tiles(
        spark, str(p),
        curation_kwargs={"min_tokens": 2, "max_punct_ratio": 1.0,
                         "max_dup_line_fraction": 1.0, "with_manifest": True},
        min_domain_in_degree=1,
        honor_robots_noindex=True,
    )
    # noindex page dropped first; orphan.example has no inbound links;
    # a.example and b.example cite each other -> 2 pages enter curation
    assert manifest["input"] == 2


def test_crawl_to_tiles_honors_robots_txt(spark, tmp_path):
    from ohsome_planet_spark.plans.webtext import crawl_to_tiles

    robots = "User-agent: *\nDisallow: /private/\n"
    ok = "<html><body>open @@Zeta_Port@@ page body here</body></html>"
    hidden = "<html><body>secret @@Eta_Springs@@ page body</body></html>"
    recs = [
        _record("response", "http://a.example/robots.txt",
                "2021-01-01T00:00:00Z",
                _http(robots.encode())),
        _record("response", "http://a.example/open/x", "2021-01-02T00:00:00Z",
                _http(ok.encode())),
        _record("response", "http://a.example/private/y",
                "2021-01-03T00:00:00Z", _http(hidden.encode())),
    ]
    p = tmp_path / "crawl3.warc.gz"
    p.write_bytes(b"".join(gzip.compress(r) for r in recs))

    _, manifest = crawl_to_tiles(
        spark, str(p),
        curation_kwargs={"min_tokens": 2, "max_punct_ratio": 1.0,
                         "max_dup_line_fraction": 1.0, "with_manifest": True},
        honor_robots_txt=True,
    )
    # robots.txt itself excluded from the corpus; /private/y dropped
    assert manifest["input"] == 1
