"""Vendored Public Suffix List: python matcher == Column expression, plus
the real-file parser (the full-PSL swap point)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ohsome_planet_spark.data.public_suffix import (
    SNAPSHOT,
    load_psl,
    registered_domain_py,
)
from ohsome_planet_spark.operators.urls import registered_domain_col

HOSTS = [
    "news.site.co.uk", "deep.sub.site.co.uk", "site.co.uk", "co.uk", "uk",
    "a.b.site.com", "site.com", "com", "localhost",
    "shop.mall.com.au", "x.gov.au", "media.abc.net.au",
    "user.github.io", "a.b.github.io", "github.io",
    "blog.blogspot.com", "x.wordpress.com",
    "media.bucket.s3.amazonaws.com", "s3.amazonaws.com",
    "a.b.ck", "b.ck", "www.ck", "x.www.ck", "ck",
    "x.co.jp", "y.ne.jp", "z.com.br", "w.gob.mx", "v.co.kr",
    "a.waw.pl", "b.k12.tr", "c.muni.il",
]


def test_py_matcher_cases():
    r = registered_domain_py
    assert r("news.site.co.uk") == "site.co.uk"
    assert r("deep.sub.site.co.uk") == "site.co.uk"
    assert r("site.co.uk") == "site.co.uk"
    assert r("co.uk") == "co.uk"          # at the suffix: whole host
    assert r("a.b.site.com") == "site.com"
    assert r("user.github.io") == "user.github.io"   # private section
    assert r("a.b.github.io") == "b.github.io"
    assert r("media.bucket.s3.amazonaws.com") == "bucket.s3.amazonaws.com"
    assert r("a.b.ck") == "a.b.ck"        # wildcard *.ck
    assert r("x.www.ck") == "www.ck"      # exception !www.ck
    assert r("UPPER.Site.COM") == "site.com"


def test_column_equals_py(spark):
    urls = [(h, f"https://{h}/p") for h in HOSTS]
    df = spark.createDataFrame(urls, "host string, url string")
    got = {
        row["host"]: row["dom"]
        for row in df.select(
            "host", registered_domain_col(F.col("url")).alias("dom")
        ).collect()
    }
    for h in HOSTS:
        assert got[h] == registered_domain_py(h), h


def test_load_psl_roundtrip(tmp_path):
    dat = tmp_path / "psl.dat"
    dat.write_text(
        "// ===BEGIN ICANN DOMAINS===\n"
        "com\nuk\nco.uk\n*.ck\n!www.ck\n"
        "// ===BEGIN PRIVATE DOMAINS===\n"
        "github.io\ns3.amazonaws.com\n*.compute.amazonaws.com\n"
    )
    rules = load_psl(str(dat))
    assert "co.uk" in rules.suffixes_2
    assert "github.io" in rules.suffixes_2
    assert "s3.amazonaws.com" in rules.suffixes_3
    assert "ck" in rules.wildcard_1
    assert "www.ck" in rules.exceptions_2
    assert registered_domain_py("a.site.co.uk", rules) == "site.co.uk"
    assert registered_domain_py("x.www.ck", rules) == "www.ck"
