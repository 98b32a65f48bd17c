"""robots.txt parsing + disallow filtering (operators/robots.py)."""

import pytest

from ohsome_planet_spark.operators.robots import (
    filter_robots_disallowed,
    parse_robots,
)

ROBOTS_A = """# site a
User-agent: googlebot
Disallow: /google-only/

User-agent: *
Disallow: /private/
Disallow: /tmp/   # trailing comment
Disallow:

User-agent: other
Disallow: /other/
"""

ROBOTS_B = """User-agent: bingbot
User-agent: *
Disallow: /cgi-bin/
"""

ROBOTS_C = """User-agent: onlybot
Disallow: /all/
"""


@pytest.fixture(scope="module")
def rules(spark):
    df = spark.createDataFrame(
        [("https://a.com/robots.txt", ROBOTS_A),
         ("https://b.com/robots.txt", ROBOTS_B),
         ("https://c.com/robots.txt", ROBOTS_C)],
        "url string, text string")
    return parse_robots(df)


def test_parse_rules(rules):
    got = {(r["domain"], r["disallow_prefix"]) for r in rules.collect()}
    # googlebot-only and other-only sections NOT applied; empty Disallow
    # dropped; the grouped UA header (bingbot + *) applies
    assert got == {
        ("a.com", "/private/"), ("a.com", "/tmp/"),
        ("b.com", "/cgi-bin/"),
    }


def test_filter_pages(spark, rules):
    pages = spark.createDataFrame(
        [(1, "https://a.com/private/secret.html"),
         (2, "https://a.com/public/fine.html"),
         (3, "https://a.com/tmp/x"),
         (4, "https://b.com/cgi-bin/run"),
         (5, "https://b.com/index.html"),
         (6, "https://c.com/all/everything"),   # onlybot rule: not applied
         (7, "https://nodomain.example/whatever"),
         (8, "https://a.com")],                 # no path -> '/'
        "id long, url string")
    kept = {r["id"] for r in
            filter_robots_disallowed(pages, rules).collect()}
    assert kept == {2, 5, 6, 7, 8}


def test_zero_udf_plan(spark, rules):
    pages = spark.createDataFrame([(1, "https://a.com/x")],
                                  "id long, url string")
    plan = filter_robots_disallowed(pages, rules)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
