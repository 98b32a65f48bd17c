"""Text kernels: hashtag reference parity, entity extraction, langid."""

import pytest

from ohsome_planet_spark.functions.text import (
    extract_entities_py,
    hashtags_py,
    lang_id_py,
    doc_fingerprint_py,
)


class TestHashtags:
    """Golden cases mirror ChangesetHashtags semantics
    (/root/reference/osm-changesets/.../ChangesetHashtags.java:19-34)."""

    def test_basic(self):
        assert hashtags_py(None, "mapping #hotosm-task #MissingMaps today") == [
            "MissingMaps",
            "hotosm-task",
        ]

    def test_urls_stripped(self):
        assert hashtags_py(None, "see http://example.com/#anchor and #real") == ["real"]

    def test_short_and_numeric_dropped(self):
        assert hashtags_py(None, "#a #12 #ab #1x") == ["1x", "ab"]

    def test_both_fields_distinct_sorted(self):
        assert hashtags_py("#zeta #alpha", "#alpha #beta") == ["alpha", "beta", "zeta"]

    def test_separators_terminate(self):
        assert hashtags_py(None, "#tag,next #tag2(x) #tag3;y") == ["tag2", "tag3", "tag"] or True
        got = hashtags_py(None, "#tag,next #tag2(x) #tag3;y")
        assert got == ["tag", "tag2", "tag3"]

    def test_none_fields(self):
        assert hashtags_py(None, None) == []


def test_extract_entities():
    assert extract_entities_py("x @@Alpha_City@@ y @@Beta_Metro@@") == [
        "Alpha_City",
        "Beta_Metro",
    ]
    assert extract_entities_py("no mentions") == []


def test_lang_id():
    assert lang_id_py("hello world") == "en"
    assert lang_id_py("straße über") == "de"
    assert lang_id_py("日本語ではなく中文") == "zh"
    assert lang_id_py("привет") == "ru"


def test_fingerprint_deterministic():
    a = doc_fingerprint_py("some document text " * 20)
    b = doc_fingerprint_py("some document text " * 20)
    c = doc_fingerprint_py("different document " * 20)
    assert a == b
    assert a != c


def test_token_count_bpe(spark):
    from ohsome_planet_spark.functions.text import token_count_bpe_col

    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "hello world"), (2, "it's 2024, ok?!"), (3, ""), (4, "a1b2")],
        "id long, text string",
    )
    got = {r["id"]: r["n"] for r in df.select(
        "id", token_count_bpe_col(F.col("text")).alias("n")).collect()}
    # "hello","world" → 2 ; "it","'","s","2","0","2","4",",","ok","?","!" → 11
    # "" → 0 ; "a","1","b","2" → 4
    assert got == {1: 2, 2: 11, 3: 0, 4: 4}


def test_hash_sample_deterministic_and_stratified(spark):
    from ohsome_planet_spark.operators.sampling import hash_sample

    df = spark.createDataFrame(
        [(i, "en" if i % 3 else "de") for i in range(3000)], "doc_id long, lang string"
    )
    s1 = hash_sample(df, "doc_id", rate_by={"en": 0.5, "de": 0.1}, stratum_col="lang")
    s2 = hash_sample(df, "doc_id", rate_by={"en": 0.5, "de": 0.1}, stratum_col="lang")
    ids1 = {r["doc_id"] for r in s1.collect()}
    ids2 = {r["doc_id"] for r in s2.collect()}
    assert ids1 == ids2  # identical rows on every run
    got = {r["lang"]: r["count"] for r in s1.groupBy("lang").count().collect()}
    assert abs(got["en"] / 2000 - 0.5) < 0.05
    assert abs(got["de"] / 1000 - 0.1) < 0.05
    # flat-rate variant + strata not listed are dropped
    assert hash_sample(df.where("lang = 'de'"), "doc_id", rate=1.0).count() == 1000
    only_en = hash_sample(df, "doc_id", rate_by={"en": 1.0}, stratum_col="lang")
    assert only_en.where("lang = 'de'").count() == 0


def test_canonical_url_spellings(spark):
    """All spellings of one page collapse to a single canonical form;
    distinct pages stay distinct."""
    from pyspark.sql import functions as F

    from ohsome_planet_spark.operators.urls import canonical_url_col

    urls = [
        "HTTPS://Site.Example.COM/p/1?utm_source=x&id=3",
        "https://site.example.com:443/p/1/?id=3&fbclid=zzz",
        "https://site.example.com/p/1?id=3#frag",
        "http://site.example.com:80/p/1?id=3",     # http: different scheme
        "https://site.example.com/p/2?id=3",       # different path
        "https://site.example.com/p/1?id=4",       # different param value
        "https://site.example.com/p/1?b=2&id=3",   # extra param
        "https://site.example.com/p/1?id=3&b=2",   # same params, reordered
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [r[0] for r in df.select(canonical_url_col(F.col("url"))).collect()]
    assert got[0] == got[1] == got[2] == "https://site.example.com/p/1?id=3"
    assert got[3] == "http://site.example.com/p/1?id=3"
    assert got[4] == "https://site.example.com/p/2?id=3"
    assert got[5] == "https://site.example.com/p/1?id=4"
    assert got[6] == got[7] == "https://site.example.com/p/1?b=2&id=3"


def test_line_quality_cols_closed_form(spark):
    from pyspark.sql import functions as F

    from ohsome_planet_spark.functions.text import line_quality_cols

    text = "a\na\n- item\nend...\n   \n"
    df = spark.createDataFrame([(text,)], "text string")
    q = line_quality_cols(F.col("text"))
    row = df.select(
        q["n_lines"].alias("n"), q["dup_line_fraction"].alias("d"),
        q["bullet_line_fraction"].alias("b"), q["ellipsis_line_fraction"].alias("e"),
    ).collect()[0]
    assert row["n"] == 4           # blank line excluded
    assert row["d"] == pytest.approx(0.25)   # one duplicate of 'a'
    assert row["b"] == pytest.approx(0.25)
    assert row["e"] == pytest.approx(0.25)


def test_canonical_url_idempotent(spark):
    """canonical(canonical(u)) == canonical(u) — the canonical form is a
    fixed point, including for degenerate inputs."""
    from pyspark.sql import functions as F

    from ohsome_planet_spark.operators.urls import canonical_url_col

    urls = [
        "HTTPS://A.B:443/x/y/?utm_source=1&z=2&a=3#f",
        "http://h:80",
        "https://h/p//",
        "https://h/p?",
        "https://h/p?&&",
        "https://h/p?ref=x",
        "ftp://odd.example/path",
        "https://h:8443/p?b=1&a=2",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = df.select(canonical_url_col(F.col("url")).alias("c1"))
    twice = once.select(F.col("c1"), canonical_url_col(F.col("c1")).alias("c2"))
    rows = twice.collect()
    for r in rows:
        assert r["c1"] == r["c2"], r


def test_canonical_url_unparseable_falls_back_to_raw(spark):
    """Scheme-less / non-hierarchical URLs must each keep their own raw
    string as the canonical key — never collapse to a shared sentinel."""
    from pyspark.sql import functions as F

    from ohsome_planet_spark.operators.urls import canonical_url_col

    urls = ["example.com/a", "other.com/b", "mailto:x@y.com", "", "https://ok/p"]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [r[0] for r in df.select(canonical_url_col(F.col("url"))).collect()]
    assert got[:4] == urls[:4]          # raw fallbacks, all distinct
    assert got[4] == "https://ok/p"


def test_canonical_url_fragment_question_mark_no_leak(spark):
    """A '?' inside the fragment must not resurrect as query params."""
    from pyspark.sql import functions as F

    from ohsome_planet_spark.operators.urls import canonical_url_col

    df = spark.createDataFrame(
        [("https://h/p#sec?x=1",), ("https://h/p",)], "url string")
    got = [r[0] for r in df.select(canonical_url_col(F.col("url"))).collect()]
    assert got[0] == got[1] == "https://h/p"


def test_dedup_latest_per_url_tie_deterministic(spark):
    """Equal warc_ts captures: the winner is the max (ts, url) pair — not
    partition-order dependent."""
    import pandas as pd

    from ohsome_planet_spark.operators.urls import dedup_latest_per_url

    t = pd.Timestamp("2024-01-01 00:00:00").to_pydatetime()
    rows = [("https://h/p?b=1&a=2", t), ("https://h/p?a=2&b=1", t)]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp_ntz").repartition(4)
    out = dedup_latest_per_url(df).collect()
    assert len(out) == 1
    assert out[0]["latest_url"] == "https://h/p?b=1&a=2"  # max url on tie
    assert out[0]["n_captures"] == 2


def test_registered_domain_heuristic(spark):
    from pyspark.sql import functions as F

    from ohsome_planet_spark.operators.urls import registered_domain_col

    cases = {
        "https://news.site.co.uk/x": "site.co.uk",
        "https://a.b.site.com/x": "site.com",
        "https://site.com/x": "site.com",
        "https://localhost/x": "localhost",
        "https://cdn.other.org/x": "other.org",
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = dict(zip(cases, (r[0] for r in df.select(
        registered_domain_col(F.col("url"))).collect())))
    assert got == cases


def test_hashtags_col_matches_py_randomized(spark):
    """The folded-regex hashtags_col == hashtags_py across randomized
    strings mixing tags, urls, digits-only tags, short tags, punctuation
    boundaries, and unicode-space separators."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(13)
    pieces = ["#ok", "#no", "#x", "#12", "#12ab", "#tag-1", "#тег", "#A_B",
              "http://e.com/#skip", "https://x#y", "plain", "#", "##d",
              "#ok#ok2", "#end.", "#mid,tail", "#123", "#1", " #nb",
              "#emoji🎉", "# space", "#tab\t#after"]
    rows = []
    for i in range(300):
        a = " ".join(rng.choices(pieces, k=rng.randint(0, 6))) or None
        b = " ".join(rng.choices(pieces, k=rng.randint(0, 6))) or None
        rows.append((i, a, b))
    df = spark.createDataFrame(rows, "i long, a string, b string")
    from ohsome_planet_spark.functions.text import hashtags_col, hashtags_py

    got = {
        r["i"]: list(r["tags"])
        for r in df.select(
            "i", hashtags_col(F.col("a"), F.col("b")).alias("tags")
        ).collect()
    }
    for i, a, b in rows:
        assert got[i] == hashtags_py(a, b), (i, a, b)


def test_gopher_repetition_signals(spark):
    """The repetition fractions must actually separate pathological docs:
    a looping 2-gram doc scores near-1 on top-2gram chars, a doc with a
    repeated 6-word block scores high on dup-6gram chars, and normal
    text scores low on both."""
    from ohsome_planet_spark.functions.text import with_gopher_repetition

    rows = [
        (1, "spam ham spam ham spam ham spam ham end"),
        (2, "alpha beta gamma delta epsilon zeta "
            "alpha beta gamma delta epsilon zeta tail words here now"),
        (3, "perfectly ordinary sentence with no repeated phrasing at all"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in with_gopher_repetition(
        df, top_ns=(2,), dup_ns=(6,)).collect()}
    assert out[1]["frac_chars_top_2gram"] > 0.8
    assert out[2]["frac_chars_dup_6grams"] > 0.5
    assert out[3]["frac_chars_top_2gram"] < 0.5
    assert out[3]["frac_chars_dup_6grams"] == 0.0
    assert out[4]["frac_chars_top_2gram"] == 0.0


def test_gopher_lexical_values(spark):
    from pyspark.sql import functions as F

    from ohsome_planet_spark.functions.text import gopher_lexical_cols

    rows = [(1, "the cat and the hat"), (2, "### ... … x1"), (3, ""),
            (4, "12 34 abc")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    g = gopher_lexical_cols(F.col("text"))
    out = {r["doc_id"]: r for r in df.select(
        "doc_id", *[v.alias(k) for k, v in g.items()]).collect()}
    r1 = out[1]
    assert r1["n_words"] == 5 and r1["n_stop_words"] == 3  # the, and, the
    assert r1["mean_word_length"] == (19 - 4) / 5
    assert r1["frac_words_alpha"] == 1.0
    r2 = out[2]
    assert r2["n_words"] == 4
    assert r2["symbol_to_word_ratio"] == (3 + 2) / 4  # 3×'#', '...', '…'
    assert r2["frac_words_alpha"] == 0.25
    assert out[3]["n_words"] == 0 and out[3]["mean_word_length"] == 0.0
    assert out[4]["frac_words_alpha"] == pytest.approx(1 / 3)


def test_normalize_text_col(spark):
    from pyspark.sql import functions as F

    from ohsome_planet_spark.functions.text import normalize_text_col

    rows = [
        (1, "café"),            # decomposed -> café
        (2, "café"),             # precomposed stays
        (3, "Ångström"),  # Å + ö composition
        (4, "keep\ttabs\nand\rnewlines"),
        (5, "strip\x01ctl\x9fchars"),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "i long, t string")
    out = {r["i"]: r["n"] for r in df.select(
        "i", normalize_text_col(F.col("t")).alias("n")).collect()}
    assert out[1] == out[2] == "café"
    assert out[3] == "Ångström"
    assert out[4] == "keep\ttabs\nand\rnewlines"
    assert out[5] == "stripctlchars"
    assert out[6] is None


def test_c4_line_filter(spark):
    from pyspark.sql import functions as F

    from ohsome_planet_spark.functions.text import c4_line_filter_col

    doc = "\n".join([
        "this is a perfectly good sentence that survives here.",
        "short line.",
        "no terminal punctuation on this long enough line",
        "please enable JavaScript to continue viewing this content.",
        "we show some lorem ipsum placeholder text right here now.",
        "function f() { return 42; } is code inside the page text.",
        'a quoted ending also counts as terminal punctuation "',
        "does a question mark count as terminal punctuation too?",
    ])
    out = spark.createDataFrame([(doc,)], "t string").select(
        c4_line_filter_col(F.col("t")).alias("c")).first()["c"]
    lines = out.split("\n")
    assert lines == [
        "this is a perfectly good sentence that survives here.",
        'a quoted ending also counts as terminal punctuation "',
        "does a question mark count as terminal punctuation too?",
    ]
    empty = spark.createDataFrame([("js { }",)], "t string").select(
        c4_line_filter_col(F.col("t")).alias("c")).first()["c"]
    assert empty == ""
