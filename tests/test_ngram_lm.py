"""Bigram LM training + scoring (operators/ngram_lm.py).

Hand-computable fixture first (every count checked against arithmetic done
in the docstrings), then the filtering property: in-domain text scores a
higher logprob_per_token than planted gibberish.
"""

import math

import pytest

from ohsome_planet_spark.operators.ngram_lm import (
    bigram_model,
    context_counts,
    doc_bigrams,
    with_lm_stats,
)


@pytest.fixture(scope="module")
def tiny(spark):
    # doc 1: "a b a b c"  -> bigrams (a,b) (b,a) (a,b) (b,c)
    # doc 2: "a b"        -> (a,b)
    # doc 3: "x"          -> none (single token)
    # doc 4: ""           -> none (no tokens)
    return spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b"), (3, "x"), (4, "")],
        "doc_id long, text string",
    )


def test_doc_bigrams_exact(tiny):
    rows = {(r["_id"], r["w1"], r["w2"])
            for r in doc_bigrams(tiny).collect()}
    assert rows == {
        (1, "a", "b"), (1, "b", "a"), (1, "b", "c"),
        (2, "a", "b"),
    } | {(1, "a", "b")}  # (a,b) appears twice in doc 1 — set collapses; count below
    assert doc_bigrams(tiny).count() == 5


def test_bigram_model_counts_and_prune_order(tiny):
    m = {(r["w1"], r["w2"]): r["n"] for r in bigram_model(tiny).collect()}
    # corpus bigrams: (a,b)x3, (b,a)x1, (b,c)x1
    assert m == {("a", "b"): 3, ("b", "a"): 1, ("b", "c"): 1}
    # deterministic prune: top-2 must keep (a,b) then (b,a) (count desc, w1 asc)
    top2 = [(r["w1"], r["w2"]) for r in bigram_model(tiny, top_k=2).collect()]
    assert top2 == [("a", "b"), ("b", "a")]
    ctx = {r["w1"]: r["ctx_n"] for r in context_counts(bigram_model(tiny)).collect()}
    assert ctx == {"a": 3, "b": 2}


def test_lm_stats_integer_exact_and_logprob(tiny):
    model = bigram_model(tiny)
    # V = distinct w2 in model {a, b, c} + 1 = 4; k = 1
    out = {r["doc_id"]: r for r in with_lm_stats(tiny, model).collect()}

    d1 = out[1]
    assert (d1["n_tokens"], d1["n_bigrams"]) == (5, 4)
    assert d1["matched_bigrams"] == 4 and d1["matched_contexts"] == 4
    # sum c(w1,w2): 3 + 1 + 3 + 1 = 8 ; sum c(w1,.): 3 + 2 + 3 + 2 = 10
    assert d1["sum_bigram_n"] == 8 and d1["sum_context_n"] == 10
    expected = (
        math.log((3 + 1) / (3 + 4)) * 2   # (a,b) twice
        + math.log((1 + 1) / (2 + 4))     # (b,a)
        + math.log((1 + 1) / (2 + 4))     # (b,c)
    )
    assert d1["logprob"] == pytest.approx(expected, rel=1e-12)
    assert d1["logprob_per_token"] == pytest.approx(expected / 4, rel=1e-12)

    # doc 3 (one token) and doc 4 (empty): zero bigrams, logprob 0
    for did, ntok in ((3, 1), (4, 0)):
        d = out[did]
        assert d["n_tokens"] == ntok and d["n_bigrams"] == 0
        assert d["logprob"] == 0.0 and d["logprob_per_token"] == 0.0


def test_unseen_bigrams_score_smoothing_floor(spark, tiny):
    model = bigram_model(tiny)
    probe = spark.createDataFrame([(9, "q r")], "doc_id long, text string")
    r = with_lm_stats(probe, model).collect()[0]
    assert r["matched_bigrams"] == 0 and r["matched_contexts"] == 0
    assert r["sum_bigram_n"] == 0 and r["sum_context_n"] == 0
    # unseen context: ln((0+1)/(0+4)) = -ln 4
    assert r["logprob"] == pytest.approx(-math.log(4.0), rel=1e-12)


def test_lm_filters_gibberish(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text").limit(400)
    model = bigram_model(docs, top_k=50_000)
    from pyspark.sql import functions as F

    d = F.col("doc_id")
    gib = docs.limit(40).select(
        (d + 10_000_000).alias("doc_id"),
        F.concat_ws(
            " ", F.lit("zzq"), d.cast("string"), F.lit("qxj"),
            (d * 7).cast("string"), F.lit("vvw"), (d * 13).cast("string"),
        ).alias("text"),
    )
    scored = with_lm_stats(docs.unionByName(gib), model)
    med = scored.where(d < 10_000_000).agg(
        F.expr("percentile_approx(logprob_per_token, 0.5)")).collect()[0][0]
    worst_gib = scored.where(d >= 10_000_000).agg(
        F.max("logprob_per_token")).collect()[0][0]
    assert worst_gib < med  # every gibberish doc scores below the corpus median


def test_shuffle_join_variant_matches_broadcast(tiny):
    model = bigram_model(tiny)
    a = with_lm_stats(tiny, model, broadcast_model=True).collect()
    b = with_lm_stats(tiny, model, broadcast_model=False).collect()
    key = lambda r: r["doc_id"]
    assert sorted(a, key=key) == sorted(b, key=key)


def test_pmi_collocations(spark):
    from ohsome_planet_spark.operators.ngram_lm import pmi_collocations

    # "alpha beta" always together (perfect collocation); "the" everywhere
    rows = [(i, "the alpha beta the filler" + str(i % 3)) for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pmi_collocations(df, min_count=3, top_k=5).collect()
    pairs = [(r["w1"], r["w2"]) for r in out]
    assert pairs[0] == ("alpha", "beta")

    r = out[0]
    # hand-check: n12=12, n1=n2=12, Nu=60, Nb=48
    assert (r["n12"], r["n1"], r["n2"]) == (12, 12, 12)
    import math
    want = round(math.log((12 * 60.0 * 60.0) / (48.0 * 12 * 12)), 9)
    assert r["pmi"] == pytest.approx(want, abs=1e-9)
    # ranking is fully deterministic
    again = pmi_collocations(df, min_count=3, top_k=5).collect()
    assert [(x["w1"], x["w2"], x["pmi"]) for x in again] == \
           [(x["w1"], x["w2"], x["pmi"]) for x in out]


def test_logprob_exact_matches_python_fold(spark):
    from ohsome_planet_spark.operators.ngram_lm import (
        bigram_model, with_lm_logprob_exact)
    import math

    rows = [(1, "a b a b c"), (2, "a b"), (3, "zz qq"), (4, "solo")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    model = bigram_model(df, top_k=100)
    mrows = {(r["w1"], r["w2"]): r["n"] for r in model.collect()}
    ctx = {}
    for (w1, _), n in mrows.items():
        ctx[w1] = ctx.get(w1, 0) + n
    v = len({w2 for _, w2 in mrows}) + 1

    def fold(text):
        t = text.split()
        acc = 0.0
        for a, b in zip(t, t[1:]):
            acc += round(
                math.log((mrows.get((a, b), 0) + 1.0) / (ctx.get(a, 0) + v)),
                9)
        return acc

    got = {r["doc_id"]: r for r in with_lm_logprob_exact(df, model).collect()}
    assert got[1]["logprob"] == fold("a b a b c")
    assert got[2]["logprob"] == fold("a b")
    assert got[3]["logprob"] == fold("zz qq")  # unseen pairs: ln(1/V) terms
    assert got[4]["n_bigrams"] == 0 and got[4]["logprob"] == 0.0


def test_perplexity_buckets_head_is_best(spark):
    from ohsome_planet_spark.operators.ngram_lm import (
        bigram_model, perplexity_buckets)

    # 6 fluent docs from one template + 3 gibberish docs; per-lang tiles
    rows = [(i, "en", "the cat sat on the mat") for i in range(6)]
    rows += [(10 + i, "en", f"zzq{i} vvw{i} qxj{i}") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    model = bigram_model(df, top_k=100)
    out = perplexity_buckets(df, model, n_buckets=3, lang_col="lang")
    by = {r["doc_id"]: r for r in out.collect()}
    # every gibberish doc lands in the tail; fluent docs fill the head
    assert all(by[10 + i]["label"] == "tail" for i in range(3))
    assert all(by[i]["label"] == "head" for i in range(3))
    # buckets are balanced ntiles: 9 docs -> 3/3/3
    from collections import Counter
    assert Counter(r["label"] for r in by.values()) == {
        "head": 3, "middle": 3, "tail": 3}


def test_perplexity_buckets_short_docs_sort_last(spark):
    from ohsome_planet_spark.operators.ngram_lm import (
        bigram_model, perplexity_buckets)

    rows = [(1, "a b a b"), (2, "a b"), (3, "x")]  # doc 3: no bigrams
    df = spark.createDataFrame(rows, "doc_id long, text string")
    model = bigram_model(df, top_k=10)
    out = {r["doc_id"]: r for r in
           perplexity_buckets(df, model, n_buckets=3).collect()}
    assert out[3]["lpt"] is None and out[3]["bucket"] == 3
