"""Exact length-distribution profiling (operators/profile.py)."""

import pytest

from ohsome_planet_spark.operators.profile import length_profile


@pytest.fixture(scope="module")
def docs(spark):
    rows = []
    # stratum a: lengths 1..10 (doc i has i tokens)
    for i in range(1, 11):
        rows.append((i, " ".join(["w"] * i), "a"))
    # stratum b: a single doc of 7 tokens
    rows.append((100, " ".join(["x"] * 7), "b"))
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_exact_stats(docs):
    out = {r["source"]: r for r in length_profile(docs).collect()}

    a = out["a"]
    assert (a["n_docs"], a["total_tokens"]) == (10, 55)
    assert a["mean_tokens"] == 5.5
    assert (a["min_tokens"], a["max_tokens"]) == (1, 10)
    # nearest-rank over 1..10: p50 -> rank ceil(5)=5 -> 5;
    # p90 -> rank 9 -> 9; p99 -> rank ceil(9.9)=10 -> 10
    assert (a["p50_tokens"], a["p90_tokens"], a["p99_tokens"]) == (5, 9, 10)

    b = out["b"]
    assert (b["n_docs"], b["min_tokens"], b["max_tokens"]) == (1, 7, 7)
    assert (b["p50_tokens"], b["p90_tokens"], b["p99_tokens"]) == (7, 7, 7)


def test_single_exchange_for_both_windows(docs):
    plan = length_profile(docs)._jdf.queryExecution().executedPlan().toString()
    # rank and stratum-count windows share one hashpartitioning exchange
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_quality_profile_micro_average(spark):
    from ohsome_planet_spark.operators.profile import quality_profile

    rows = [
        (1, "the cat!!", "a"),        # 9 chars, 2 punct, 2 tokens, 1 stop
        (2, "dogs run fast", "a"),    # 13 chars, 0 punct, 3 tokens, 0 stop
        (3, "", "b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["source"]: r for r in quality_profile(df).collect()}
    a = out["a"]
    assert (a["n_docs"], a["total_chars"], a["total_punct"]) == (2, 22, 2)
    assert (a["total_tokens"], a["total_stopwords"]) == (5, 1)
    assert a["punct_ratio"] == 2 / 22 and a["stopword_ratio"] == 1 / 5
    b = out["b"]
    assert b["total_chars"] == 0 and b["punct_ratio"] == 0.0
