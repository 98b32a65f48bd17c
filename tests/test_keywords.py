"""TF-IDF keyword extraction (operators/keywords.py)."""

import math

import pytest

from ohsome_planet_spark.operators.keywords import term_freqs, tfidf_keywords


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "apple apple banana common common common"),
        (2, "banana cherry common common"),
        (3, "cherry cherry cherry common"),
        (4, "date common"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_term_freqs(docs):
    tf = {(r["doc_id"], r["word"]): r["tf"] for r in term_freqs(docs).collect()}
    assert tf[(1, "apple")] == 2 and tf[(1, "common")] == 3
    assert tf[(3, "cherry")] == 3 and tf[(4, "date")] == 1


def test_scores_and_ranking(docs):
    out = tfidf_keywords(docs, top_k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for rows in by_doc.values():
        rows.sort(key=lambda r: r["rank"])

    # doc 1: apple tf=2 df=1 -> 2*ln4 ; banana tf=1 df=2 -> ln2 ; common df=4 -> 0
    d1 = by_doc[1]
    assert [r["word"] for r in d1] == ["apple", "banana"]
    assert d1[0]["score"] == pytest.approx(round(2 * math.log(4), 9), abs=1e-9)
    assert d1[1]["score"] == pytest.approx(round(math.log(2), 9), abs=1e-9)

    # doc 4: date (2*... tf=1 df=1 -> ln4) then common (0)
    d4 = by_doc[4]
    assert [r["word"] for r in d4] == ["date", "common"]
    assert d4[1]["score"] == 0.0

    # ubiquitous word scores exactly ln(N/N)=0 everywhere
    assert all(r["score"] == 0.0 for rows in by_doc.values()
               for r in rows if r["word"] == "common")


def test_min_df_drops_hapax(docs):
    out = tfidf_keywords(docs, top_k=3, min_df=2).collect()
    words = {r["word"] for r in out}
    assert "apple" not in words and "date" not in words
    assert {"banana", "cherry", "common"} <= words


def test_deterministic_tiebreak(spark):
    # two words with identical tf and df in one doc: word asc wins
    df = spark.createDataFrame(
        [(1, "zeta alpha"), (2, "other words")],
        "doc_id long, text string")
    out = [r["word"] for r in tfidf_keywords(df, top_k=2).collect()
           if r["doc_id"] == 1]
    assert out == ["alpha", "zeta"]


def test_zero_udf_plan(docs):
    plan = tfidf_keywords(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
