"""CCNet cross-document paragraph dedup (operators/dedup.cross_doc_paragraph_dedup)."""

import pytest

from ohsome_planet_spark.operators.dedup import cross_doc_paragraph_dedup


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # boilerplate appears in all three; "alpha" in docs 0+1; unique tails
        (0, "Subscribe now.\nalpha line here.\nunique zero tail."),
        (1, "subscribe now.\nAlpha Line Here.\nunique one tail."),
        (2, "SUBSCRIBE NOW.\nbeta line here.\nunique two tail."),
        # doc that is 100% boilerplate must keep its row, clean_text = ''
        (3, "subscribe now."),
        # repeated paragraph INSIDE one doc only: not cross-doc, kept twice
        (4, "solo repeat.\nsolo repeat.\nunique four tail."),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_paragraph_dedup_drops_cross_doc_only(docs):
    got = {r["doc_id"]: r.asDict()
           for r in cross_doc_paragraph_dedup(docs, min_docs=2).collect()}
    assert len(got) == 5
    # normalization: case/whitespace-insensitive hash, original text kept
    assert got[0]["clean_text"] == "unique zero tail."
    assert got[1]["clean_text"] == "unique one tail."
    assert got[2]["clean_text"] == "beta line here.\nunique two tail."
    assert got[0]["n_paragraphs"] == 3 and got[0]["n_dropped"] == 2
    # fully-boilerplate doc keeps its row
    assert got[3]["clean_text"] == "" and got[3]["n_dropped"] == 1
    # within-doc repetition is NOT cross-doc: both copies survive, in order
    assert got[4]["clean_text"] == "solo repeat.\nsolo repeat.\nunique four tail."
    assert got[4]["n_dropped"] == 0


def test_paragraph_dedup_min_docs_threshold(docs):
    """min_docs=3: only the 3-doc boilerplate goes; the 2-doc alpha stays."""
    got = {r["doc_id"]: r["clean_text"]
           for r in cross_doc_paragraph_dedup(docs, min_docs=3).collect()}
    assert got[0] == "alpha line here.\nunique zero tail."
    assert got[1] == "Alpha Line Here.\nunique one tail."
    assert got[3] == ""


def test_paragraph_dedup_order_preserved_across_partitioning(docs):
    a = sorted(map(tuple, cross_doc_paragraph_dedup(docs).collect()))
    b = sorted(map(tuple,
                   cross_doc_paragraph_dedup(docs.repartition(7)).collect()))
    assert a == b
