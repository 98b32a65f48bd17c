"""PII detection + redaction (operators/pii.py)."""

import pytest

from pyspark.sql import functions as F

from ohsome_planet_spark.operators.pii import (
    filter_pii_heavy,
    with_pii,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "contact me at jane.doe+spam@mail.example.co.uk for details"),
        (2, "server at 192.168.0.1 and backup at 10.0.0.255 are up"),
        (3, "call +49 (30) 1234-5678 now"),
        (4, "version 999.999.999.999 is not an ip; 256.1.1.1 neither"),
        (5, "clean text with no pii at all"),
        (6, "a@b.io mailed 1.2.3.4 from +1 555 000 1111 twice: c@d.org"),
        (7, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_counts(docs):
    out = {r["doc_id"]: r for r in with_pii(docs).collect()}
    assert (out[1]["n_email"], out[1]["n_ipv4"], out[1]["n_phone"]) == (1, 0, 0)
    assert (out[2]["n_email"], out[2]["n_ipv4"], out[2]["n_phone"]) == (0, 2, 0)
    assert (out[3]["n_email"], out[3]["n_ipv4"], out[3]["n_phone"]) == (0, 0, 1)
    # octet range check: neither 999.x nor 256.x redacts, but 56.1.1.1
    # inside 256.1.1.1 must ALSO not match (left \b sees digit 2)
    assert (out[4]["n_email"], out[4]["n_ipv4"], out[4]["n_phone"]) == (0, 0, 0)
    assert not out[5]["has_pii"] and not out[7]["has_pii"]
    assert (out[6]["n_email"], out[6]["n_ipv4"], out[6]["n_phone"]) == (2, 1, 1)
    assert out[6]["has_pii"]


def test_redaction_text(docs):
    out = {r["doc_id"]: r["text_redacted"] for r in with_pii(docs).collect()}
    assert out[1] == "contact me at <EMAIL> for details"
    assert out[2] == "server at <IP> and backup at <IP> are up"
    assert out[3] == "call <PHONE> now"
    assert out[4] == "version 999.999.999.999 is not an ip; 256.1.1.1 neither"
    assert out[5] == "clean text with no pii at all"
    assert out[6] == "<EMAIL> mailed <IP> from <PHONE> twice: <EMAIL>"
    assert out[7] == ""


def test_filter_pii_heavy(spark, docs):
    heavy = spark.createDataFrame(
        [(100, " ".join(f"user{i}@corp{i}.example.com" for i in range(10)))],
        "doc_id long, text string",
    )
    all_docs = docs.unionByName(heavy)
    kept = {r["doc_id"] for r in filter_pii_heavy(all_docs, max_hits=5).collect()}
    assert 100 not in kept and kept == {1, 2, 3, 4, 5, 6, 7}


def test_zero_udf_plan(docs):
    plan = with_pii(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
