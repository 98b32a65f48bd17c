"""BM25 retrieval (operators/bm25.py) — hand-computed fixture + ranking
properties."""

import math

import pytest

from ohsome_planet_spark.operators.bm25 import bm25_scores, bm25_topk


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "spark engine spark cluster"),      # dl 4, tf(spark)=2
        (2, "spark"),                            # dl 1, tf(spark)=1
        (3, "the quick brown fox"),              # dl 4, no match
        (4, "engine room"),                      # dl 2, tf(engine)=1
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bm25(tf, dl, df, n, avgdl, k1=1.2, b=0.75):
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    tfc = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    return round(idf * tfc, 9)


def test_scores_hand_computed(corpus):
    out = {r["doc_id"]: r for r in
           bm25_scores(corpus, ["spark", "engine"]).collect()}
    assert set(out) == {1, 2, 4}  # doc 3 matches nothing -> absent
    n, avgdl = 4, 11 / 4

    d1 = out[1]
    assert (d1["matched_terms"], d1["sum_tf"], d1["doc_len"]) == (2, 3, 4)
    exp1 = round(_bm25(2, 4, 2, n, avgdl) + _bm25(1, 4, 2, n, avgdl), 6)
    assert d1["score"] == pytest.approx(exp1, abs=2e-6)

    d2 = out[2]
    assert (d2["matched_terms"], d2["sum_tf"], d2["doc_len"]) == (1, 1, 1)
    assert d2["score"] == pytest.approx(round(_bm25(1, 1, 2, n, avgdl), 6),
                                        abs=2e-6)

    d4 = out[4]
    assert (d4["matched_terms"], d4["sum_tf"], d4["doc_len"]) == (1, 1, 2)


def test_query_term_set_semantics(corpus):
    once = bm25_scores(corpus, ["spark"]).collect()
    twice = bm25_scores(corpus, ["spark", "SPARK", "spark"]).collect()
    key = lambda r: r["doc_id"]
    assert sorted(once, key=key) == sorted(twice, key=key)


def test_topk_order_and_determinism(corpus):
    top = bm25_topk(corpus, ["spark", "engine"], k=2).collect()
    assert [r["doc_id"] for r in top] == [1, 2]  # two-term doc outranks
    again = bm25_topk(corpus, ["spark", "engine"], k=2).collect()
    assert [(r["doc_id"], r["score"]) for r in top] == \
           [(r["doc_id"], r["score"]) for r in again]


def test_rare_term_outscores_common(spark):
    rows = [(i, "common filler words here") for i in range(20)]
    rows.append((100, "common rareword filler"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    top = bm25_topk(df, ["common", "rareword"], k=1).collect()
    assert top[0]["doc_id"] == 100


def test_zero_udf_plan(corpus):
    plan = bm25_scores(corpus, ["spark"])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_index_path_equals_direct(spark, corpus):
    from ohsome_planet_spark.operators.bm25 import (
        bm25_from_index,
        build_inverted_index,
    )

    postings, doc_stats = build_inverted_index(corpus)
    direct = bm25_scores(corpus, ["spark", "engine"]).collect()
    via_idx = bm25_from_index(postings, doc_stats,
                              ["spark", "engine"]).collect()
    key = lambda r: r["doc_id"]
    # bit-identical, score included (same arithmetic, same ordered fold)
    assert sorted(direct, key=key) == sorted(via_idx, key=key)


def test_index_snapshot_roundtrip(spark, corpus, tmp_path):
    """Build once → snapshot (term-hash-bucket partitions) → query from
    the committed snapshot without touching the corpus text."""
    from pyspark.sql import functions as F

    from ohsome_planet_spark.io.snapshots import SnapshotTable
    from ohsome_planet_spark.operators.bm25 import (
        bm25_from_index,
        build_inverted_index,
    )

    postings, doc_stats = build_inverted_index(corpus)
    t = SnapshotTable(str(tmp_path / "postings"))
    t.write_partitions(
        postings.withColumn("bucket", F.crc32(F.col("term")) % 4), "bucket")
    stored = t.read(spark).drop("bucket")

    want = bm25_from_index(postings, doc_stats, ["spark"]).collect()
    got = bm25_from_index(stored, doc_stats, ["spark"]).collect()
    key = lambda r: r["doc_id"]
    assert sorted(want, key=key) == sorted(got, key=key)


def test_bm25_differential_vs_python(spark):
    """Randomized corpus vs an independent pure-Python BM25."""
    import math

    import numpy as np

    rng = np.random.default_rng(31)
    vocab = [f"w{i}" for i in range(30)]
    docs = [(i, " ".join(rng.choice(vocab, rng.integers(3, 40))))
            for i in range(80)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    terms = ["w0", "w7", "w29"]
    got = {r["doc_id"]: r for r in bm25_scores(df, terms).collect()}

    toks = {i: t.split() for i, t in docs}
    dl = {i: len(t) for i, t in toks.items()}
    n = len([i for i in dl if dl[i] > 0])
    avgdl = sum(dl.values()) / n
    dfreq = {t: sum(1 for i in toks if t in toks[i]) for t in terms}
    k1, b = 1.2, 0.75
    for i, t in toks.items():
        contribs = []
        for term in sorted(terms):
            tf = t.count(term)
            if tf == 0:
                continue
            idf = math.log(1 + (n - dfreq[term] + 0.5) / (dfreq[term] + 0.5))
            tfc = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl[i] / avgdl))
            contribs.append(round(idf * tfc, 9))
        if not contribs:
            assert i not in got
            continue
        s = 0.0
        for c in contribs:
            s += c
        r = got[i]
        assert r["score"] == pytest.approx(round(s, 6), abs=2e-6)
        assert r["matched_terms"] == len(contribs)
        assert r["doc_len"] == dl[i]


def test_fused_path_equals_explode_path(spark, monkeypatch):
    # r7 optimization: small queries use the no-shuffle fused path; it
    # must be row- and bit-identical (score included) to the explode +
    # inverted shape it replaced.
    import numpy as np

    import ohsome_planet_spark.operators.bm25 as bm25mod

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(25)]
    rows = [(i, " ".join(rng.choice(vocab, rng.integers(0, 30))))
            for i in range(60)] + [(999, ""), (1000, "   ")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    terms = ["w1", "w5", "w24", "w9"]

    fused = sorted(bm25mod.bm25_scores(df, terms).collect())
    monkeypatch.setattr(bm25mod, "FUSED_TERMS_MAX", -1)
    explode = sorted(bm25mod.bm25_scores(df, terms).collect())
    assert fused == explode
