"""Vocabulary + OOV-fraction operator (the integer-exact perplexity
stand-in)."""

from __future__ import annotations

from ohsome_planet_spark.operators.vocab import vocabulary_df, with_oov_fraction


def test_oov_scores_and_determinism(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the log"),
        (3, "zzq qxj vvw"),                 # pure gibberish → 1.0
        (4, "the cat zzq"),                  # 1/3 OOV
        (5, ""),                             # no words → 0.0
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    vocab = vocabulary_df(docs.where("doc_id <= 2"), top_k=100)
    vwords = {r["word"] for r in vocab.collect()}
    assert "the" in vwords and "zzq" not in vwords
    # rank 1 must be the most frequent word, ties broken by word asc
    top = vocab.orderBy("rank").first()
    assert top["word"] == "the" and top["rank"] == 1

    out = {r["doc_id"]: r for r in with_oov_fraction(docs, vocab).collect()}
    assert out[1]["oov_fraction"] == 0.0
    assert out[3]["oov_fraction"] == 1.0 and out[3]["n_oov"] == 3
    assert out[4]["n_word_occurrences"] == 3 and out[4]["n_oov"] == 1
    assert out[5]["n_word_occurrences"] == 0 and out[5]["oov_fraction"] == 0.0

    # top-k boundary determinism: equal-count words rank by word asc
    v2 = vocabulary_df(docs, top_k=3).orderBy("rank").collect()
    v2b = vocabulary_df(docs, top_k=3).orderBy("rank").collect()
    assert [r["word"] for r in v2] == [r["word"] for r in v2b]
    counts = [r["n_occurrences"] for r in v2]
    assert counts == sorted(counts, reverse=True)
