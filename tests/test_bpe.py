"""Distributed BPE training (operators/bpe.py) — checked against the
textbook Sennrich example and an independent pure-Python trainer."""

import pytest

from ohsome_planet_spark.operators.bpe import train_bpe, word_counts


def _python_bpe(word_freqs, num_merges):
    """Independent reference: list-based greedy BPE (Sennrich Fig. 1
    style, no string tricks)."""
    vocab = {tuple(w): n for w, n in word_freqs.items()}
    merges = []
    for _ in range(num_merges):
        pairs = {}
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] = \
                    pairs.get((syms[i], syms[i + 1]), 0) + n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), c = best
        merges.append((l, r, c))
        new_vocab = {}
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges, vocab


def test_sennrich_textbook_example(spark):
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    words = spark.createDataFrame(list(freqs.items()), "word string, n long")
    merges, seg = train_bpe(words, num_merges=4)
    want_merges, _ = _python_bpe(freqs, 4)
    assert merges == want_merges
    # the famous first merges: ('e','s') then ('es','t')
    assert merges[0][:2] == ("e", "s") and merges[1][:2] == ("es", "t")
    got = {r["word"]: r["syms"].split() for r in seg.collect()}
    assert got["newest"] == ["n", "e", "w", "est"]


def test_repeated_pair_runs_match_reference(spark):
    """The shared-sentinel-space case: runs of the same pair must merge
    left-to-right greedily, like the list-based reference."""
    freqs = {"aaaa": 3, "ababab": 2, "aab": 1}
    words = spark.createDataFrame(list(freqs.items()), "word string, n long")
    merges, seg = train_bpe(words, num_merges=3)
    want_merges, want_vocab = _python_bpe(freqs, 3)
    assert merges == want_merges
    got = {r["word"]: tuple(r["syms"].split()) for r in seg.collect()}
    # replay the reference's merges per word for the segmentation check
    vocab = {w: tuple(w) for w in freqs}
    for l, r, _ in want_merges:
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = tuple(out)
    assert got == vocab


def test_word_counts_and_corpus_training(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text").limit(200)
    words = word_counts(docs)
    merges, seg = train_bpe(words, num_merges=5)
    assert len(merges) == 5
    # counts non-increasing (BPE invariant on a fixed vocab... counts can
    # fluctuate slightly after merges, but the FIRST is the global max)
    assert merges[0][2] == max(m[2] for m in merges)
    # determinism across repartitioning
    merges2, _ = train_bpe(words.repartition(7), num_merges=5)
    assert merges2 == merges


def test_apply_bpe_tokens_col(spark):
    from pyspark.sql import functions as F

    from ohsome_planet_spark.operators.bpe import apply_bpe_tokens_col

    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    words = spark.createDataFrame(list(freqs.items()), "word string, n long")
    merges, _ = train_bpe(words, num_merges=4)

    probe = spark.createDataFrame(
        [(1, "newest widest"), (2, "low lowest"), (3, "")],
        "doc_id long, text string")
    out = {r["doc_id"]: r["n"] for r in probe.select(
        "doc_id",
        apply_bpe_tokens_col(F.col("text"), merges).alias("n")).collect()}

    # replay with the reference segmenter
    def seg(word):
        syms = list(word)
        for l, r, _ in merges:
            out_s, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == l and syms[i + 1] == r:
                    out_s.append(l + r)
                    i += 2
                else:
                    out_s.append(syms[i])
                    i += 1
            syms = out_s
        return syms

    assert out[1] == len(seg("newest")) + len(seg("widest"))
    assert out[2] == len(seg("low")) + len(seg("lowest"))  # OOV word ok
    assert out[3] == 0


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_bpe_random_sweep_vs_reference(spark, seed):
    import numpy as np

    rng = np.random.default_rng(seed)
    alphabet = list("abcdef")
    freqs = {}
    for _ in range(25):
        w = "".join(rng.choice(alphabet, rng.integers(2, 9)))
        freqs[w] = freqs.get(w, 0) + int(rng.integers(1, 20))
    words = spark.createDataFrame(list(freqs.items()), "word string, n long")
    merges, seg = train_bpe(words, num_merges=6)
    want_merges, _ = _python_bpe(freqs, 6)
    assert merges == want_merges

    vocab = {w: tuple(w) for w in freqs}
    for l, r, _ in want_merges:
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = tuple(out)
    got = {r["word"]: tuple(r["syms"].split()) for r in seg.collect()}
    assert got == vocab
