"""pack_sequences: GPT-style concat-and-chunk into fixed-token sequences,
computed with the two-phase distributed prefix sum (never a one-partition
global window)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ohsome_planet_spark.operators.packing import pack_sequences


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_hand_case(spark):
    # capacity 10; docs: 4, 9, 10, 3 tokens → stream cuts at 10, 20
    d = spark.createDataFrame(
        [(1, 4), (2, 9), (3, 10), (4, 3)], "doc_id long, n_tokens long")
    out = _rows(pack_sequences(d, capacity=10))
    assert out == [
        (0, 1, 4, 0),    # doc1 [0,4)
        (0, 2, 6, 4),    # doc2 [4,13): 6 tokens in seq0 ...
        (1, 2, 3, 0),    # ... 3 in seq1
        (1, 3, 7, 3),    # doc3 [13,23): 7 in seq1 ...
        (2, 3, 3, 0),    # ... 3 in seq2
        (2, 4, 3, 3),    # doc4 [23,26)
    ]


def test_exact_boundary_and_multi_seq_doc(spark):
    # a doc ending exactly at a cut emits no zero-token row; a doc longer
    # than capacity spans several full sequences
    d = spark.createDataFrame(
        [(1, 10), (2, 25)], "doc_id long, n_tokens long")
    out = _rows(pack_sequences(d, capacity=10))
    assert out == [
        (0, 1, 10, 0),
        (1, 2, 10, 0), (2, 2, 10, 0), (3, 2, 5, 0),
    ]


def test_zero_token_docs_and_conservation(spark):
    d = spark.createDataFrame(
        [(i, (i * 7) % 13) for i in range(200)], "doc_id long, n_tokens long")
    out = pack_sequences(d, capacity=32)
    assert out.where(F.col("tokens_in_seq") <= 0).count() == 0
    total = out.agg(F.sum("tokens_in_seq")).first()[0]
    want = d.where(F.col("n_tokens") > 0).agg(F.sum("n_tokens")).first()[0]
    assert total == want  # every token lands in exactly one sequence
    # every sequence except the last is exactly full
    per_seq = out.groupBy("seq_id").agg(F.sum("tokens_in_seq").alias("t"))
    last = per_seq.agg(F.max("seq_id")).first()[0]
    assert per_seq.where(
        (F.col("seq_id") != last) & (F.col("t") != 32)).count() == 0


def test_partitioning_invariance(spark):
    d = spark.createDataFrame(
        [(i, 1 + (i * 11) % 40) for i in range(500)],
        "doc_id long, n_tokens long")
    a = _rows(pack_sequences(d, capacity=64, num_partitions=1))
    b = _rows(pack_sequences(d.repartition(13), capacity=64,
                             num_partitions=7))
    assert a == b


def test_capacity_guard(spark):
    d = spark.createDataFrame([(1, 1)], "doc_id long, n_tokens long")
    with pytest.raises(ValueError, match="capacity"):
        pack_sequences(d, capacity=0)
