"""Deterministic Bloom filter (operators/bloom.py)."""

import pytest
from pyspark.sql import functions as F

from ohsome_planet_spark.operators.bloom import (
    bloom_build,
    bloom_filter_seen,
    bloom_positions_col,
    bloom_probe_col,
)


@pytest.fixture(scope="module")
def keys(spark):
    return spark.createDataFrame(
        [(i, f"url-{i}") for i in range(300)], "id long, url string")


def test_no_false_negatives(spark, keys):
    members = keys.where("id % 2 = 0")
    words = bloom_build(members, "url", m_bits=4096, k=3)
    probed = keys.withColumn(
        "hit", bloom_probe_col(words, F.col("url"), 4096, 3))
    rows = probed.collect()
    assert all(r["hit"] for r in rows if r["id"] % 2 == 0)
    # with 150 members in 4096 bits some non-members must miss
    assert any(not r["hit"] for r in rows if r["id"] % 2 == 1)


def test_deterministic_rebuild(spark, keys):
    a = bloom_build(keys, "url", m_bits=2048, k=5)
    b = bloom_build(keys.repartition(7), "url", m_bits=2048, k=5)
    assert a == b  # bit-identical regardless of partitioning


def test_positions_match_python_replay(spark):
    import hashlib

    df = spark.createDataFrame([("abc",)], "k string")
    got = df.select(
        bloom_positions_col(F.col("k"), 1024, 4).alias("p")).first()["p"]
    h1 = int(hashlib.md5(b"a:abc").hexdigest()[:15], 16)
    h2 = int(hashlib.md5(b"b:abc").hexdigest()[:15], 16)
    assert got == [(h1 + j * h2) % 1024 for j in range(4)]


def test_filter_seen_directions(spark, keys):
    seen = keys.where("id < 100")
    unseen = bloom_filter_seen(keys, seen, "url", m_bits=1 << 14, k=4)
    ids = {r["id"] for r in unseen.collect()}
    assert not (ids & set(range(100)))         # every member dropped
    assert len(ids) > 150                      # most non-members survive
    kept = bloom_filter_seen(keys, seen, "url", m_bits=1 << 14, k=4,
                             keep="seen")
    assert set(range(100)) <= {r["id"] for r in kept.collect()}


def test_param_validation(spark, keys):
    with pytest.raises(ValueError):
        bloom_build(keys, "url", m_bits=100, k=3)   # not multiple of 64
    with pytest.raises(ValueError):
        bloom_build(keys, "url", m_bits=1024, k=8)  # k > MAX_K
    with pytest.raises(ValueError):
        bloom_probe_col([0] * 3, F.col("url"), 1024, 3)  # wrong length
