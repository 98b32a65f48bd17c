"""DSIR importance resampling (operators/dsir.py)."""

import pytest
from pyspark.sql import functions as F

from ohsome_planet_spark.operators.dsir import (
    DEFAULT_BUCKETS,
    dsir_log_ratios,
    dsir_resample,
    dsir_weights,
    feature_bucket_counts,
)

TARGET = [
    (1, "the solar telescope observed a distant quasar last night"),
    (2, "astronomers measured the quasar redshift with the telescope"),
    (3, "a new telescope survey maps galaxies and measures redshift"),
]
RAW = [
    (10, "the solar telescope observed the quasar again"),
    (11, "astronomers measured redshift across the galaxy survey"),
    (12, "buy cheap watches now best price free shipping"),
    (13, "click here to win a free prize now"),
    (14, "the quasar survey telescope measures distant galaxies"),
    (15, ""),
    (16, "buy buy buy cheap cheap offer"),
]


@pytest.fixture(scope="module")
def frames(spark):
    t = spark.createDataFrame(TARGET, ["doc_id", "text"])
    r = spark.createDataFrame(RAW, ["doc_id", "text"])
    return t, r


@pytest.fixture(scope="module")
def ratios(frames):
    t, r = frames
    return dsir_log_ratios(t, r, num_buckets=512)


def test_model_shape_and_determinism(frames):
    t, r = frames
    a = dsir_log_ratios(t, r, num_buckets=512)
    b = dsir_log_ratios(t, r, num_buckets=512)
    assert len(a) == 512
    assert a == b  # bit-identical across runs


def test_feature_counts_include_bigrams(spark, frames):
    t, _ = frames
    total = (
        feature_bucket_counts(t, num_buckets=64)
        .agg(F.sum("n").alias("s")).first()["s"]
    )
    # 3 docs x (n tokens + n-1 bigrams) = sum(2*len-1)
    n_tok = sum(len(txt.split()) for _, txt in TARGET)
    assert total == 2 * n_tok - len(TARGET)


def test_target_like_docs_outweigh_spam(frames, ratios):
    _, r = frames
    w = {
        row["doc_id"]: row["weight"]
        for row in dsir_weights(r, ratios).collect()
    }
    # every on-topic doc beats every spam doc
    assert min(w[10], w[11], w[14]) > max(w[12], w[13], w[16])
    assert w[15] == 0.0  # empty doc folds to exactly 0


def test_weight_matches_python_replay(spark, ratios):
    # replay the exact contract in plain python: md5-bucket each feature
    # (unigrams then bigrams, document order), left-fold the 9-dp log
    # ratios, round to 6 — must equal the JVM fold bit for bit
    import hashlib

    text = "solar quasar telescope"
    toks = text.split()
    feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    acc = 0.0
    for f_ in feats:
        b = int(hashlib.md5(f_.encode()).hexdigest()[:15], 16) % len(ratios)
        acc += ratios[b]
    expected = round(acc, 6)
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    got = dsir_weights(df, ratios).first()
    assert got["weight"] == expected
    assert got["n_features"] == len(feats)


def test_resample_deterministic_topk(frames, ratios):
    _, r = frames
    k = 3
    a = [row["doc_id"] for row in dsir_resample(r, ratios, k).collect()]
    b = [row["doc_id"] for row in dsir_resample(r, ratios, k).collect()]
    assert a == b and len(a) == k
    # selection keys are gumbel-perturbed weights: the picked set must be
    # the k largest gkeys overall
    allw = dsir_weights(r, ratios).collect()
    top = sorted(allw, key=lambda x: (-x["gkey"], x["doc_id"]))[:k]
    assert a == [x["doc_id"] for x in top]


def test_default_bucket_count_sane():
    assert DEFAULT_BUCKETS >= 1024


def test_fused_select_matches_unfused(spark):
    # r7 optimization: dsir_select fuses the target/raw count passes and
    # the weight fold over ONE persisted bucket proxy — it must be
    # row-identical (ids, n_features, weight, gkey) to the unfused
    # dsir_log_ratios + dsir_resample composition it replaced.
    from ohsome_planet_spark.operators.dsir import dsir_select

    docs = spark.createDataFrame(
        [(i, t) for i, (_, t) in enumerate(TARGET + RAW)]
        + [(99, "telescope telescope quasar")],
        ["doc_id", "text"],
    )
    pred = F.col("doc_id") % 3 == 0
    fused = sorted(
        dsir_select(docs, pred, k=5, num_buckets=512).collect()
    )
    lr = dsir_log_ratios(docs.where(pred), docs, num_buckets=512)
    unfused = sorted(
        dsir_resample(docs, lr, 5)
        .select("doc_id", "n_features", "weight", "gkey")
        .collect()
    )
    assert fused == unfused
