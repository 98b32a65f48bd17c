"""Perceptual image hashing + near-dup pairs (operators/multimodal.py)."""

import numpy as np
import pytest

from ohsome_planet_spark.operators.multimodal import (
    image_near_dups,
    phash64,
    phash_df,
    resize_nearest,
)


def _gradient(h, w, tilt=1.0):
    y, x = np.mgrid[0:h, 0:w]
    return ((x * tilt + y) / (w + h) * 255).astype(np.uint8)


def test_phash_invariance_and_discrimination():
    base = _gradient(64, 64)
    h0 = phash64(base)
    # resize invariance: same image at 2x resolution
    big = resize_nearest(base, 128, 128)
    assert bin(h0 ^ phash64(big)).count("1") <= 4
    # brightness scaling invariance (linear scale keeps DCT sign structure)
    dim = (base.astype(np.float64) * 0.5).astype(np.uint8)
    assert bin(h0 ^ phash64(dim)).count("1") <= 6
    # a very different image is far away
    rng = np.random.default_rng(9)
    noise = rng.integers(0, 256, (64, 64)).astype(np.uint8)
    assert bin(h0 ^ phash64(noise)).count("1") > 16


def test_phash_df_and_near_dups(spark):
    rng = np.random.default_rng(2)
    rows = []
    # 5 groups of 3 near-identical images (same base, resized/dimmed)
    for g in range(5):
        base = rng.integers(0, 256, (32, 32)).astype(np.uint8)
        # smooth it so low-frequency structure dominates
        base = (base.astype(np.float64) + 3 * _gradient(32, 32, g + 1)) / 4
        base = base.astype(np.uint8)
        variants = [
            base,
            resize_nearest(base, 64, 64),
            (base.astype(np.float64) * 0.7).astype(np.uint8),
        ]
        for v, img in enumerate(variants):
            rows.append((g * 10 + v, "raw_gray", img.tobytes(),
                         img.shape[1], img.shape[0]))
    media = spark.createDataFrame(
        rows, "media_id long, format string, content binary, "
              "width int, height int")
    hashes = phash_df(media)
    assert hashes.count() == 15

    pairs = image_near_dups(hashes, max_hamming=10)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # every within-group pair found, no cross-group pair
    for g in range(5):
        ids = [g * 10 + v for v in range(3)]
        for i in range(3):
            for j in range(i + 1, 3):
                assert (ids[i], ids[j]) in got, (g, i, j)
    assert all(a // 10 == b // 10 for a, b in got)


def test_near_dups_plan_no_cross_product(spark):
    df = spark.createDataFrame([(1, 5), (2, 7)], "media_id long, phash long")
    plan = image_near_dups(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
