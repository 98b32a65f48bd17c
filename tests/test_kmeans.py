"""Deterministic distributed k-means (operators/kmeans.py)."""

import numpy as np
import pytest

from ohsome_planet_spark.operators.kmeans import kmeans


def _numpy_lloyd(X, k, iterations):
    """Replay the operator's exact arithmetic: init = first k rows,
    distances as in-order folds, id-sorted member folds for the update."""
    C = X[:k].astype(np.float64).copy()
    assign = None
    for _ in range(iterations):
        assign = np.empty(len(X), np.int64)
        dists = np.empty(len(X))
        for i, v in enumerate(X):
            best, bd = -1, None
            for c in range(k):
                d = 0.0
                for j in range(X.shape[1]):
                    t = float(v[j]) - C[c][j]
                    d += t * t
                if bd is None or d < bd:
                    best, bd = c, d
            assign[i], dists[i] = best, bd
        for c in range(k):
            members = np.where(assign == c)[0]  # already id-sorted
            if len(members) == 0:
                continue
            for j in range(X.shape[1]):
                s = 0.0
                for i in members:
                    s += float(X[i][j])
                C[c][j] = s / len(members)
    return assign, dists, C


@pytest.fixture(scope="module")
def blobs(spark):
    rng = np.random.default_rng(5)
    centers = rng.uniform(-10, 10, (4, 8))
    X = np.vstack([
        (centers[i % 4] + rng.normal(0, 0.3, 8)).astype(np.float32)
        for i in range(120)
    ])
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(120)],
        "vec_id long, embedding array<float>")
    return X, df


def test_kmeans_matches_exact_replay(blobs):
    X, df = blobs
    a_df, c_df = kmeans(df, k=4, iterations=2)
    got_a = {r["vec_id"]: (r["cluster"], r["dist"]) for r in a_df.collect()}
    got_c = {r["cluster"]: r["centroid"] for r in c_df.collect()}

    assign, dists, C = _numpy_lloyd(X, 4, 2)
    for i in range(120):
        assert got_a[i][0] == assign[i]
        assert got_a[i][1] == pytest.approx(round(dists[i], 9), abs=1e-9)
    for c in range(4):
        np.testing.assert_allclose(got_c[c], C[c], rtol=0, atol=0)


def test_kmeans_clusters_blobs(blobs):
    """Points generated from the same blob must co-cluster."""
    X, df = blobs
    a_df, _ = kmeans(df, k=4, iterations=3)
    by_blob = {}
    for r in a_df.collect():
        by_blob.setdefault(r["vec_id"] % 4, set()).add(r["cluster"])
    # each generating blob maps to exactly one learned cluster
    assert all(len(s) == 1 for s in by_blob.values())
    assert len(set.union(*by_blob.values())) == 4


def test_kmeans_deterministic_across_runs(blobs):
    _, df = blobs
    a1, c1 = kmeans(df, k=4, iterations=2)
    a2, c2 = kmeans(df.repartition(7), k=4, iterations=2)
    assert sorted(map(tuple, a1.collect())) == sorted(map(tuple, a2.collect()))
    assert sorted(map(tuple, c1.collect())) == sorted(map(tuple, c2.collect()))


@pytest.mark.parametrize("k,iters", [(2, 1), (3, 3), (7, 2)])
def test_kmeans_k_sweep_exact(spark, blobs, k, iters):
    X, df = blobs
    a_df, c_df = kmeans(df, k=k, iterations=iters)
    assign, dists, C = _numpy_lloyd(X, k, iters)
    got_a = {r["vec_id"]: r["cluster"] for r in a_df.collect()}
    assert got_a == {i: int(assign[i]) for i in range(len(X))}
    got_c = {r["cluster"]: r["centroid"] for r in c_df.collect()}
    for c in range(k):
        np.testing.assert_allclose(got_c[c], C[c], rtol=0, atol=0)
