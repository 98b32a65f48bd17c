"""SemDeDup semantic dedup (operators/dedup.semdedup): kmeans clusters,
then within-cluster cosine vs a lower-id member flags duplicates."""

import numpy as np
import pytest

from ohsome_planet_spark.operators.dedup import semdedup
from tests.test_kmeans import _numpy_lloyd


@pytest.fixture(scope="module")
def dup_blobs(spark):
    """Two tight blobs (internal cosines near 1) plus near-orthogonal
    singleton directions that cluster with a blob but never pass 0.9."""
    rng = np.random.default_rng(11)
    base = rng.uniform(0.5, 1.0, (2, 12))
    rows = []
    for i in range(40):
        v = base[i % 2] + rng.normal(0, 0.01, 12)  # near-dups of a blob
        rows.append(v)
    for i in range(8):  # lone directions: one-hot-ish, far from everything
        v = np.full(12, 0.01)
        v[i] = 5.0 + i
        rows.append(v)
    X = np.asarray(rows, dtype=np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<float>")
    return X, df


def _numpy_semdedup(X, k, iterations, tau):
    assign, _, _ = _numpy_lloyd(X, k, iterations)
    Xd = X.astype(np.float64)
    is_dup = np.zeros(len(X), np.int64)
    for i in range(len(X)):
        for j in range(i):
            if assign[i] != assign[j]:
                continue
            dot = float(Xd[i] @ Xd[j])
            cos = dot / (np.sqrt(Xd[i] @ Xd[i]) * np.sqrt(Xd[j] @ Xd[j]))
            if cos >= tau:
                is_dup[i] = 1
                break
    return assign, is_dup


def test_semdedup_matches_numpy_replay(dup_blobs):
    X, df = dup_blobs
    got = {r["vec_id"]: (r["cluster"], r["is_dup"])
           for r in semdedup(df, k=3, iterations=2, threshold=0.9).collect()}
    assign, is_dup = _numpy_semdedup(X, 3, 2, 0.9)
    assert len(got) == len(X)
    for i in range(len(X)):
        assert got[i] == (int(assign[i]), int(is_dup[i])), i


def test_semdedup_min_id_survives_per_cluster(dup_blobs):
    """Within every cluster the smallest id is never flagged (id-greedy:
    a dup needs a LOWER-id neighbor)."""
    X, df = dup_blobs
    rows = semdedup(df, k=3, iterations=2, threshold=0.9).collect()
    min_id = {}
    for r in rows:
        c = r["cluster"]
        if c not in min_id or r["vec_id"] < min_id[c][0]:
            min_id[c] = (r["vec_id"], r["is_dup"])
    assert all(flag == 0 for _, flag in min_id.values())


def test_semdedup_blob_members_collapse(dup_blobs):
    """Each tight blob keeps exactly one survivor; lone directions all
    survive."""
    X, df = dup_blobs
    rows = {r["vec_id"]: r["is_dup"]
            for r in semdedup(df, k=3, iterations=2, threshold=0.9).collect()}
    assign, _ = _numpy_semdedup(X, 3, 2, 0.9)
    # blob rows 0..39: survivors = one per (blob, cluster) pair
    blob_survivors = [i for i in range(40) if rows[i] == 0]
    seen = set()
    for i in blob_survivors:
        key = (i % 2, assign[i])
        assert key not in seen, f"two survivors in blob-cluster {key}"
        seen.add(key)
    # lone directions (ids 40..47) never hit cosine 0.9
    assert all(rows[i] == 0 for i in range(40, 48))


def test_semdedup_deterministic_across_partitioning(dup_blobs):
    _, df = dup_blobs
    a = sorted(map(tuple, semdedup(df, k=3, iterations=2, threshold=0.9).collect()))
    b = sorted(map(tuple,
                   semdedup(df.repartition(7), k=3, iterations=2,
                            threshold=0.9).collect()))
    assert a == b
