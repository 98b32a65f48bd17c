"""Product quantization (operators/pq.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ohsome_planet_spark.operators.pq import (
    pq_encode,
    pq_recall_vs_exact,
    pq_topk,
    pq_train_kmeans,
)


def _frozen_books(m=4, k=8, sub=4, seed=3):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((m, k, sub)).round(3)


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(11)
    # 3 well-separated clusters in 16-d so PQ recall is meaningful
    centers = rng.standard_normal((3, 16)) * 5
    rows = []
    for i in range(90):
        v = centers[i % 3] + rng.standard_normal(16) * 0.3
        rows.append((i, [float(x) for x in v.round(4)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_encode_matches_numpy_replay(spark, emb):
    books = _frozen_books()
    got = {r["vec_id"]: r["codes"]
           for r in pq_encode(
               emb.select(F.col("vec_id"), "embedding"), books).collect()}
    for r in emb.collect():
        v = np.asarray(r["embedding"])
        want = []
        for i in range(4):
            sl = v[i * 4:(i + 1) * 4]
            d = np.round(((books[i] - sl) ** 2).sum(axis=1), 9)
            # rounded fold vs np.sum can differ in the last ulp, but the
            # 3-dp codebooks + 4-dp vectors keep sums far from ties here
            want.append(int(np.argmin(d)) + 1)
        assert got[r["vec_id"]] == want


def test_trained_codebooks_shape_and_determinism(spark, emb):
    a = pq_train_kmeans(emb, m=4, k_codes=4, iterations=2)
    b = pq_train_kmeans(emb.repartition(5), m=4, k_codes=4, iterations=2)
    assert a.shape == (4, 4, 4)
    assert np.array_equal(a, b)  # bit-exact Lloyd's, partition-invariant


def test_adc_matches_replay_and_ranks(spark, emb):
    books = _frozen_books()
    q = emb.where("vec_id < 3").select(
        F.col("vec_id").alias("query_id"), "embedding")
    codes = pq_encode(
        emb.select(F.col("vec_id").alias("cand_id"), "embedding"), books)
    out = pq_topk(q, codes.select("cand_id", "codes"), books, k=4)
    rows = out.collect()
    assert {r["query_id"] for r in rows} == {0, 1, 2}
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    code_map = {r["cand_id"]: r["codes"] for r in codes.collect()}
    for qid, rs in by_q.items():
        assert [r["rank"] for r in sorted(rs, key=lambda x: x["rank"])] \
            == [1, 2, 3, 4]
        qv = np.asarray(
            emb.where(F.col("vec_id") == qid).first()["embedding"])
        for r in rs:
            want = 0.0
            for i in range(4):
                sl = qv[i * 4:(i + 1) * 4]
                d = round(float(((books[i][code_map[r["cand_id"]][i] - 1]
                                  - sl) ** 2).sum()), 9)
                want += d
            assert r["adc_dist"] == pytest.approx(round(want, 9), abs=1e-9)


def test_cluster_structure_survives_compression(spark, emb):
    # within a tight cluster all members are near-equidistant, so
    # exact-NEIGHBOR recall after quantization is legitimately near
    # random — the meaningful property is that every retrieved
    # candidate comes from the query's cluster (class purity)
    books = pq_train_kmeans(emb, m=4, k_codes=8, iterations=2)
    q = emb.where("vec_id < 3").select(
        F.col("vec_id").alias("query_id"), "embedding")
    codes = pq_encode(
        emb.select(F.col("vec_id").alias("cand_id"), "embedding"), books)
    out = pq_topk(q, codes.select("cand_id", "codes"), books, k=5)
    for r in out.collect():
        assert r["cand_id"] % 3 == r["query_id"] % 3
    rec = pq_recall_vs_exact(spark, emb, books, k=3)
    assert 0.0 <= rec <= 1.0  # diagnostic stays well-formed
