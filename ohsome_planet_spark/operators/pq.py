"""Product Quantization ANN (Jégou et al. 2011) — encode + ADC search.

The third ANN engine beside the LSH (`similarity.ann_topk`) and IVF
(`similarity.ivf_topk`) paths, and the one that changes the MEMORY
story: a d-dim float vector becomes m small codes (m bytes at
k_codes ≤ 256), so a 10¹²-vector index fits where raw vectors cannot,
and distance evaluation never touches the original vectors again
(asymmetric distance computation — ADC — against per-query lookup
tables).

Spark-first shape, all engine-exact:

- CODEBOOKS are trained per subspace with the engine's bit-exact
  distributed Lloyd's (`operators/kmeans` — a bounded driver loop over
  m subspaces), or arrive frozen from an offline trainer (the
  production/oracle path, like `ivf_topk`'s fixed quantizer).
- ENCODE is pure JVM codegen: per subspace, squared distances to the
  k_codes literal centroids (each a 9-dp-rounded dimension-order fold)
  and a FIRST-minimum argmin (`array_position` of the min — the stable
  tie-break every engine reproduces). No Python, no shuffle.
- ADC SEARCH computes each query's m×k_codes distance table ONCE as a
  projection, then scores every candidate with m array lookups + a
  fixed-order sum, rounded to 9 dp; ranking is the usual
  (distance asc, id asc) window. Per-pair cost is O(m), independent of
  d — the PQ speedup. Brute-force over codes here; at index scale,
  bound the candidate set first with `ivf_topk`-style inverted lists
  (codes ride the list join instead of vectors).

Reference parity: ohsome-planet has no vector search; this completes
the graft's ANN family (SURVEY §2 addendum).
"""

from __future__ import annotations

import numpy as np
import pandas as pd  # noqa: F401  (module-level: pandas_udf hint strings)
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .similarity import _to_double


def pq_train_kmeans(
    vectors: DataFrame,
    m: int = 4,
    k_codes: int = 16,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> np.ndarray:
    """(m, k_codes, d/m) codebooks via the bit-exact distributed Lloyd's
    per subspace — a bounded driver loop (m is small); only m×k_codes
    centroids come to the driver."""
    from .kmeans import kmeans as _kmeans

    if dim is None:
        dim = len(vectors.select(vec_col).first()[0])
    if dim % m != 0:
        raise ValueError("m must divide the vector dimension")
    sub = dim // m
    books = []
    for i in range(m):
        sl = vectors.select(
            F.col(id_col).alias("vec_id"),
            F.slice(_to_double(F.col(vec_col)), i * sub + 1, sub)
            .alias("embedding"),
        )
        _, cent = _kmeans(sl, k=k_codes, iterations=iterations)
        rows = sorted(cent.collect(), key=lambda r: r["cluster"])
        books.append(np.stack(
            [np.asarray(r["centroid"], np.float64) for r in rows]))
    return np.stack(books)


def _sub_sqdist(sub_slice: Column, centroid: np.ndarray) -> Column:
    """9-dp-rounded squared distance between a subvector slice and one
    literal centroid — dimension-order fold, engine-exact."""
    cen = F.array(*[F.lit(float(x)) for x in centroid])
    return F.round(
        F.aggregate(
            F.zip_with(sub_slice, cen, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0), lambda acc, x: acc + x,
        ),
        9,
    )


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "codes",
) -> DataFrame:
    """Adds `codes`: array<int> of length m — per subspace, the FIRST
    index (1-based) achieving the minimal rounded distance. Pure JVM."""
    mm, kk, sub = codebooks.shape
    v = _to_double(F.col(vec_col))
    code_cols = []
    for i in range(mm):
        sl = F.slice(v, i * sub + 1, sub)
        dists = F.array(*[_sub_sqdist(sl, codebooks[i][j])
                          for j in range(kk)])
        code_cols.append(
            F.array_position(dists, F.array_min(dists)).cast("int"))
    return df.withColumn(out_col, F.array(*code_cols))


def pq_topk(
    queries: DataFrame,
    codes: DataFrame,
    codebooks: np.ndarray,
    k: int = 5,
    query_id: str = "query_id",
    cand_id: str = "cand_id",
    vec_col: str = "embedding",
    codes_col: str = "codes",
) -> DataFrame:
    """(query_id, cand_id, adc_dist, rank): top-k candidates per query by
    asymmetric PQ distance. `codes` carries (cand_id, codes) — the
    compressed index; original candidate vectors are never read."""
    mm, kk, sub = codebooks.shape
    qv = _to_double(F.col(vec_col))
    # per-query lookup tables: m arrays of k_codes rounded distances,
    # computed once per query row in a projection
    tables = F.array(*[
        F.array(*[_sub_sqdist(F.slice(qv, i * sub + 1, sub),
                              codebooks[i][j]) for j in range(kk)])
        for i in range(mm)
    ])
    q = queries.select(F.col(query_id), tables.alias("_t"))

    from ohsome_planet_spark.session import kernel_partitions

    q = q.repartition(kernel_partitions(queries.sparkSession))
    c = codes.select(F.col(cand_id), F.col(codes_col).alias("_c"))
    pairs = q.crossJoin(c).where(F.col(query_id) != F.col(cand_id))
    # ADC: Σ_m table[m][code_m] — m lookups + a fixed-order sum
    adc = F.round(
        F.aggregate(
            F.zip_with(
                F.col("_t"), F.col("_c"),
                lambda t, cd: F.element_at(t, cd),
            ),
            F.lit(0.0), lambda acc, x: acc + x,
        ),
        9,
    )
    w = Window.partitionBy(query_id).orderBy(
        F.asc("adc_dist"), F.asc(cand_id))
    return (
        pairs.select(query_id, cand_id, adc.alias("adc_dist"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def pq_recall_vs_exact(
    spark,
    emb: DataFrame,
    codebooks: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> float:
    """Diagnostic: fraction of exact-L2 top-k recovered through the
    compressed codes (the PQ twin of ann_recall_vs_exact)."""
    q = emb.where(F.col(id_col) % 100 == 0).select(
        F.col(id_col).alias("query_id"), vec_col)
    codes = pq_encode(
        emb.select(F.col(id_col).alias("cand_id"), vec_col), codebooks)
    got = pq_topk(q, codes.select("cand_id", "codes"), codebooks, k=k)

    cand = emb.select(F.col(id_col).alias("cand_id"),
                      _to_double(F.col(vec_col)).alias("cv"))
    qq = q.select("query_id", _to_double(F.col(vec_col)).alias("qv"))
    d2 = F.round(
        F.aggregate(
            F.zip_with("qv", "cv", lambda a, b: (a - b) * (a - b)),
            F.lit(0.0), lambda acc, x: acc + x,
        ),
        9,
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("cand_id"))
    exact = (
        qq.crossJoin(cand).where(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id", d2.alias("d2"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
    g = {(r["query_id"], r["cand_id"]) for r in got.collect()}
    e = {(r["query_id"], r["cand_id"]) for r in exact.collect()}
    return len(g & e) / max(1, len(e))
