"""DSIR — Data Selection via Importance Resampling (Xie et al., 2023).

Selects raw-corpus documents that look like a small high-quality TARGET
set (the published recipe behind several modern pretraining mixes): hash
unigram+bigram features into a fixed bucket space, fit bag-of-feature
multinomials over the target and the raw corpus, weight every raw doc by
its log likelihood ratio, and draw k docs by Gumbel-top-k (sampling
without replacement with inclusion odds ∝ exp(weight)).

Spark-first shape, and why it holds at 100 TB:

- The MODEL is two bucket-count aggregates (map-side combined; output is
  `num_buckets` rows each, thousands, never the corpus) collected to a
  plain Python list of rounded log ratios. Like the IVF codebook and the
  fasttext-shaped scorer (`quality_model.py`), the model then rides the
  task binary as an array LITERAL — scoring touches no shuffle, no join,
  and no Python at run time.
- Per-doc WEIGHT is one JVM codegen expression: tokenize, derive bigram
  strings, look each feature's log ratio up in the literal array, and
  SEQUENTIALLY left-fold in document order (`F.aggregate`). Each term is
  pre-rounded to 9 dp (libm `ln` last-ulp doctrine) and the fold order is
  pinned by the document itself, so the weight is bit-identical across
  runs, engines, and cluster sizes.
- RESAMPLING is deterministic Gumbel-top-k: the uniform comes from the
  engine's standard md5-derived 60-bit row hash (`sampling.py`), so the
  same docs are selected on every run; `orderBy(...).limit(k)` compiles
  to TakeOrderedAndProject — per-partition partial top-k, one tiny merge,
  no global sort.

Reference parity note: ohsome-planet has no data-selection stage; this is
part of the training-data-pipeline layer this engine adds (SURVEY §2
addendum), same family as `sampling.py` / `quality_model.py`.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .ngram_lm import _tokens_col  # the ONE tokenizer every
# engine-exact text hash depends on — a private copy here could drift
from .quality_model import token_bucket_col
from .sampling import BUCKETS, hash_bucket_col

DEFAULT_BUCKETS = 2048


def features_col(text_c: Column) -> Column:
    """Hashed-feature strings in DOCUMENT ORDER: unigrams then bigrams.

    Bigrams are space-joined token pairs ("new york"), hashed into the
    SAME bucket space as unigrams (the DSIR paper's construction). The
    order is part of the contract — the weight fold walks this array."""
    toks = _tokens_col(text_c)
    big = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return F.concat(toks, big)


def feature_bucket_counts(
    df: DataFrame,
    num_buckets: int = DEFAULT_BUCKETS,
    text_col: str = "text",
) -> DataFrame:
    """(bucket, n) — integer-exact hashed-feature counts over a corpus.

    One explode → map-side-combined groupBy; output is `num_buckets`
    rows, independent of corpus size."""
    feat = F.explode(features_col(F.col(text_col))).alias("_feat")
    return (
        df.select(feat)
        .select(token_bucket_col(F.col("_feat"), num_buckets).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )


def dsir_log_ratios(
    target: DataFrame,
    raw: DataFrame,
    num_buckets: int = DEFAULT_BUCKETS,
    alpha: float = 1.0,
    text_col: str = "text",
) -> list[float]:
    """The model: per-bucket log((t+α)/(T+αB)) − log((q+α)/(Q+αB)),
    each rounded to 9 dp, as a dense Python list of length num_buckets.

    Two bounded collects (≤ num_buckets rows each — the model, not the
    corpus; same doctrine as the k-means centroid and BPE-argmax
    collects). α is add-α smoothing so unseen buckets are finite."""
    t_counts = {
        r["bucket"]: r["n"]
        for r in feature_bucket_counts(target, num_buckets, text_col).collect()
    }
    q_counts = {
        r["bucket"]: r["n"]
        for r in feature_bucket_counts(raw, num_buckets, text_col).collect()
    }
    return _log_ratios_from_counts(t_counts, q_counts, num_buckets, alpha)


def _log_ratios_from_counts(
    t_counts: dict[int, int],
    q_counts: dict[int, int],
    num_buckets: int,
    alpha: float,
) -> list[float]:
    t_total = sum(t_counts.values()) + alpha * num_buckets
    q_total = sum(q_counts.values()) + alpha * num_buckets
    return [
        round(
            math.log((t_counts.get(b, 0) + alpha) / t_total)
            - math.log((q_counts.get(b, 0) + alpha) / q_total),
            9,
        )
        for b in range(num_buckets)
    ]


def dsir_weight_col(log_ratios: list[float], text_c: Column) -> Column:
    """Per-doc importance weight: sequential document-order fold of each
    feature's (9-dp-rounded) log ratio, final sum rounded to 6 dp. Pure
    JVM codegen — no shuffle, no UDF; an empty doc weighs exactly 0."""
    lr = F.array(*[F.lit(float(x)) for x in log_ratios])
    nb = len(log_ratios)
    per_feat = F.transform(
        features_col(text_c),
        lambda t: F.element_at(lr, (token_bucket_col(t, nb) + 1).cast("int")),
    )
    return F.round(
        F.aggregate(per_feat, F.lit(0.0), lambda acc, x: acc + x), 6
    )


def gumbel_key_col(id_c: Column, weight_c: Column) -> Column:
    """weight + Gumbel(0,1) noise derived from the row-id hash: top-k of
    this key samples without replacement ∝ exp(weight), deterministically
    (retry/speculation/cluster-size safe — the `sampling.py` contract).
    The noise term is rounded to 9 dp (libm ln doctrine); the sum of two
    exact doubles needs no further rounding."""
    u = (hash_bucket_col(id_c) + 1).cast("double") / F.lit(float(BUCKETS + 1))
    return weight_c + F.round(-F.log(-F.log(u)), 9)


def dsir_weights(
    docs: DataFrame,
    log_ratios: list[float],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Adds integer-exact `n_features` and the exact-float `weight` and
    `gkey` (Gumbel-perturbed selection key) to every document."""
    text_c = F.col(text_col)
    w = dsir_weight_col(log_ratios, text_c)
    return (
        docs.withColumn("n_features", F.size(features_col(text_c)).cast("long"))
        .withColumn("weight", w)
        .withColumn("gkey", gumbel_key_col(F.col(id_col), F.col("weight")))
    )


def dsir_resample(
    docs: DataFrame,
    log_ratios: list[float],
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The selected k documents (Gumbel-top-k on the importance weight),
    deterministic ties broken by id. Compiles to TakeOrderedAndProject."""
    return (
        dsir_weights(docs, log_ratios, id_col=id_col, text_col=text_col)
        .orderBy(F.desc("gkey"), F.asc(id_col))
        .limit(k)
    )


def dsir_bucketized(
    docs: DataFrame,
    num_buckets: int = DEFAULT_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
    extra: tuple[Column, ...] = (),
) -> DataFrame:
    """(id, *extra, _buckets: array<int>) — tokenize + md5-bucket every
    feature ONCE. The lightweight proxy frame of the fused DSIR shape
    (optimization-guide §8: decide with small rows): per-feature md5 is
    the dominant cost of DSIR, and the naive shape pays it 2-3× (target
    counts, raw counts, weight fold) plus ~8 re-derivations of the
    tokenizer inside one interpreted HOF projection. Bucket ids are
    identical to ``token_bucket_col`` by construction."""
    b = F.transform(
        features_col(F.col(text_col)),
        lambda t: token_bucket_col(t, num_buckets).cast("int"),
    )
    return docs.select(F.col(id_col), *extra, b.alias("_buckets"))


def dsir_select(
    docs: DataFrame,
    target_pred: Column,
    k: int,
    num_buckets: int = DEFAULT_BUCKETS,
    alpha: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fused DSIR select: bit-identical to
    ``dsir_resample(docs, dsir_log_ratios(docs.where(target_pred), docs,
    num_buckets), k)`` but with ONE tokenize+hash pass instead of three.

    The bucketized proxy frame is persisted (bounded per-slot — see
    cache_util) and feeds both the combined target/raw bucket-count
    aggregate (one scan: target rows flagged by ``target_pred``, never a
    second pass) and the weight fold, which becomes an O(1)
    element_at over ints instead of re-hashing every feature. The fold
    element order (document order) and every rounded value are unchanged,
    so the output is row-identical (pytest-pinned vs the unfused path)."""
    from .cache_util import swap_persist

    bk = dsir_bucketized(
        docs, num_buckets, id_col=id_col, text_col=text_col,
        extra=(target_pred.alias("_is_t"),),
    )
    bk = swap_persist("dsir_select", bk)

    counts = (
        bk.select("_is_t", F.explode("_buckets").alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("qn"),
            F.sum(F.when(F.col("_is_t"), 1).otherwise(0)).alias("tn"),
        )
        .collect()
    )
    t_counts = {r["bucket"]: r["tn"] for r in counts if r["tn"]}
    q_counts = {r["bucket"]: r["qn"] for r in counts}
    ratios = _log_ratios_from_counts(t_counts, q_counts, num_buckets, alpha)

    lr = F.array(*[F.lit(float(x)) for x in ratios])
    per = F.transform(
        F.col("_buckets"), lambda bkt: F.element_at(lr, bkt + F.lit(1))
    )
    return (
        bk.select(
            F.col(id_col),
            F.size("_buckets").cast("long").alias("n_features"),
            F.round(
                F.aggregate(per, F.lit(0.0), lambda acc, x: acc + x), 6
            ).alias("weight"),
        )
        .withColumn("gkey", gumbel_key_col(F.col(id_col), F.col("weight")))
        .orderBy(F.desc("gkey"), F.asc(id_col))
        .limit(k)
    )
