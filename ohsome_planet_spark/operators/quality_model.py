"""Hashed linear text classifier — the fasttext-shaped quality scorer.

Real curation pipelines (CCNet, C4 descendants) score documents with a
trained linear model over hashed bag-of-words features and keep/weight by
the score. This operator is that inference stage, Spark-first:

- tokens hash to `num_buckets` via the engine's standard md5-derived
  60-bit integer (the same expression every oracle replays in DuckDB);
- the score is bias + a SEQUENTIAL left fold of the per-token weights in
  document order (F.aggregate — the exact-float discipline used across
  this engine: a left fold of doubles is bit-identical in any engine);
- weights ship as an array LITERAL (broadcast-in-plan): at 100 TB the
  model is a few hundred KB of doubles riding the task binary, touching
  no shuffle and no Python.

The whole expression is JVM codegen; no UDF. Training is out of scope —
models arrive from an offline trainer (as with the IVF codebook).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def token_bucket_col(token: Column, num_buckets: int) -> Column:
    """Stable per-token bucket: md5-derived 60-bit int mod num_buckets."""
    h = F.conv(F.substring(F.md5(token), 1, 15), 16, 10).cast("long")
    return F.pmod(h, F.lit(num_buckets))


def hashed_linear_score(
    docs: DataFrame,
    weights: Sequence[float],
    bias: float = 0.0,
    text_col: str = "text",
    with_prob: bool = False,
) -> DataFrame:
    """Adds `score` (= bias + Σ weight[bucket(token)] over tokens in
    document order; exact — no libm) and `label` (score > 0). An empty
    or whitespace-only document scores exactly `bias`.

    with_prob=True also adds `prob` = sigmoid(score) for consumers that
    weight by probability; prob involves exp() and is NOT part of the
    cross-engine-exact contract (score and label are)."""
    nb = len(weights)
    if nb == 0:
        raise ValueError("weights must be non-empty")
    warr = F.array(*[F.lit(float(x)) for x in weights])
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda t: t != "",
    )
    # stage the per-token weights as a projection, then fold sequentially
    per_tok = F.transform(
        toks, lambda t: F.element_at(warr, (token_bucket_col(t, nb) + 1).cast("int"))
    )
    score = F.aggregate(
        per_tok, F.lit(float(bias)), lambda acc, w: acc + w)
    out = docs.withColumn("score", score).withColumn(
        "label", F.col("score") > 0)
    if with_prob:
        out = out.withColumn(
            "prob", F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("score"))))
    return out
