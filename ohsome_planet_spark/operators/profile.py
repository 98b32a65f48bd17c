"""Corpus profiling: exact length-distribution statistics per stratum.

Before mixing/sampling a 100 TB corpus you profile it — token-count
distributions per source/domain/language drive the mixture weights and
catch collection bugs (a source whose p99 collapsed, a domain of empty
shells). This operator computes EXACT statistics, not sketches:

* mean_tokens is one int/int division over exact long sums;
* percentiles are NEAREST-RANK (the value whose 1-based rank is
  ceil(q·n) in the sorted stratum) — pure order statistics on integers,
  so the result is integer-exact and engine-independent, unlike
  interpolated quantiles whose float arithmetic varies.

Plan shape: tokenize once → per-doc length; one window (rank within
stratum by length) + one aggregate. The window partitions by stratum —
for mega-strata the sort is the cost; at that point switch to the sketch
(`approxQuantile`) for exploration and keep this for the strata you are
about to commit to a mixture. Shuffles carry (stratum, length) pairs,
never text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_QUANTILES = (0.5, 0.9, 0.99)


def quality_profile(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """MICRO-averaged quality signals per stratum — the domain-screening
    aggregate ("is this source's text mostly punctuation soup?").

    Micro-averaging is the exactness trick: instead of averaging per-doc
    float ratios (an order-dependent float sum), sum the integer
    NUMERATORS and DENOMINATORS per stratum (exact longs) and divide
    once — engine-exact, and statistically the right weighting anyway
    (a 10-char doc should not count as much as a 10k-char doc).

    Uses the same char/punct/stopword definitions as
    functions.text.quality_cols."""
    t = F.col(text_col)
    length = F.length(t)
    punct = length - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    tokens = F.size(
        F.filter(F.split(F.lower(F.trim(t)), r"\s+"), lambda w: w != ""))
    stop = F.size(
        F.filter(
            F.split(F.lower(t), r"\s+"),
            lambda w: w.isin("the", "a", "an", "and", "or", "of", "to",
                             "in", "is"),
        )
    )
    agg = (
        df.select(F.col(group_col).alias("g"),
                  length.alias("_len"), punct.alias("_punct"),
                  tokens.alias("_tok"), stop.alias("_stop"))
        .groupBy("g")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_len").cast("long").alias("total_chars"),
            F.sum("_punct").cast("long").alias("total_punct"),
            F.sum("_tok").cast("long").alias("total_tokens"),
            F.sum("_stop").cast("long").alias("total_stopwords"),
        )
    )
    dz = lambda num, den: F.when(
        F.col(den) > 0, F.col(num).cast("double") / F.col(den)
    ).otherwise(F.lit(0.0))
    return agg.select(
        F.col("g").alias(group_col),
        "n_docs", "total_chars", "total_punct", "total_tokens",
        "total_stopwords",
        dz("total_punct", "total_chars").alias("punct_ratio"),
        dz("total_stopwords", "total_tokens").alias("stopword_ratio"),
    )


def length_profile(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    quantiles: tuple[float, ...] = DEFAULT_QUANTILES,
) -> DataFrame:
    """Per-stratum (n_docs, total_tokens, mean_tokens, min/max, p·
    nearest-rank percentiles) of whitespace token counts."""
    lens = df.select(
        F.col(group_col).alias("g"),
        F.col(id_col).alias("_id"),
        F.size(
            F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                     lambda w: w != "")
        ).cast("long").alias("len"),
    )
    w = Window.partitionBy("g").orderBy(F.asc("len"), F.asc("_id"))
    # stratum size via a window over the SAME partitioning — one exchange
    # serves both the rank and the count
    ranked = lens.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count("*").over(Window.partitionBy("g"))
    )
    aggs = [
        F.count("*").alias("n_docs"),
        F.sum("len").alias("total_tokens"),
        (F.sum("len").cast("double") / F.count("*")).alias("mean_tokens"),
        F.min("len").alias("min_tokens"),
        F.max("len").alias("max_tokens"),
    ]
    for q in quantiles:
        # nearest-rank: smallest value whose rank >= ceil(q*n)
        rank = F.ceil(F.lit(q) * F.col("n"))
        aggs.append(
            F.min(F.when(F.col("rn") >= rank, F.col("len")))
            .alias(f"p{int(q * 100)}_tokens")
        )
    return ranked.groupBy("g").agg(*aggs).select(
        F.col("g").alias(group_col),
        *[c for c in ["n_docs", "total_tokens", "mean_tokens",
                      "min_tokens", "max_tokens"]],
        *[f"p{int(q * 100)}_tokens" for q in quantiles],
    )
