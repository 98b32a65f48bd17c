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
