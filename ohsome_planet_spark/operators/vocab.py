"""Corpus vocabulary + out-of-vocabulary scoring (FineWeb-class signal).

A cheap, integer-exact stand-in for perplexity filtering: build the
corpus's top-K word vocabulary once, then score each document by the
fraction of its word occurrences that fall OUTSIDE the vocabulary. Docs
with high OOV fractions are gibberish, boilerplate encodings, or
wrong-language content — the same population a unigram-LM perplexity
filter drops, without the cross-engine float hazard (log/exp are libm
calls whose last ulp differs between engines; counts divide exactly).

Scale shape:
* vocabulary: one word-count aggregate (map-side combine; shuffle carries
  distinct words), top-K with a DETERMINISTIC order (count desc, word
  asc) so retries/replays pick identical vocabularies;
* scoring: words explode → broadcast LEFT join against the K-row vocab →
  per-doc counts (map-side combine again ⇒ shuffle is O(docs)). The
  corpus text never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def words_exploded(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """(id, word) rows — lowercased whitespace tokens, empties dropped."""
    return (
        df.select(
            F.col(id_col).alias("_id"),
            F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("_w"),
        )
        .where(F.col("_w") != "")
    )


def vocabulary_df(df: DataFrame, top_k: int = 10000, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Top-K corpus words by occurrence count, deterministically ordered
    (count desc, word asc) — (word, n_occurrences, rank).

    orderBy().limit(K) compiles to TakeOrderedAndProject — a DISTRIBUTED
    partial top-K per partition merged on the driver side — so no global
    single-partition sort of the whole vocabulary ever runs; the row_number
    window then ranks only the K surviving rows."""
    from pyspark.sql.window import Window

    counts = words_exploded(df, id_col, text_col).groupBy(
        F.col("_w").alias("word")
    ).agg(F.count("*").alias("n_occurrences"))
    top = counts.orderBy(F.desc("n_occurrences"), F.asc("word")).limit(top_k)
    w = Window.orderBy(F.desc("n_occurrences"), F.asc("word"))
    return top.withColumn("rank", F.row_number().over(w))


def with_oov_fraction(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc (n_word_occurrences, n_oov, oov_fraction) against `vocab`
    (any frame with a `word` column; broadcast — vocabularies are tiny).

    Zero-occurrence docs score 0.0. The fraction is one int/int division,
    IEEE-identical cross-engine (oracle-exact)."""
    words = words_exploded(df, id_col, text_col)
    flagged = words.join(
        F.broadcast(vocab.select(F.col("word").alias("_w"),
                                 F.lit(True).alias("_in"))),
        "_w", "left",
    )
    per_doc = flagged.groupBy("_id").agg(
        F.count("*").alias("n_word_occurrences"),
        F.sum(F.when(F.col("_in").isNull(), 1).otherwise(0)).alias("n_oov"),
    )
    return (
        df.select(F.col(id_col).alias("_id"))
        .join(per_doc, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("n_word_occurrences", F.lit(0)).alias("n_word_occurrences"),
            F.coalesce("n_oov", F.lit(0)).alias("n_oov"),
            F.when(
                F.coalesce("n_word_occurrences", F.lit(0)) > 0,
                F.coalesce("n_oov", F.lit(0)).cast("double")
                / F.col("n_word_occurrences"),
            ).otherwise(F.lit(0.0)).alias("oov_fraction"),
        )
    )
