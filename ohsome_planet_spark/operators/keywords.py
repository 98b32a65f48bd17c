"""TF-IDF keyword extraction per document.

Picks the top-k most characteristic words of every document — the
classic corpus-summarization / topic-tagging stage (and the exact-score
sibling of the BM25 retrieval path in operators/bm25.py).

Plan shape (all JVM expressions):
* one tokenize + explode → tf per (doc, word) with map-side combine;
* document frequency per word from the SAME aggregate (one extra groupBy
  over already-reduced (doc, word) rows — never the raw tokens);
* corpus size N is a 1-row broadcast cross join;
* score = tf · ln(N / df), rounded to 9 dp so the value — and therefore
  the per-doc ranking — is bit-reproducible across engines (libm ``ln``
  may differ in the last ulp); ties broken by word asc, so row_number
  gives ONE deterministic answer.

100 TB shape: two shuffles (doc, word) → (word) over aggregated rows;
the per-doc top-k window partitions by doc_id — no skew beyond a single
document's vocabulary, which is bounded by document length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def term_freqs(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """(doc_id, word, tf) — lowercased whitespace tokens."""
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                         lambda w: w != "")
            ).alias("word"),
        )
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("tf"))
    )


def tfidf_keywords(
    df: DataFrame,
    top_k: int = 3,
    min_df: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k (doc_id, word, tf, df, score, rank) per document by TF-IDF.

    ``min_df`` drops words seen in fewer than that many documents (OCR
    noise, hapax typos) BEFORE ranking. Words appearing in every document
    score exactly 0 (ln N/N) and rank last among ties by word order."""
    tf = term_freqs(df, id_col, text_col)
    dfreq = tf.groupBy("word").agg(F.count("*").alias("df"))
    if min_df > 1:
        dfreq = dfreq.where(F.col("df") >= min_df)
    n_docs = df.select(F.col(id_col)).distinct().agg(
        F.count("*").alias("n_docs"))

    j = tf.join(dfreq, "word").crossJoin(F.broadcast(n_docs))
    score = F.round(
        F.col("tf").cast("double")
        * F.log(F.col("n_docs").cast("double") / F.col("df").cast("double")),
        9,
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("word"))
    return (
        j.select("doc_id", "word", "tf", "df", score.alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
    )
