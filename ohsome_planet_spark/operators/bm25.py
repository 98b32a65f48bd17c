"""BM25 ranked retrieval over the documents table.

Keyword search is the retrieval counterpart of the embedding ANN path
(operators/similarity.py): given a bag-of-words query, score every
document with Okapi BM25 (Robertson et al.; the exact formula here is the
Lucene variant: idf = ln(1 + (N - df + 0.5)/(df + 0.5)), tf component
tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl))).

Plan shape (all JVM expressions, no UDFs):
* tokenize once; per-doc lengths → one tiny corpus-stats row (N, Σdl)
  cross-joined back (broadcast — it is 1 row);
* the query's terms are a literal array; only matching tokens survive the
  explode (filter BEFORE the groupBy, so the shuffle carries O(matches));
* per-(doc, term) tf → per-term df → per-doc score.

Float determinism: a naive SUM(double) depends on row order, which Spark
does not fix across runs (and DuckDB orders differently), so the score is
computed as a LEFT FOLD over the per-term contributions sorted by term,
each contribution pre-rounded to 9 dp (absorbing last-ulp libm ``ln``
differences between engines). The result is bit-reproducible across runs
AND engines; the integer columns (matched_terms, sum_tf, doc_len) are
exact by construction.

100 TB shape: one shuffle on (doc, term) limited to query-term matches,
one on doc_id for the fold; df counts aggregate map-side; the corpus
text never shuffles. For interactive serving you would precompute the
(term → postings) inverted index with the same first half of this plan
and snapshot it (io/snapshots.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _doc_words(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return (
        df.select(
            F.col(id_col).alias("_id"),
            F.explode(
                F.filter(
                    F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                    lambda w: w != "",
                )
            ).alias("_w"),
        )
    )


# Below this many distinct query terms, per-doc tf counting via array
# expressions (O(terms × tokens) per doc, ZERO explode/shuffle) beats the
# explode + two-shuffle inverted shape. Interactive queries are a handful
# of terms; bulk scoring of large term sets keeps the explode path.
FUSED_TERMS_MAX = 16


def _bm25_scores_fused(
    df: DataFrame,
    terms: list[str],
    k1: float,
    b: float,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Fused small-query BM25 (r7): tokenize ONCE per doc; per-term tf via
    array filters in the same projection; (N, Σdl, df_t...) as ONE 1-row
    broadcast aggregate; score as an unrolled fold in sorted term order.

    Row- and bit-identical to the explode path: tf/df/dl/N are the same
    integers, each term contribution is the same `round(idf·tfc, 9)`
    double, the fold adds contributions in the same sorted-term order
    (terms with tf = 0 contribute +0.0 — exact identity on doubles), and
    docs matching no term are dropped by the same ≥1-match rule. The
    explode path's shuffles (doc,term)-matches + doc_id fold are replaced
    by one scan + a 1-row broadcast; the corpus text never shuffles."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda w: w != "",
    )
    def _eq(term: str):
        return lambda w: w == F.lit(term)

    tf_cols = [
        F.size(F.filter(F.col("_toks"), _eq(t)))
        .cast("long").alias(f"_tf_{i}")
        for i, t in enumerate(terms)
    ]
    per_doc = df.select(
        F.col(id_col).alias("_id"), toks.alias("_toks")
    ).select(
        "_id", F.size("_toks").cast("long").alias("dl"), *tf_cols
    )
    # per_doc feeds the stats aggregate AND the scored output —
    # unpersisted, the tokenize pass runs once per consumer
    from .cache_util import swap_persist

    per_doc = swap_persist("bm25_fused", per_doc)

    stats = per_doc.agg(
        # the explode path derives (N, Σdl) from docs with ≥1 token only
        F.sum(F.when(F.col("dl") > 0, 1).otherwise(0)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum(F.when(F.col(f"_tf_{i}") > 0, 1).otherwise(0))
            .alias(f"_df_{i}")
            for i in range(len(terms))
        ],
    )

    j = per_doc.crossJoin(F.broadcast(stats))
    n = F.col("n_docs").cast("double")
    avgdl = F.col("sum_dl").cast("double") / n

    def contrib(i: int):
        dfc = F.col(f"_df_{i}").cast("double")
        idf = F.log(F.lit(1.0) + (n - dfc + F.lit(0.5)) / (dfc + F.lit(0.5)))
        tfd = F.col(f"_tf_{i}").cast("double")
        tfc = (tfd * F.lit(k1 + 1.0)) / (
            tfd + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl)
        )
        return F.round(idf * tfc, 9)

    score = F.lit(0.0)
    for i in range(len(terms)):  # sorted term order == array_sort fold
        score = score + contrib(i)
    matched = sum(
        (F.col(f"_tf_{i}") > 0).cast("long") for i in range(len(terms))
    ) if terms else F.lit(0).cast("long")
    sum_tf = sum(
        F.col(f"_tf_{i}") for i in range(len(terms))
    ) if terms else F.lit(0).cast("long")

    return (
        j.select(
            F.col("_id").alias(id_col),
            matched.alias("matched_terms"),
            sum_tf.cast("long").alias("sum_tf"),
            F.col("dl").cast("long").alias("doc_len"),
            F.round(score, 6).alias("score"),
        )
        .where(F.col("matched_terms") > 0)
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, matched_terms, sum_tf, doc_len, score) for every document
    matching ≥1 query term. Terms are lowercased; duplicates collapse
    (BM25 is defined over the query's term SET)."""
    terms = sorted({t.lower() for t in query_terms if t})
    if len(terms) <= FUSED_TERMS_MAX:
        return _bm25_scores_fused(df, terms, k1, b, id_col, text_col)
    words = _doc_words(df, id_col, text_col)

    dl = words.groupBy("_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
    )

    tf = (
        words.where(F.col("_w").isin(terms))
        .groupBy("_id", "_w")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("_w").agg(F.count("*").alias("df"))

    j = (
        tf.join(F.broadcast(dfreq), "_w")
        .join(dl, "_id")
        .crossJoin(F.broadcast(stats))
    )
    n, dfc = F.col("n_docs").cast("double"), F.col("df").cast("double")
    idf = F.log(F.lit(1.0) + (n - dfc + F.lit(0.5)) / (dfc + F.lit(0.5)))
    avgdl = F.col("sum_dl").cast("double") / n
    tfd = F.col("tf").cast("double")
    tfc = (tfd * F.lit(k1 + 1.0)) / (
        tfd + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl)
    )
    contrib = F.round(idf * tfc, 9)

    per_doc = (
        j.select("_id", "_w", "tf", "dl", contrib.alias("_c"))
        .groupBy("_id", "dl")
        .agg(
            F.count("*").alias("matched_terms"),
            F.sum("tf").alias("sum_tf"),
            # order-fixed left fold: sort contributions by term, then add
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("_w", "_c"))),
                F.lit(0.0),
                lambda acc, x: acc + x["_c"],
            ).alias("score"),
        )
    )
    return per_doc.select(
        F.col("_id").alias(id_col),
        F.col("matched_terms").cast("long").alias("matched_terms"),
        F.col("sum_tf").cast("long").alias("sum_tf"),
        F.col("dl").cast("long").alias("doc_len"),
        F.round(F.col("score"), 6).alias("score"),
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    **kwargs,
) -> DataFrame:
    """Top-k by (score desc, doc_id asc) — deterministic tiebreak; compiles
    to TakeOrderedAndProject (distributed partial top-k, no global sort)."""
    id_col = kwargs.get("id_col", "doc_id")
    scored = bm25_scores(df, query_terms, **kwargs)
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def build_inverted_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Materialize the retrieval index ONCE: (postings, doc_stats).

    postings:  (term, doc_id, tf, df) — one row per posting, `df` denormed
               onto every row so query-time needs no second aggregate;
    doc_stats: (doc_id, dl) plus every row carries (n_docs, sum_dl).

    Write both through `io/snapshots.SnapshotTable` (partition postings by
    a term hash-bucket) and the 100 TB corpus is tokenized exactly once;
    every query after that is `bm25_from_index` — a filter on the query's
    terms (partition-prunable via the bucket) + one tiny aggregate. This
    is the build half of bm25_scores' plan, snapshotted instead of
    recomputed per query."""
    words = _doc_words(df, id_col, text_col)
    tf = words.groupBy("_id", "_w").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("_w").agg(F.count("*").alias("df"))
    postings = tf.join(dfreq, "_w").select(
        F.col("_w").alias("term"), F.col("_id").alias("doc_id"), "tf", "df")

    dl = words.groupBy("_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl"))
    doc_stats = dl.select(F.col("_id").alias("doc_id"), "dl") \
        .crossJoin(F.broadcast(stats))
    return postings, doc_stats


def bm25_from_index(
    postings: DataFrame,
    doc_stats: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Score from a prebuilt index — identical output to `bm25_scores`
    (same contribution arithmetic, same order-fixed fold), without
    touching the corpus text."""
    terms = sorted({t.lower() for t in query_terms if t})
    j = postings.where(F.col("term").isin(terms)).join(doc_stats, "doc_id")

    n, dfc = F.col("n_docs").cast("double"), F.col("df").cast("double")
    idf = F.log(F.lit(1.0) + (n - dfc + F.lit(0.5)) / (dfc + F.lit(0.5)))
    avgdl = F.col("sum_dl").cast("double") / n
    tfd = F.col("tf").cast("double")
    tfc = (tfd * F.lit(k1 + 1.0)) / (
        tfd + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl)
    )
    contrib = F.round(idf * tfc, 9)

    return (
        j.select("doc_id", "term", "tf", "dl", contrib.alias("_c"))
        .groupBy("doc_id", "dl")
        .agg(
            F.count("*").alias("matched_terms"),
            F.sum("tf").alias("sum_tf"),
            F.aggregate(
                F.array_sort(F.collect_list(F.struct(F.col("term"), F.col("_c")))),
                F.lit(0.0),
                lambda acc, x: acc + x["_c"],
            ).alias("score"),
        )
        .select(
            "doc_id",
            F.col("matched_terms").cast("long").alias("matched_terms"),
            F.col("sum_tf").cast("long").alias("sum_tf"),
            F.col("dl").cast("long").alias("doc_len"),
            F.round(F.col("score"), 6).alias("score"),
        )
    )
