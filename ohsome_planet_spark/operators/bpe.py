"""Distributed BPE tokenizer training (Sennrich et al. 2016).

Training a tokenizer on the corpus is a training-data-pipeline stage in
its own right. Classic BPE trains on the WORD-FREQUENCY TABLE, not the
raw text — the key scale fact this implementation leans on: the corpus
is read once to build (word, count); every merge iteration then runs on
the vocabulary-sized table (one pair aggregate + one literal string
rewrite), so k merges cost k small jobs regardless of corpus bytes.

Determinism: the best pair each round is argmax by (count desc, left
asc, right asc) — a total order; merges apply via LITERAL string
replacement over sentinel-spaced symbol strings (" l o w "), whose
left-to-right non-overlapping scan is exactly BPE's greedy merge and is
identical in Spark's `replace` and DuckDB's `replace` (no regex, so
symbols containing regex metacharacters are safe). The oracle unrolls
the same iterations as CTEs.

Simplifications vs production BPE (documented): whitespace
pre-tokenization (no byte fallback), no end-of-word marker symbol, and
ASCII-oriented char splitting via regexp_extract_all('(.)') — code-unit
vs code-point semantics differ between engines only outside the BMP.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_counts(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(word, n) over lowercased whitespace tokens."""
    return (
        df.select(
            F.explode(
                F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                         lambda w: w != "")
            ).alias("word")
        )
        .groupBy("word").agg(F.count("*").alias("n"))
    )


def _symbolized(words: DataFrame) -> DataFrame:
    """word → ' c h a r s ' sentinel-spaced symbol string."""
    syms = F.concat(
        F.lit(" "),
        F.array_join(F.regexp_extract_all(F.col("word"), F.lit("(.)"), 1),
                     " "),
        F.lit(" "),
    )
    return words.withColumn("syms", syms)


def train_bpe(
    words: DataFrame,
    num_merges: int = 10,
    replace_passes: int = 8,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn `num_merges` BPE merges from a (word, n) table.

    Returns (merges, segmented) where merges = [(left, right, pair_count)]
    in order learned, and segmented = (word, n, syms) with the final
    symbol string (sentinel-spaced). Each iteration collects exactly ONE
    row (the argmax pair) to the driver.

    `replace_passes`: a single literal replace merges only every OTHER
    occurrence in a run like ' a b a b ' (each match consumes the next
    pair's leading sentinel space), so the rewrite applies a FIXED number
    of passes; the fixed point equals BPE's left-to-right greedy merge
    (a merge never creates a new occurrence of its own pair), and fixed
    beats data-dependent looping because the SQL oracle unrolls the same
    count. 8 passes cover runs up to 2^8 symbols — far beyond any word."""
    cur = _symbolized(words)
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        toks = F.filter(F.split(F.trim(F.col("syms")), " "),
                        lambda s: s != "")
        pairs = F.expr(
            "zip_with(slice(_t, 1, greatest(size(_t) - 1, 0)), "
            "slice(_t, 2, greatest(size(_t) - 1, 0)), "
            "(a, b) -> struct(a AS l, b AS r))"
        )
        pair_counts = (
            cur.select("n", toks.alias("_t"))
            .select("n", F.explode(pairs).alias("_p"))
            .groupBy(F.col("_p.l").alias("l"), F.col("_p.r").alias("r"))
            .agg(F.sum("n").alias("c"))
        )
        best = (
            pair_counts.orderBy(F.desc("c"), F.asc("l"), F.asc("r"))
            .limit(1).collect()
        )
        if not best:
            break
        l, r, c = best[0]["l"], best[0]["r"], int(best[0]["c"])
        merges.append((l, r, c))
        new_syms = F.col("syms")
        for _ in range(replace_passes):
            new_syms = F.replace(new_syms, F.lit(f" {l} {r} "),
                                 F.lit(f" {l}{r} "))
        cur = cur.withColumn("syms", new_syms)
    return merges, cur.select("word", "n", "syms")


def apply_bpe_tokens_col(text_c, merges: list[tuple[str, str, int]],
                         replace_passes: int = 8):
    """Tokens-per-word counts applied to NEW text with learned merges —
    the inference half of the tokenizer, as ONE JVM expression: per word,
    symbolize and replay the merge list in learned order (same fixed
    literal-replace passes as training), then count surviving symbols.
    Returns the total BPE token count for the text (int)."""
    def seg_count(w):
        s = F.concat(
            F.lit(" "),
            F.array_join(F.regexp_extract_all(w, F.lit("(.)"), 1), " "),
            F.lit(" "),
        )
        for l, r, _ in merges:
            for _ in range(replace_passes):
                s = F.replace(s, F.lit(f" {l} {r} "), F.lit(f" {l}{r} "))
        return F.size(F.filter(F.split(F.trim(s), " "),
                               lambda x: x != ""))

    words = F.filter(F.split(F.lower(F.trim(text_c)), r"\s+"),
                     lambda w: w != "")
    return F.aggregate(
        F.transform(words, seg_count), F.lit(0), lambda acc, x: acc + x)
