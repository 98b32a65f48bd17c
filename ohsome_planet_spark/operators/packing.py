"""Sequence packing: concat-and-chunk documents into fixed-token blocks.

The final assembly step of an LLM training-data pipeline (GPT-style): the
corpus is treated as one token stream in a deterministic document order and
chunked into training sequences of exactly `capacity` tokens; each document
maps to the sequence ids it overlaps, with per-sequence token counts.

Scale design — the global running token count is NOT computed with a
single `Window.orderBy(...)` (that is one partition holding the whole
corpus). It is the classic two-phase distributed prefix sum:

1. range-partition by the order key (`repartitionByRange`, the same
   mechanism as Spark's own global sort — boundaries are sampled, but the
   prefix VALUES are boundary-independent, so results are deterministic);
2. per-partition cumulative sums (narrow windows inside each partition);
3. per-partition totals (one tiny row per partition) → driver prefix →
   broadcast join of the partition offset.

Tokens-per-doc is any integer column; integer arithmetic end to end, so
the DuckDB oracle (a plain single-window replay) matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    docs: DataFrame,
    capacity: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    num_partitions: int | None = None,
) -> DataFrame:
    """→ (seq_id, doc_id, tokens_in_seq, offset_in_seq).

    One row per (sequence, document) overlap, in id_col order: documents
    are concatenated by ascending id and cut every `capacity` tokens.
    offset_in_seq is the document's start position inside that sequence.
    Zero-token documents occupy no sequence and emit no row.
    """
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    d = docs.select(
        F.col(id_col).cast("long").alias("_id"),
        F.col(tokens_col).cast("long").alias("_n"),
    ).where(F.col("_n") > 0)
    if num_partitions is None:
        from ohsome_planet_spark.session import kernel_partitions

        num_partitions = kernel_partitions(docs.sparkSession)
    d = d.repartitionByRange(num_partitions, "_id")
    d = d.withColumn("_pid", F.spark_partition_id())

    w_local = (
        Window.partitionBy("_pid").orderBy("_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("_local_end", F.sum("_n").over(w_local))

    # partition totals → prefix offsets (rows = num_partitions: tiny)
    totals = d.groupBy("_pid").agg(F.sum("_n").alias("_t"))
    w_prefix = (
        Window.orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = totals.withColumn(
        "_off", F.sum("_t").over(w_prefix) - F.col("_t")
    ).select("_pid", "_off")

    d = d.join(F.broadcast(offsets), "_pid")
    end = F.col("_local_end") + F.col("_off")   # exclusive global end
    start = end - F.col("_n")                    # inclusive global start
    c = F.lit(capacity).cast("long")
    first = F.floor(start / c)
    last = F.floor((end - F.lit(1)) / c)
    out = d.select(
        F.col("_id").alias(id_col),
        start.alias("_s"), end.alias("_e"),
        F.explode(F.sequence(first, last)).alias("seq_id"),
    )
    s_lo = F.col("seq_id") * c
    return out.select(
        "seq_id",
        F.col(id_col),
        (F.least(F.col("_e"), s_lo + c)
         - F.greatest(F.col("_s"), s_lo)).cast("int").alias("tokens_in_seq"),
        F.greatest(F.col("_s") - s_lo, F.lit(0).cast("long"))
        .cast("int").alias("offset_in_seq"),
    )
