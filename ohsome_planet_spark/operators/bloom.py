"""Deterministic Bloom filter — build as an aggregate, probe as codegen.

The 100 TB membership primitive: "have we seen this URL / n-gram / doc
hash before?" asked as an exact anti-join costs a corpus-sized shuffle
per probe; a Bloom filter answers with zero shuffle at a chosen false-
positive rate and NO false negatives. This engine's variant is fully
deterministic and engine-portable:

- positions come from Kirsch–Mitzenmacher double hashing over the two
  md5-derived 60-bit values the oracles already replay in DuckDB:
  pos_j = (h1 + j·h2) mod m, j < k  (k ≤ 7 keeps j·h2 < 2^63 exact);
- BUILD is one explode → (word = pos>>6) groupBy bit_or aggregate —
  map-side combined, output m/64 rows regardless of corpus size — then a
  bounded collect into a plain python list (the codebook doctrine: the
  FILTER is the model, not the data);
- PROBE is a single JVM codegen expression over the in-plan literal word
  array: no join, no shuffle, no Python. At m = 2^27 (16 MB of longs)
  the filter still rides the task binary comfortably.

Same-seed rebuilds are bit-identical, so a filter built last week and a
filter rebuilt today agree row-for-row — the property that makes Bloom
pre-filters safe in incremental crawl dedup (`urls.py`) and benchmark
decontamination (`dedup.decontaminate`) pipelines.

Reference parity: ohsome-planet configures parquet bloom filters on its
GeoParquet sink (mirrored in `io/geoparquet.py`); this operator is the
query-side generalization for the training-data layer.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAX_K = 7  # j*h2 with h2 < 2^60 stays < 2^63 for j <= 6


def _h60(prefix: str, key_c: Column) -> Column:
    """The engine's standard md5-derived 60-bit integer, salted by a
    prefix so h1/h2 are independent."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(prefix), key_c.cast("string"))),
                    1, 15),
        16, 10,
    ).cast("long")


def _check_params(m_bits: int, k: int) -> None:
    if m_bits <= 0 or m_bits % 64 != 0:
        raise ValueError("m_bits must be a positive multiple of 64")
    if not 1 <= k <= MAX_K:
        raise ValueError(f"k must be in [1, {MAX_K}]")


def bloom_positions_col(key_c: Column, m_bits: int, k: int) -> Column:
    """array<long> of the k bit positions for a key (Kirsch–Mitzenmacher:
    (h1 + j·h2) mod m — exact 64-bit integer arithmetic, no overflow)."""
    _check_params(m_bits, k)
    h1, h2 = _h60("a:", key_c), _h60("b:", key_c)
    return F.array(
        *[F.pmod(h1 + F.lit(j) * h2, F.lit(m_bits)) for j in range(k)]
    )


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int = 1 << 16,
    k: int = 3,
) -> list[int]:
    """The filter: a python list of m_bits/64 longs (word i holds bits
    [64i, 64i+64)). One explode + bit_or aggregate over the keys; the
    collect is bounded by m_bits/64 rows — the filter, never the data."""
    _check_params(m_bits, k)
    pos = F.explode(
        bloom_positions_col(F.col(key_col), m_bits, k)).alias("_pos")
    words = (
        df.select(pos)
        .select(
            F.shiftrightunsigned("_pos", 6).alias("_w"),
            # python-side shiftleft only takes literal bit counts; the
            # SQL function accepts a column
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pmod(_pos, 64) AS INT))"
            ).alias("_bit"),
        )
        .groupBy("_w")
        .agg(F.bit_or("_bit").alias("_bits"))
        .collect()
    )
    out = [0] * (m_bits // 64)
    for r in words:
        out[r["_w"]] = r["_bits"]
    return out


def bloom_probe_col(
    words: Sequence[int], key_c: Column, m_bits: int, k: int
) -> Column:
    """True iff every one of the key's k bits is set — one codegen
    expression over the literal word array. No false negatives; false
    positives at the standard (1-e^(-kn/m))^k rate, deterministically."""
    _check_params(m_bits, k)
    if len(words) != m_bits // 64:
        raise ValueError("words length must be m_bits/64")
    # ONE array literal — F.array of m/64 individual F.lit Columns would
    # push every element through py4j and build a CreateArray with that
    # many children (minutes of plan construction at m=2^27)
    arr = F.lit([int(w) for w in words])
    h1, h2 = _h60("a:", key_c), _h60("b:", key_c)
    cond = None
    for j in range(k):
        pos = F.pmod(h1 + F.lit(j) * h2, F.lit(m_bits))
        word = F.element_at(
            arr, (F.shiftrightunsigned(pos, 6) + 1).cast("int"))
        hit = F.getbit(word, F.pmod(pos, F.lit(64))) == 1
        cond = hit if cond is None else (cond & hit)
    return cond


def bloom_filter_seen(
    df: DataFrame,
    seen: DataFrame,
    key_col: str,
    m_bits: int = 1 << 16,
    k: int = 3,
    keep: str = "unseen",
) -> DataFrame:
    """Drop (keep='unseen') or keep (keep='seen') rows whose key probes
    positive against a filter built from `seen`. keep='unseen' is the
    crawl-dedup/decontamination direction: false positives drop a few
    clean rows (safe), false negatives never happen so nothing dirty
    survives. The build runs eagerly (two bounded jobs); the probe adds
    zero shuffle to df's plan."""
    if keep not in ("unseen", "seen"):
        raise ValueError("keep must be 'unseen' or 'seen'")
    words = bloom_build(seen, key_col, m_bits=m_bits, k=k)
    hit = bloom_probe_col(words, F.col(key_col), m_bits, k)
    return df.where(~hit if keep == "unseen" else hit)
