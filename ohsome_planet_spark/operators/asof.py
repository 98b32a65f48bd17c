"""Generic temporal joins: as-of join and interval range join.

The history pipeline (operators/history.py) bakes as-of resolution into
its merge kernel (`ContributionsEntity.initMembers` semantics); these are
the same semantics exposed as REUSABLE DataFrame operators for any
(key, time) data — the pandas `merge_asof` / kdb `aj` / DuckDB `ASOF
JOIN` of this engine.

asof_join — one shuffle, no per-row Python: union both sides tagged,
sort within key by (ts, side) so a right row at exactly t sorts before a
left row at t (inclusive match), and carry the latest right payload
forward with last_value(ignoreNulls) over an unbounded-preceding window.
This is the standard distributed as-of plan: cost = one hash exchange on
key + one in-partition sort, independent of how many right rows precede
each left row (no point-in-interval explosion).

range_join — equi-joinable bucketing for point-in-interval matching:
intervals explode to the fixed-width buckets they overlap, points map to
their single bucket, and the join is a plain hash equi-join on
(key, bucket) + an exact post-filter. Each (point, interval) pair meets
in EXACTLY one bucket (the point's), so no dedup pass is needed. Bucket
width trades replication (long intervals × narrow buckets) against
post-filter selectivity (wide buckets); pick ≈ the median interval
length. This is how you avoid the O(points × intervals) cross product a
naive theta-join plans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | list[str] | None = None,
    tolerance_expr: Column | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For every left row, attach the nearest right row with
    right.on <= left.on (direction='backward', inclusive) — or >= for
    'forward' — matching on the `by` key(s). Right columns come back
    NULL-filled where no match exists (left join semantics).

    `tolerance_expr`: optional max distance as a Column expression over
    (left_ts - matched_ts), e.g. F.expr("INTERVAL 1 HOUR") for
    timestamps or F.lit(100) for numeric times; matches farther than the
    tolerance are nulled out."""
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    by = [by] if isinstance(by, str) else list(by or [])

    lcols = [c for c in left.columns if c != on and c not in by]
    rcols = [c for c in right.columns if c != on and c not in by]
    dup = set(lcols) & set(rcols)
    if dup:
        raise ValueError(f"overlapping non-key columns: {sorted(dup)}")

    l_tag = left.select(
        *by, F.col(on).alias("_ts"), F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in lcols]).alias("_l"),
        F.lit(None).cast(
            right.select(F.struct(F.col(on).alias("_m_ts"), *rcols).alias("s"))
            .schema["s"].dataType
        ).alias("_r"),
    )
    r_tag = right.select(
        *by, F.col(on).alias("_ts"), F.lit(0).alias("_is_left"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in lcols]).alias("s"))
            .schema["s"].dataType
        ).alias("_l"),
        F.struct(F.col(on).alias("_m_ts"), *[F.col(c) for c in rcols])
        .alias("_r"),
    )

    both = l_tag.unionByName(r_tag)
    if direction == "backward":
        # right rows sort before left rows at the same ts -> inclusive
        w = Window.partitionBy(*by).orderBy(
            F.asc("_ts"), F.asc("_is_left")
        ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    else:
        w = Window.partitionBy(*by).orderBy(
            F.desc("_ts"), F.asc("_is_left")
        ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    matched = both.withColumn(
        "_m", F.last("_r", ignorenulls=True).over(w)
    ).where(F.col("_is_left") == 1)

    if tolerance_expr is not None:
        dist = (
            (F.col("_ts") - F.col("_m._m_ts"))
            if direction == "backward"
            else (F.col("_m._m_ts") - F.col("_ts"))
        )
        matched = matched.withColumn(
            "_m", F.when(dist <= tolerance_expr, F.col("_m")))

    return matched.select(
        *by, F.col("_ts").alias(on),
        *[F.col(f"_l.{c}").alias(c) for c in lcols],
        *[F.col(f"_m.{c}").alias(c) for c in rcols],
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    by: str | list[str] | None = None,
    bucket_width: float = 1.0,
    end_inclusive: bool = False,
) -> DataFrame:
    """Inner-join each point to every interval containing it
    (start <= p < end, or <= end when end_inclusive) without a cross
    product — see module docstring for the bucketing argument.

    Numeric domains only (cast timestamps to epoch first): bucket ids are
    floor(x / bucket_width) over a double, exact for the integer/epoch
    ranges this is used on."""
    by = [by] if isinstance(by, str) else list(by or [])

    p_b = F.floor(F.col(point_col) / F.lit(bucket_width))
    pts = points.withColumn("_b", p_b.cast("long"))
    s_b = F.floor(F.col(start_col) / F.lit(bucket_width)).cast("long")
    e_b = F.floor(F.col(end_col) / F.lit(bucket_width)).cast("long")
    ivs = intervals.withColumn(
        "_b", F.explode(F.sequence(s_b, e_b))
    )
    cond = [pts["_b"] == ivs["_b"]] + [pts[k] == ivs[k] for k in by]
    upper = (
        F.col(point_col) <= F.col(end_col)
        if end_inclusive
        else F.col(point_col) < F.col(end_col)
    )
    out = (
        pts.join(ivs, cond)
        .where((F.col(start_col) <= F.col(point_col)) & upper)
        .drop("_b")
    )
    # by-columns appear on both sides after the join: keep one copy
    for k in by:
        out = out.drop(ivs[k])
    return out
