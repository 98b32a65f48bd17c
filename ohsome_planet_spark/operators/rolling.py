"""Rolling time-window aggregates: per-row trailing-window stats.

"How many events did this user fire in the hour before this one" — the
rate-limiting / burst-detection / feature-engineering primitive. One
range-frame window per call: Spark shuffles once on the key, sorts by
time in-partition, and the frame scan is linear (two pointers), so cost
is O(rows log rows_per_key) regardless of window width — never the
self-join-with-inequality a naive formulation plans.

Exactness doctrine: counts and integer sums only (order-insensitive,
engine-exact). Float measures would reintroduce the order-dependent-sum
hazard; callers can pre-quantize to ints if needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rolling_counts(
    df: DataFrame,
    time_col: str = "ts",
    by: str | list[str] = "user_id",
    window_seconds: int = 3600,
    sum_cols: list[str] | None = None,
) -> DataFrame:
    """Adds n_in_window (+ <c>_in_window per integer sum col): aggregates
    over [t − window_seconds, t] INCLUSIVE on both ends (rows sharing the
    exact boundary timestamp are in — same as SQL RANGE frames).

    The time column may be timestamp (converted to epoch seconds for the
    range frame) or numeric (used as-is)."""
    by = [by] if isinstance(by, str) else list(by)
    t = F.col(time_col)
    dtype = dict(df.dtypes)[time_col]
    if dtype == "timestamp_ntz":
        # NTZ has no epoch cast; diff against an NTZ anchor is exact and
        # timezone-independent
        epoch = F.expr(
            "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
            f"`{time_col}`)"
        )
    else:  # timestamp (tz) casts to epoch seconds; numerics pass through
        epoch = t.cast("long")
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("_epoch"))
        .rangeBetween(-window_seconds, 0)
    )
    out = df.withColumn("_epoch", epoch).withColumn(
        "n_in_window", F.count("*").over(w).cast("long"))
    for c in sum_cols or []:
        out = out.withColumn(
            f"{c}_in_window", F.sum(F.col(c)).over(w).cast("long"))
    return out.drop("_epoch")
