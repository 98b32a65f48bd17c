"""Deterministic corpus sampling — reproducible by construction.

Training-data pipelines need samples that are (a) stratified (per-language /
per-source mixing ratios), (b) reproducible across runs and engines, and
(c) cheap at 100 TB. Random `sample()` fails (b): executors draw different
randomness per retry/partition split. Hash sampling keys the decision on a
stable hash of the row's id, so the SAME rows are kept on every run, every
engine, every cluster size — and it's one JVM expression, no shuffle at all
(the filter pushes into the scan's row-group pruning where stats allow).

The hash is the md5-derived 60-bit integer used across this engine's
oracles (DuckDB computes the identical value), bucketed to 1e6 so rates
have micro precision.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 1_000_000


def hash_bucket_col(id_c: Column) -> Column:
    """Stable per-row bucket in [0, 1e6) from md5 of the id's string form."""
    h = F.conv(F.substring(F.md5(id_c.cast("string")), 1, 15), 16, 10).cast("long")
    return F.pmod(h, F.lit(BUCKETS))


def hash_sample(
    df: DataFrame,
    id_col: str,
    rate: float | None = None,
    rate_by: dict[str, float] | None = None,
    stratum_col: str | None = None,
) -> DataFrame:
    """Keep a deterministic `rate` fraction of rows (or per-stratum rates).

    rate_by + stratum_col: per-stratum rates (e.g. {'en': 0.1, 'de': 0.5});
    strata not listed are dropped — the corpus-mixing contract. Exactly the
    same rows survive on every run (retry/speculation/cluster-size safe).
    """
    bucket = hash_bucket_col(F.col(id_col))
    if rate_by is not None:
        if stratum_col is None:
            raise ValueError("rate_by requires stratum_col")
        thresholds = F.create_map(
            *[x for k, v in sorted(rate_by.items())
              for x in (F.lit(k), F.lit(int(round(v * BUCKETS))))]
        )
        thr = thresholds.getItem(F.col(stratum_col))
        return df.where(thr.isNotNull() & (bucket < thr))
    if rate is None:
        raise ValueError("pass rate or rate_by")
    return df.where(bucket < F.lit(int(round(rate * BUCKETS))))


def mixture_rates(
    df: DataFrame, stratum_col: str, weights: dict[str, float]
) -> dict[str, float]:
    """Turn target MIXTURE proportions into per-stratum sampling rates.

    weights: desired share of each stratum in the output (normalized
    internally; strata not listed are dropped). The output size is
    maximized subject to every listed stratum hitting its share exactly and
    no rate exceeding 1.0: the binding stratum is the one with the smallest
    available/target ratio, it samples at 1.0, and every other stratum
    scales down proportionally. One count aggregate over the corpus (the
    per-stratum counts are a handful of rows on the driver); feed the
    result to `hash_sample(rate_by=...)` for the deterministic filter.
    """
    if any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative")
    # a zero weight is the natural spelling of "drop this stratum"
    weights = {k: w for k, w in weights.items() if w > 0}
    total_w = sum(weights.values())
    if total_w <= 0:
        raise ValueError("weights must sum to a positive value")
    shares = {k: w / total_w for k, w in weights.items()}
    counts = {
        r[stratum_col]: r["count"]
        for r in df.where(F.col(stratum_col).isin(list(weights)))
        .groupBy(stratum_col)
        .count()
        .collect()
    }
    missing = [k for k in weights if counts.get(k, 0) == 0]
    if missing:
        raise ValueError(f"strata with no rows cannot hit a share: {missing}")
    # output total N is bounded per stratum by n_k / share_k; the min wins
    n_out = min(counts[k] / shares[k] for k in shares)
    return {k: min(1.0, (shares[k] * n_out) / counts[k]) for k in shares}


def mixture_sample(
    df: DataFrame, id_col: str, stratum_col: str, weights: dict[str, float]
) -> DataFrame:
    """Deterministic mixture-weighted sample: the largest subset of df whose
    stratum proportions match `weights` (binding stratum kept whole)."""
    rates = mixture_rates(df, stratum_col, weights)
    return hash_sample(df, id_col, rate_by=rates, stratum_col=stratum_col)


def weighted_sample_key_col(id_c: Column, weight_c: Column) -> Column:
    """Efraimidis–Spirakis key: ln(u)/w with u the md5-derived uniform in
    (0, 1]. Taking the k LARGEST keys per stratum draws a weighted sample
    without replacement where each row's inclusion odds are proportional
    to its weight — and because u comes from the row's id hash, the
    selection is deterministic across runs, engines, and cluster sizes
    (the whole point, as with hash_sample above). Rounded to 12 dp so the
    ranking is bit-stable cross-engine (libm ln last-ulp)."""
    u = (hash_bucket_col(id_c) + 1).cast("double") / F.lit(float(BUCKETS + 1))
    return F.round(F.log(u) / weight_c.cast("double"), 12)


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    stratum_col: str | None = None,
) -> DataFrame:
    """Top-k weighted sample (per stratum when `stratum_col` is given).

    Rows with weight <= 0 are excluded (ES keys are undefined there).
    Scale-invariant: multiplying every weight by a constant selects the
    same rows. Global k compiles to TakeOrderedAndProject; stratified k
    is one window over the stratum partitioning."""
    from pyspark.sql.window import Window

    key = weighted_sample_key_col(F.col(id_col), F.col(weight_col))
    base = df.where(F.col(weight_col) > 0).withColumn("_wkey", key)
    if stratum_col is None:
        return (
            base.orderBy(F.desc("_wkey"), F.asc(id_col))
            .limit(k).drop("_wkey")
        )
    w = Window.partitionBy(stratum_col).orderBy(
        F.desc("_wkey"), F.asc(id_col))
    return (
        base.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_wkey", "_rn")
    )


def cap_per_group(
    df: DataFrame,
    budget: int,
    group_col: str,
    id_col: str = "doc_id",
    size_col: str | None = None,
) -> DataFrame:
    """Per-group budget capping (C4-style hot-domain downsampling): keep
    each group's rows in STABLE HASH ORDER until the budget is exhausted,
    drop the rest.

    size_col=None caps by ROW count (budget = max rows per group);
    size_col given caps by its SUM (e.g. a token count — the first row
    that would overflow the budget is the last one kept, so every group
    retains at least one row and the kept set is a prefix of the hash
    order). Hash order (not id order) so the survivors are an unbiased
    sample of the group rather than its oldest ids, yet identical on
    every run, engine, and cluster size. One window over the group
    partitioning — no global shuffle beyond it."""
    from pyspark.sql.window import Window

    order = [hash_bucket_col(F.col(id_col)).asc(), F.col(id_col).asc()]
    w = Window.partitionBy(group_col).orderBy(*order)
    if size_col is None:
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= budget)
            .drop("_rn")
        )
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    running = F.sum(F.col(size_col).cast("long")).over(wsum)
    return (
        df.withColumn("_run", running)
        .where(F.col("_run") - F.col(size_col).cast("long") < budget)
        .drop("_run")
    )
