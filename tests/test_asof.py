"""Generic as-of + range joins (operators/asof.py)."""

import pytest

from pyspark.sql import functions as F

from ohsome_planet_spark.operators.asof import asof_join, range_join


@pytest.fixture(scope="module")
def quotes(spark):
    # (sym, ts, bid) — the right side
    rows = [
        ("A", 10, 1.0), ("A", 20, 2.0), ("A", 30, 3.0),
        ("B", 15, 9.0),
    ]
    return spark.createDataFrame(rows, "sym string, ts long, bid double")


@pytest.fixture(scope="module")
def trades(spark):
    rows = [
        ("A", 5, 100),    # before any quote -> null
        ("A", 20, 101),   # exactly at a quote -> inclusive match (20)
        ("A", 25, 102),   # between -> 20
        ("A", 99, 103),   # after all -> 30
        ("B", 14, 104),   # before B's quote -> null
        ("B", 16, 105),   # -> 15
        ("C", 50, 106),   # key with no right rows -> null
    ]
    return spark.createDataFrame(rows, "sym string, ts long, qty long")


def test_asof_backward(trades, quotes):
    out = {(r["sym"], r["ts"]): r["bid"]
           for r in asof_join(trades, quotes, on="ts", by="sym").collect()}
    assert out == {
        ("A", 5): None, ("A", 20): 2.0, ("A", 25): 2.0, ("A", 99): 3.0,
        ("B", 14): None, ("B", 16): 9.0, ("C", 50): None,
    }


def test_asof_forward(trades, quotes):
    out = {(r["sym"], r["ts"]): r["bid"]
           for r in asof_join(trades, quotes, on="ts", by="sym",
                              direction="forward").collect()}
    assert out == {
        ("A", 5): 1.0, ("A", 20): 2.0, ("A", 25): 3.0, ("A", 99): None,
        ("B", 14): 9.0, ("B", 16): None, ("C", 50): None,
    }


def test_asof_tolerance(trades, quotes):
    out = {(r["sym"], r["ts"]): r["bid"]
           for r in asof_join(trades, quotes, on="ts", by="sym",
                              tolerance_expr=F.lit(5)).collect()}
    # (A, 99) is 69 past the last quote -> nulled by tolerance
    assert out[("A", 99)] is None and out[("A", 25)] == 2.0


def test_asof_single_shuffle_plan(trades, quotes):
    plan = asof_join(trades, quotes, on="ts", by="sym") \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_asof_rejects_column_collision(spark, quotes):
    bad = spark.createDataFrame([("A", 1, 2.0)], "sym string, ts long, bid double")
    with pytest.raises(ValueError, match="overlapping"):
        asof_join(bad, quotes, on="ts", by="sym")


def test_range_join_matches_naive(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    pts = [(int(k % 3), int(t)) for k, t in
           zip(rng.integers(0, 3, 300), rng.integers(0, 1000, 300))]
    ivs = [(int(k % 3), int(s), int(s + w)) for k, s, w in
           zip(rng.integers(0, 3, 60), rng.integers(0, 950, 60),
               rng.integers(1, 120, 60))]
    p_df = spark.createDataFrame(pts, "k long, ts long").withColumn(
        "pid", F.monotonically_increasing_id())
    i_df = spark.createDataFrame(ivs, "k long, start long, end long") \
        .withColumn("iid", F.monotonically_increasing_id())

    got = {(r["pid"], r["iid"]) for r in
           range_join(p_df, i_df, by="k", bucket_width=64).collect()}

    p_rows = p_df.collect()
    want = {
        (p["pid"], i["iid"])
        for p in p_rows for i in i_df.collect()
        if p["k"] == i["k"] and i["start"] <= p["ts"] < i["end"]
    }
    assert got == want


def test_range_join_end_inclusive(spark):
    p = spark.createDataFrame([(1, 10)], "k long, ts long")
    i = spark.createDataFrame([(1, 0, 10)], "k long, start long, end long")
    assert range_join(p, i, by="k").count() == 0
    assert range_join(p, i, by="k", end_inclusive=True).count() == 1


def test_asof_differential_vs_pandas_merge_asof(spark):
    """Randomized sweep against pandas' independent merge_asof."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(21)
    trades_pd = pd.DataFrame({
        "sym": rng.integers(0, 5, 400).astype(str),
        "ts": rng.integers(0, 10_000, 400),
        "qty": np.arange(400),
    })
    quotes_pd = pd.DataFrame({
        "sym": rng.integers(0, 5, 300).astype(str),
        "ts": rng.integers(0, 10_000, 300),
        "bid": rng.uniform(0, 100, 300).round(3),
    }).drop_duplicates(["sym", "ts"])

    t_df = spark.createDataFrame(trades_pd)
    q_df = spark.createDataFrame(quotes_pd)
    got = asof_join(t_df, q_df, on="ts", by="sym").toPandas()

    want = pd.merge_asof(
        trades_pd.sort_values("ts", kind="stable"),
        quotes_pd.sort_values("ts", kind="stable"),
        on="ts", by="sym", direction="backward", allow_exact_matches=True,
    )
    g = got.sort_values("qty").reset_index(drop=True)
    w = want.sort_values("qty").reset_index(drop=True)
    assert (g["qty"] == w["qty"]).all()
    gb, wb = g["bid"].fillna(-1), w["bid"].fillna(-1)
    assert (gb == wb).all()


def test_asof_forward_differential_vs_pandas(spark):
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(29)
    trades_pd = pd.DataFrame({
        "sym": rng.integers(0, 4, 300).astype(str),
        "ts": rng.integers(0, 5_000, 300),
        "qty": np.arange(300),
    })
    quotes_pd = pd.DataFrame({
        "sym": rng.integers(0, 4, 250).astype(str),
        "ts": rng.integers(0, 5_000, 250),
        "bid": rng.uniform(0, 50, 250).round(3),
    }).drop_duplicates(["sym", "ts"])

    got = asof_join(
        spark.createDataFrame(trades_pd),
        spark.createDataFrame(quotes_pd),
        on="ts", by="sym", direction="forward",
    ).toPandas()
    want = pd.merge_asof(
        trades_pd.sort_values("ts", kind="stable"),
        quotes_pd.sort_values("ts", kind="stable"),
        on="ts", by="sym", direction="forward", allow_exact_matches=True,
    )
    g = got.sort_values("qty").reset_index(drop=True)
    w = want.sort_values("qty").reset_index(drop=True)
    assert (g["bid"].fillna(-1) == w["bid"].fillna(-1)).all()
