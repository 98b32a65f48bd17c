"""Rolling trailing-window aggregates (operators/rolling.py)."""

from pyspark.sql import functions as F

from ohsome_planet_spark.operators.rolling import rolling_counts


def test_rolling_counts_hand_computed(spark):
    rows = [
        (1, 0, 10), (2, 100, 20), (3, 3600, 30),   # user A
        (4, 3700, 40), (5, 7300, 50),
        (6, 50, 7),                                 # user B
    ]
    df = spark.createDataFrame(
        [(i, "A" if i <= 5 else "B", t, v) for i, t, v in rows],
        "event_id long, user_id string, ts long, v long")
    out = {r["event_id"]: (r["n_in_window"], r["v_in_window"])
           for r in rolling_counts(df, by="user_id", window_seconds=3600,
                                   sum_cols=["v"]).collect()}
    # t=3600 window [0, 3600] includes t=0 (inclusive both ends)
    assert out[1] == (1, 10)
    assert out[2] == (2, 30)
    assert out[3] == (3, 60)
    # t=3700 window [100, 3700] drops t=0
    assert out[4] == (3, 90)
    # t=7300 window [3700, 7300] keeps only t=3700 and itself
    assert out[5] == (2, 90)
    assert out[6] == (1, 7)


def test_rolling_counts_timestamps_match_numeric(spark):
    from pyspark.sql import functions as F

    rows = [(i, i % 3, (i * 37) % 500) for i in range(200)]
    num = spark.createDataFrame(rows, "event_id long, user_id long, ts long")
    tsd = num.withColumn("ts", F.timestamp_seconds(F.col("ts")))
    a = {r["event_id"]: r["n_in_window"]
         for r in rolling_counts(num, window_seconds=100).collect()}
    b = {r["event_id"]: r["n_in_window"]
         for r in rolling_counts(tsd, window_seconds=100).collect()}
    assert a == b


def test_single_shuffle_zero_udf(spark):
    rows = [(1, 1, 5)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts long")
    plan = rolling_counts(df, sum_cols=[])._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_decayed_counts_hand_computed(spark):
    import math

    from ohsome_planet_spark.operators.rolling import decayed_counts

    rows = [  # numeric time domain: now=1000, half-life 100
        (1, "a", 1000.0),   # age 0   -> 1.0
        (2, "a", 900.0),    # age 100 -> 0.5
        (3, "a", 800.0),    # age 200 -> 0.25
        (4, "b", 0.0),      # age 1000 -> 2^-10
    ]
    df = spark.createDataFrame(rows, "event_id long, domain string, ts double")
    out = {r["domain"]: r for r in
           decayed_counts(df, now="1000", half_life_s=100,
                          id_col="event_id").collect()}
    # Spark rounds HALF_UP; Python's round() is banker's — replay with
    # decimal HALF_UP (the b-row hits an EXACT tie: 2^-10 has a trailing
    # 5 at the 10th decimal)
    from decimal import ROUND_HALF_UP, Decimal

    r = lambda x, n: float(Decimal(x).quantize(Decimal(f"1e-{n}"),
                                               rounding=ROUND_HALF_UP))
    rate = -math.log(2.0) / 100.0
    want_a = sum(r(math.exp(a * rate), 12) for a in (0.0, 100.0, 200.0))
    assert out["a"]["n_events"] == 3
    assert out["a"]["decayed_score"] == r(want_a, 9)
    assert out["b"]["decayed_score"] == r(r(math.exp(1000 * rate), 12), 9)
    # recency dominance: 3 recent events beat 1 ancient one by far
    assert out["a"]["decayed_score"] > 100 * out["b"]["decayed_score"]


def test_rolling_counts_microsecond_peers(spark):
    """r5 sf1 regression: two events of one user in the SAME whole second
    but different microseconds must NOT be range peers — the frame key is
    µs-exact, like a SQL RANGE INTERVAL frame."""
    from ohsome_planet_spark.operators.rolling import rolling_counts

    rows = [
        (1, 7, "2024-01-01 10:00:00.100000", 5),
        (2, 7, "2024-01-01 10:00:00.300000", 5),   # same second, later µs
        (3, 7, "2024-01-01 11:00:00.200000", 5),   # 3599.9s after #2: in
        (4, 7, "2024-01-01 11:00:00.400000", 5),   # 3600.1s after #2: out
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts string, points long") \
        .withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = {r["event_id"]: r["n_in_window"]
           for r in rolling_counts(df, window_seconds=3600,
                                   sum_cols=["points"]).collect()}
    # row 1: itself only. row 2: row 1 (0.2s earlier) + itself. row 3:
    # row 1 is 3600.1s before (OUT at µs precision — a whole-second key
    # would have included it), row 2 is 3599.9s before (IN) + itself.
    # row 4: row 2 is 3600.1s before (OUT), row 3 (IN) + itself.
    assert out == {1: 1, 2: 2, 3: 2, 4: 2}
