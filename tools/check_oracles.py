"""Local stand-in for the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() twin on DuckDB, compare row count,
column names, and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        # vectorized fast path for plain machine ints (r6: the sf1 gate's
        # 20M-row join results are all-int frames; the per-value Python
        # map made the CHECKER the slowest stage of the gate). astype(str)
        # on int64/int32 produces exactly _norm_val's str(int(v)).
        if str(s.dtype) in ("int64", "int32", "int16", "int8"):
            df[c] = s.astype("int64").astype(str)
        else:
            df[c] = s.map(lambda v: _norm_val(v))
    return df.sort_values(by=list(df.columns), kind="stable").reset_index(drop=True)


def _norm_val(v):
    import numpy as np
    import datetime
    import decimal

    if v is None or (isinstance(v, float) and v != v):
        return "<null>"
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_norm_val(x) for x in v) + "]"
    if isinstance(v, (np.integer,)):
        return str(int(v))
    if isinstance(v, decimal.Decimal):
        return str(v.normalize())
    if isinstance(v, (np.floating, float)):
        return repr(float(v))
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        return pd.Timestamp(v).isoformat()
    return str(v)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from ohsome_planet_spark.session import get_spark

    spark = get_spark(app_name="check-oracles", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        # make_sf fixtures (r6) are multi-file directories; the driver's
        # testdata fixtures are single files — register either layout
        p = f"{sf_dir}/{t}.parquet"
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet({src})")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append((name, f"spark error: {e}"))
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows-only) — {len(sdf)} rows")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append((name, f"duckdb error: {e}"))
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            failures.append((name, f"columns {sorted(sdf.columns)} vs {sorted(odf.columns)}"))
            print(f"FAIL {name}: column mismatch {sorted(sdf.columns)} vs {sorted(odf.columns)}")
            continue
        if len(sdf) != len(odf):
            failures.append((name, f"rowcount {len(sdf)} vs {len(odf)}"))
            print(f"FAIL {name}: rowcount {len(sdf)} vs {len(odf)}")
            continue
        a = normalize(sdf)
        b = normalize(odf)
        if not a.equals(b):
            diff_mask = (a != b).any(axis=1)
            print(f"FAIL {name}: value mismatch, first diffs:")
            print(pd.concat([a[diff_mask].head(3), b[diff_mask].head(3)], keys=["spark", "duck"]))
            failures.append((name, "value mismatch"))
            continue
        print(f"OK   {name}: {len(sdf)} rows")
    spark.stop()
    print(f"\n{len(failures)} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
