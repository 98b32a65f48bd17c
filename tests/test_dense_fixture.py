"""High-density fixture coverage (r6, r5-advice item 5).

The plain make_sf replication offsets user_id per copy for oracle
tie-determinism, which keeps per-user event density CONSTANT as FACTOR
grows — so the sf1 soak never entered the denser-per-key regime where
window/rolling defects live (r5's rolling_counts microsecond-peer bug
only appears at higher per-key density). make_sf now also emits an
`events_dense` fixture whose copies SHARE user_ids in groups of K (ts
broken per copy by +copy µs). This test runs the window-family oracle
queries cross-engine on that dense fixture: per-user density is 12× the
base here, so range-frame peers, session gaps, and decay windows are
exercised with long per-key runs.
"""

from __future__ import annotations

import os
import shutil

import duckdb
import pytest

from tools.check_oracles import normalize
from tools.make_sf import make_sf

SRC = "/root/testdata/sf0.001"
FACTOR = 12  # dense_k = min(FACTOR, 10) -> density grows 10x, plus 2 offset copies

WINDOW_QUERIES = [
    "rolling_counts",       # range-frame window (the r5 bug class)
    "validity_window",      # lead/lag validity
    "sessionize",           # gap-based sessions
    "decayed_popularity",   # time-decayed score
    "version_numbering",    # row_number per key
]


@pytest.fixture(scope="module")
def dense_dir(tmp_path_factory):
    base = tmp_path_factory.mktemp("dense_sf")
    built = str(base / "built")
    make_sf(SRC, built, FACTOR)
    # expose the DENSE events as the directory's `events` table so the
    # existing queries()/oracle_sql() pairs run on it unchanged
    swapped = str(base / "swapped")
    os.makedirs(swapped)
    for name in os.listdir(built):
        src = os.path.join(built, name)
        dst = os.path.join(swapped, name)
        if name == "events.parquet":
            continue
        if name == "events_dense.parquet":
            dst = os.path.join(swapped, "events.parquet")
        if os.path.isdir(src):
            shutil.copytree(src, dst)
        else:
            shutil.copy(src, dst)
    return swapped


@pytest.mark.parametrize("name", WINDOW_QUERIES)
def test_window_oracles_at_high_density(spark, dense_dir, name):
    import __spark_entry__ as entrymod

    fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    sdf = fn(spark, dense_dir).toPandas()
    con = duckdb.connect()
    for t in ("events", "documents", "embeddings", "orders", "lineitem",
              "customer", "supplier", "part", "region", "nation"):
        p = f"{dense_dir}/{t}.parquet"
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet({src})")
    odf = con.sql(sql).df()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf) > 0
    assert normalize(sdf).equals(normalize(odf)), f"{name} values diverge"


def test_density_actually_grew(dense_dir):
    con = duckdb.connect()
    dense = con.sql(
        f"SELECT max(c) FROM (SELECT count(*) AS c FROM "
        f"read_parquet('{dense_dir}/events.parquet/*.parquet') "
        f"GROUP BY user_id)").fetchone()[0]
    base = con.sql(
        f"SELECT max(c) FROM (SELECT count(*) AS c FROM "
        f"'{SRC}/events.parquet' GROUP BY user_id)").fetchone()[0]
    assert dense >= 10 * base
