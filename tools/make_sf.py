"""Synthesize a larger SF directory from an existing one, deterministically.

Usage:
    python tools/make_sf.py [SRC_DIR] [DST_DIR] [FACTOR]

Defaults: /root/testdata/sf0.1 -> /tmp/spark_graft_sf1 x10 (the r4-verdict
item-5 "sf1 soak" input: all oracles run at sf0.01 and bench at sf0.1; this
gives a 10M-page / 6M-lineitem directory to surface memory/shuffle cliffs
the small factors hide).

Method: each fact table is replicated FACTOR times with every primary AND
foreign key offset by copy_index * (max_key+1) of its table, so referential
integrity is preserved exactly (copy 0 is byte-identical to the source).
Dimension tables (region, nation) are copied as-is. The result is fully
deterministic — no RNG anywhere. DuckDB does the replication (a single
CROSS JOIN range(FACTOR) scan per table) and writes zstd parquet.

r6 (verdict item 1): fact tables are written as MULTI-FILE directories
(`{dst}/{tbl}.parquet/part*.parquet`, ≥ SPARK_GRAFT_CPUS files) with small
row groups, so Spark scans start with ≥ one-task-per-core parallelism
NATURALLY — the way a real 100 TB table would — instead of needing the
`_t` raw-row repartition floor that taxed every cheap bench row in r5.
Spark reads the directory transparently; DuckDB reads it via
`read_parquet('{tbl}.parquet/*.parquet')` (tools/check_oracles.py handles
both layouts).

r6 (r5 advisor item 5): when FACTOR > 1 an additional `events_dense`
fixture is written — same rows as `events`, but copies share user_ids in
groups of DENSE_K (default min(FACTOR, 10)), with ts broken per-copy by
+copy_index microseconds so (user_id, ts) stays unique. Per-user event
density then GROWS with FACTOR (the plain fixture keeps it constant by
offsetting user_id per copy for oracle tie-determinism), exercising the
denser-per-key regime where window/rolling bugs (r5's rolling_counts
microsecond-peer class) actually live.
"""

from __future__ import annotations

import os
import sys

import duckdb

# table -> list of (column, span_source_table) to offset; span is
# max(key)+1 of the PRIMARY table so offsets line up across tables
OFFSETS: dict[str, list[tuple[str, str, str]]] = {
    "customer": [("c_custkey", "customer", "c_custkey")],
    "supplier": [("s_suppkey", "supplier", "s_suppkey")],
    "part": [("p_partkey", "part", "p_partkey")],
    "orders": [
        ("o_orderkey", "orders", "o_orderkey"),
        ("o_custkey", "customer", "c_custkey"),
    ],
    "lineitem": [
        ("l_orderkey", "orders", "o_orderkey"),
        ("l_partkey", "part", "p_partkey"),
        ("l_suppkey", "supplier", "s_suppkey"),
    ],
    "events": [
        ("event_id", "events", "event_id"),
        # user_id must be offset too: replicated copies sharing (user_id,
        # ts) pairs make range-frame window oracles tie-ambiguous across
        # engines (r5: rolling_counts counted 20 vs 10 at sf1)
        ("user_id", "events", "user_id"),
    ],
    "documents": [("doc_id", "documents", "doc_id")],
    "embeddings": [("vec_id", "embeddings", "vec_id")],
}
COPY_AS_IS = ["region", "nation"]


def _read(path_no_ext: str) -> str:
    """DuckDB source expression for either fixture layout."""
    if os.path.isdir(path_no_ext + ".parquet"):
        return f"read_parquet('{path_no_ext}.parquet/*.parquet')"
    return f"'{path_no_ext}.parquet'"


def make_sf(src: str, dst: str, factor: int,
            files_per_table: int | None = None,
            dense_k: int | None = None) -> None:
    os.makedirs(dst, exist_ok=True)
    if files_per_table is None:
        files_per_table = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    con = duckdb.connect()
    # span of every (table, key) that appears as a key SOURCE
    spans: dict[tuple[str, str], int] = {}
    for offs in OFFSETS.values():
        for _col, src_tbl, src_key in offs:
            if (src_tbl, src_key) not in spans:
                spans[(src_tbl, src_key)] = con.execute(
                    f"SELECT max({src_key}) + 1 FROM {_read(f'{src}/{src_tbl}')}"
                ).fetchone()[0]
    for tbl in COPY_AS_IS:
        con.execute(
            f"COPY (SELECT * FROM {_read(f'{src}/{tbl}')}) TO "
            f"'{dst}/{tbl}.parquet' (FORMAT parquet, COMPRESSION zstd)"
        )

    def replicate(tbl: str, out: str, off_map: dict[str, str]) -> None:
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM {_read(f'{src}/{tbl}')}"
            ).fetchall()
        ]
        sel = ", ".join(off_map.get(c, c) + f" AS {c}" for c in cols)
        n_rows = con.execute(
            f"SELECT count(*) FROM {_read(f'{src}/{tbl}')}"
        ).fetchone()[0] * factor
        # multi-file + small row groups: a Spark scan of the directory
        # starts ≥ one task per core without any repartition; hash on the
        # first offset column spreads each source copy over every file so
        # per-file value ranges stay representative. One COPY per file
        # (deterministic placement; the synthetic bucket column never
        # reaches the files — DuckDB PARTITION_BY would write it).
        part_col = next(iter(off_map), cols[0])
        rg = max(2048, n_rows // (files_per_table * 4))
        outdir = f"{dst}/{out}.parquet"
        os.makedirs(outdir, exist_ok=True)
        con.execute(
            f"CREATE OR REPLACE TEMP VIEW _rep AS "
            f"SELECT {sel}, hash({part_col}) % {files_per_table} AS _f "
            f"FROM {_read(f'{src}/{tbl}')}, "
            f"(SELECT unnest(generate_series(0, {factor - 1})) AS i) i"
        )
        for fv in range(files_per_table):
            con.execute(
                f"COPY (SELECT * EXCLUDE (_f) FROM _rep WHERE _f = {fv}) "
                f"TO '{outdir}/part-{fv:03d}.parquet' "
                f"(FORMAT parquet, COMPRESSION zstd, ROW_GROUP_SIZE {rg})"
            )
        con.execute("DROP VIEW _rep")

    for tbl, offs in OFFSETS.items():
        off_map = {c: f"({c} + i.i * {spans[(st, k)]})" for c, st, k in offs}
        replicate(tbl, tbl, off_map)

    if factor > 1:
        k = dense_k if dense_k is not None else min(factor, 10)
        uspan = spans[("events", "user_id")]
        espan = spans[("events", "event_id")]
        replicate("events", "events_dense", {
            "event_id": f"(event_id + i.i * {espan})",
            "user_id": f"(user_id + (i.i // {k}) * {uspan})",
            "ts": f"(ts + to_microseconds(i.i % {k}))",
        })

    made = list(OFFSETS) + (["events_dense"] if factor > 1 else [])
    for tbl in made + COPY_AS_IS:
        src_tbl = "events" if tbl == "events_dense" else tbl
        n_src = con.execute(
            f"SELECT count(*) FROM {_read(f'{src}/{src_tbl}')}"
        ).fetchone()[0]
        n_dst = con.execute(
            f"SELECT count(*) FROM {_read(f'{dst}/{tbl}')}"
        ).fetchone()[0]
        want = n_src * (1 if tbl in COPY_AS_IS else factor)
        assert n_dst == want, (tbl, n_src, n_dst)
        print(f"{tbl}: {n_src} -> {n_dst}")
    if factor > 1:
        dens = con.execute(
            f"SELECT max(c) FROM (SELECT count(*) AS c FROM "
            f"{_read(f'{dst}/events_dense')} GROUP BY user_id)"
        ).fetchone()[0]
        base = con.execute(
            f"SELECT max(c) FROM (SELECT count(*) AS c FROM "
            f"{_read(f'{src}/events')} GROUP BY user_id)"
        ).fetchone()[0]
        print(f"events_dense max per-user density: {base} -> {dens}")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    make_sf(src, dst, factor)
