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


def make_sf(src: str, dst: str, factor: int) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    # span of every (table, key) that appears as a key SOURCE
    spans: dict[tuple[str, str], int] = {}
    for offs in OFFSETS.values():
        for _col, src_tbl, src_key in offs:
            if (src_tbl, src_key) not in spans:
                spans[(src_tbl, src_key)] = con.execute(
                    f"SELECT max({src_key}) + 1 FROM '{src}/{src_tbl}.parquet'"
                ).fetchone()[0]
    for tbl in COPY_AS_IS:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{tbl}.parquet') TO "
            f"'{dst}/{tbl}.parquet' (FORMAT parquet, COMPRESSION zstd)"
        )
    for tbl, offs in OFFSETS.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM '{src}/{tbl}.parquet'"
            ).fetchall()
        ]
        off_map = {c: f"({c} + i.i * {spans[(st, k)]})" for c, st, k in offs}
        sel = ", ".join(off_map.get(c, c) + f" AS {c}" for c in cols)
        con.execute(
            f"COPY (SELECT {sel} FROM '{src}/{tbl}.parquet', "
            f"(SELECT unnest(generate_series(0, {factor - 1})) AS i) i "
            f"ORDER BY i.i) TO '{dst}/{tbl}.parquet' "
            f"(FORMAT parquet, COMPRESSION zstd)"
        )
    for tbl in list(OFFSETS) + COPY_AS_IS:
        n_src = con.execute(
            f"SELECT count(*) FROM '{src}/{tbl}.parquet'"
        ).fetchone()[0]
        n_dst = con.execute(
            f"SELECT count(*) FROM '{dst}/{tbl}.parquet'"
        ).fetchone()[0]
        want = n_src * (1 if tbl in COPY_AS_IS else factor)
        assert n_dst == want, (tbl, n_src, n_dst)
        print(f"{tbl}: {n_src} -> {n_dst}")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    make_sf(src, dst, factor)
