"""Profile the way-merge partition kernel outside Spark.

Rebuilds the bench.py way_merge_10k fixture (10k ways x 3-node refs over
~33-version node histories derived from sf0.1 events) as one pandas frame
and runs `_way_partition_kernel` on a way-range slice directly — no JVM, no
Arrow — so cProfile sees the real per-row costs.

Usage: python tools/profile_way_kernel.py [n_ways] [--profile]
"""
from __future__ import annotations

import cProfile
import pstats
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from ohsome_planet_spark.operators.history import _way_partition_kernel


def build_packed(sf_dir: str, n_ways: int) -> pd.DataFrame:
    ev = duckdb.sql(
        f"select event_id, ts, user_id from '{sf_dir}/events.parquet'"
    ).df()
    nid = (ev.event_id % 30000).to_numpy()
    keep = nid < n_ways * 3
    ev = ev[keep].reset_index(drop=True)
    nid = nid[keep]
    ev["nid"] = nid
    ev = ev.sort_values(["nid", "ts", "event_id"], kind="stable").reset_index(drop=True)
    ev["version"] = ev.groupby("nid").cumcount() + 1
    nodes = pd.DataFrame(
        {
            "way_id": (ev.nid // 3).astype(np.int64),
            "kind": "n",
            "version": ev.version.astype(np.int64),
            "ts": ev.ts,
            "changeset": (ev.event_id % 17).astype(np.int64),
            "user_id": ev.user_id.astype(np.int64),
            "user": "u",
            "visible": True,
            "tags": None,
            "refs": None,
            "node_id": ev.nid.astype(np.float64),
            "lon": ((ev.event_id * 7 % 360) - 180.0).astype(np.float64),
            "lat": ((ev.event_id * 11 % 180) - 90.0).astype(np.float64),
        }
    )
    wid = np.arange(n_ways, dtype=np.int64)
    refs = np.empty(n_ways, object)
    for i in range(n_ways):
        refs[i] = [int(3 * i % 30000), int((3 * i + 1) % 30000), int((3 * i + 2) % 30000)]
    tags = np.empty(n_ways, object)
    tags[:] = [{} for _ in range(n_ways)]
    ways = pd.DataFrame(
        {
            "way_id": wid,
            "kind": "w",
            "version": np.int64(1),
            "ts": pd.Timestamp("2020-01-01 00:00:00"),
            "changeset": np.int64(1),
            "user_id": np.int64(1),
            "user": "u",
            "visible": True,
            "tags": tags,
            "refs": refs,
            "node_id": np.nan,
            "lon": np.nan,
            "lat": np.nan,
        }
    )
    return pd.concat([nodes, ways], ignore_index=True)


def main() -> None:
    n_ways = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    do_profile = "--profile" in sys.argv
    pdf = build_packed("/root/testdata/sf0.1", n_ways)
    print(f"packed rows: {len(pdf)} ({n_ways} ways)")
    t0 = time.time()
    out = _way_partition_kernel(pdf)
    warm = time.time() - t0
    print(f"kernel: {warm:.3f}s -> {len(out)} contributions "
          f"({len(out) / warm:.0f} contribs/s)")
    if do_profile:
        pr = cProfile.Profile()
        pr.enable()
        _way_partition_kernel(pdf)
        pr.disable()
        stats = pstats.Stats(pr)
        stats.sort_stats("cumulative").print_stats(30)


if __name__ == "__main__":
    main()
