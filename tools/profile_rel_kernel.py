"""Profile the relation-merge partition kernel outside Spark.

Rebuilds the bench.py relation_merge_1k fixture (1k relations x 3 member
ways x 3-node refs over sf0.1 event-derived node histories) as one pandas
frame and runs the partition kernel body directly.

Usage: python tools/profile_rel_kernel.py [n_rels] [--profile]
"""
from __future__ import annotations

import cProfile
import pstats
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from tools.profile_way_kernel import build_packed


def build_rel_packed(sf_dir: str, n_rels: int) -> pd.DataFrame:
    wp = build_packed(sf_dir, n_rels * 3)  # ways 0..3R with their node rows
    wp["ts"] = wp["ts"].astype("datetime64[ns]")
    nodes = wp[wp.kind == "n"]
    ways = wp[wp.kind == "w"]
    rel_of_way = (ways.way_id // 3).astype(np.int64)
    rel_of_node = (nodes.way_id // 3).astype(np.int64)
    nrows = pd.DataFrame({
        "rel_id": rel_of_node, "kind": "node",
        "member_id": nodes.node_id.astype(np.int64),
        "version": nodes.version, "ts": nodes.ts, "changeset": nodes.changeset,
        "user_id": nodes.user_id, "user": nodes.user, "visible": nodes.visible,
        "tags": None, "refs": None, "lon": nodes.lon, "lat": nodes.lat,
        "rel_member_list": None,
    })
    wrows = pd.DataFrame({
        "rel_id": rel_of_way, "kind": "way",
        "member_id": ways.way_id.astype(np.int64),
        "version": ways.version, "ts": ways.ts, "changeset": ways.changeset,
        "user_id": ways.user_id, "user": ways.user, "visible": ways.visible,
        "tags": ways.tags, "refs": ways.refs, "lon": np.nan, "lat": np.nan,
        "rel_member_list": None,
    })
    rml = np.empty(n_rels, object)
    for r in range(n_rels):
        rml[r] = [
            {"type": "way", "id": 3 * r + j, "role": ""} for j in range(3)
        ]
    tags = np.empty(n_rels, object)
    tags[:] = [{"type": "route"} for _ in range(n_rels)]
    rrows = pd.DataFrame({
        "rel_id": np.arange(n_rels, dtype=np.int64), "kind": "rel",
        "member_id": np.arange(n_rels, dtype=np.int64),
        "version": np.int64(1), "ts": pd.Timestamp("2020-01-02"),
        "changeset": np.int64(1), "user_id": np.int64(1), "user": "u",
        "visible": True, "tags": tags, "refs": None,
        "lon": np.nan, "lat": np.nan, "rel_member_list": rml,
    })
    return pd.concat([nrows, wrows, rrows], ignore_index=True)


def main() -> None:
    n_rels = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    do_profile = "--profile" in sys.argv
    pdf = build_rel_packed("/root/testdata/sf0.1", n_rels)
    print(f"packed rows: {len(pdf)} ({n_rels} rels)")
    from ohsome_planet_spark.operators.history import _relation_partition_kernel

    t0 = time.time()
    out = _relation_partition_kernel(pdf, None)
    warm = time.time() - t0
    print(f"kernel: {warm:.3f}s -> {len(out)} contributions "
          f"({len(out) / warm:.0f} contribs/s)")
    if do_profile:
        pr = cProfile.Profile()
        pr.enable()
        _relation_partition_kernel(pdf, None)
        pr.disable()
        pstats.Stats(pr).sort_stats("cumulative").print_stats(28)


if __name__ == "__main__":
    main()
