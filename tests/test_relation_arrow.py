"""Relation array-kernel parity: the encoded-cursor path must equal the
dict twin row for row (the dict kernel carries the ported reference
scenarios + oracles; these tests pin the rewrite against it)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from ohsome_planet_spark.operators.history import _relation_partition_kernel
from ohsome_planet_spark.operators.relation_arrow import relation_partition_kernel


def _compare(pdf):
    old = _relation_partition_kernel(pdf.copy(), None)
    new = relation_partition_kernel(pdf.copy(), None)
    assert (old is None) == (new is None)
    if old is None:
        return 0
    key = ["osm_id", "osm_version", "valid_from", "changeset"]
    old = old.sort_values(key).reset_index(drop=True)
    new = new.sort_values(key).reset_index(drop=True)
    assert list(old.columns) == list(new.columns)
    assert len(old) == len(new)

    def eq(x, y):
        if isinstance(x, (list, tuple, np.ndarray)) or isinstance(
                y, (list, tuple, np.ndarray)):
            if x is None or y is None:
                return x is None and y is None
            return list(x) == list(y)
        if x is None or y is None:
            return x is None and y is None
        try:
            if pd.isna(x) and pd.isna(y):
                return True
        except (TypeError, ValueError):
            pass
        return x == y

    for col in old.columns:
        a, b = old[col], new[col]
        if str(a.dtype).startswith("float"):
            aa, bb = a.to_numpy(float), b.to_numpy(float)
            assert ((np.isnan(aa) & np.isnan(bb)) | (aa == bb)).all(), col
        else:
            neq = [i for i in range(len(a)) if not eq(a.iloc[i], b.iloc[i])]
            assert not neq, (col, neq[:3], a.iloc[neq[0]] if neq else None,
                             b.iloc[neq[0]] if neq else None)
    return len(old)


def _ts(day: int) -> pd.Timestamp:
    return pd.Timestamp("2020-01-01") + pd.Timedelta(days=day)


def _node(rel, nid, ver, day, cs, vis=True, lon=0.0, lat=0.0):
    return dict(rel_id=rel, kind="node", member_id=nid, version=ver,
                ts=_ts(day), changeset=cs, user_id=9, user="n", visible=vis,
                tags=None, refs=None, lon=lon, lat=lat, rel_member_list=None)


def _way(rel, wid, ver, day, cs, refs, vis=True, tags=None):
    return dict(rel_id=rel, kind="way", member_id=wid, version=ver,
                ts=_ts(day), changeset=cs, user_id=8, user="w", visible=vis,
                tags=tags or {}, refs=refs, lon=np.nan, lat=np.nan,
                rel_member_list=None)


def _rel(rel, ver, day, cs, members, vis=True, tags=None):
    return dict(rel_id=rel, kind="rel", member_id=rel, version=ver,
                ts=_ts(day), changeset=cs, user_id=7, user="r", visible=vis,
                tags=tags or {"type": "multipolygon"}, refs=None,
                lon=np.nan, lat=np.nan, rel_member_list=members)


def m(t, i, role=""):
    return {"type": t, "id": i, "role": role}


def test_relation_arrow_parity_adversarial():
    rows = []
    # relation 1: multipolygon, outer square + inner triangle, node edits
    # between rel versions, a tag-only way edit (minor-way filtered), a
    # deleted+revived way version, a lone-axis node move (minor-node
    # filtered), missing member way 99 and a nested relation member
    for nid, (lon, lat) in enumerate(
            [(0, 0), (10, 0), (10, 10), (0, 10)], start=100):
        rows.append(_node(1, nid, 1, 0, 1, lon=float(lon), lat=float(lat)))
    rows.append(_node(1, 100, 2, 40, 60, lon=1.0, lat=0.0))   # lone-axis: filtered
    rows.append(_node(1, 101, 2, 45, 61, lon=11.0, lat=-1.0))  # real move
    for nid, (lon, lat) in enumerate([(2, 2), (5, 2), (3, 5)], start=200):
        rows.append(_node(1, nid, 1, 0, 2, lon=float(lon), lat=float(lat)))
    rows.append(_way(1, 10, 1, 1, 3, [100, 101, 102, 103, 100]))
    rows.append(_way(1, 10, 2, 50, 62, [100, 101, 102, 103, 100],
                     tags={"touched": "yes"}))  # tag-only: refs unchanged -> filtered
    rows.append(_way(1, 11, 1, 1, 4, [200, 201, 202, 200]))
    rows.append(_way(1, 11, 2, 55, 63, [], vis=False))          # deletion
    rows.append(_way(1, 11, 3, 58, 64, [200, 202, 201, 200]))   # revive, reordered
    rows.append(_rel(1, 1, 2, 5, [m("way", 10, "outer"), m("way", 11, "inner"),
                                  m("way", 99), m("relation", 5, "sub"),
                                  m("node", 100, "admin_centre")]))
    rows.append(_rel(1, 2, 60, 65, [m("way", 10, "outer"),
                                    m("way", 11, "inner")]))

    # relation 2: route (non-MP), direct node members only, deleted rel
    # version carrying geometry forward, duplicate member entries
    rows.append(_node(2, 300, 1, 0, 11, lon=1.5, lat=2.5))
    rows.append(_node(2, 300, 2, 20, 12, lon=2.5, lat=3.5))
    rows.append(_node(2, 301, 1, 0, 11, lon=-4.0, lat=0.5, vis=False))
    rows.append(_node(2, 301, 2, 25, 13, lon=-4.5, lat=1.0))
    rows.append(_rel(2, 1, 1, 14, [m("node", 300), m("node", 301),
                                   m("node", 300)], tags={"type": "route"}))
    rows.append(_rel(2, 2, 30, 15, [], vis=False, tags={}))
    rows.append(_rel(2, 3, 40, 16, [m("node", 300)], tags={"type": "route"}))

    # relation 3: same-changeset rel+member edits (run collapse)
    rows.append(_node(3, 400, 1, 0, 21, lon=0.0, lat=0.0))
    rows.append(_node(3, 400, 2, 10, 22, lon=1.0, lat=1.0))
    rows.append(_way(3, 30, 1, 0, 21, [400]))
    rows.append(_rel(3, 1, 10, 22, [m("way", 30)], tags={"type": "x"}))

    pdf = pd.DataFrame(rows)
    n = _compare(pdf)
    assert n > 10


def test_relation_arrow_parity_bench_shape(sf_dir):
    from tools.profile_rel_kernel import build_rel_packed

    pdf = build_rel_packed(sf_dir, 40)
    assert _compare(pdf) > 100


def test_relation_arrow_parity_randomized():
    import random

    rng = random.Random(7)
    rows = []
    nid = 1000
    for rel in range(1, 25):
        n_nodes = rng.randint(0, 6)
        node_ids = list(range(nid, nid + n_nodes))
        nid += n_nodes
        for node in node_ids:
            lon, lat = rng.uniform(-5, 5), rng.uniform(-5, 5)
            for v in range(1, rng.randint(1, 5)):
                kind = rng.random()
                vis = kind > 0.15
                if kind > 0.7:
                    lon += rng.uniform(0.1, 1)
                    lat += rng.uniform(0.1, 1)
                elif kind > 0.5:
                    lon += rng.uniform(0.1, 1)  # lone axis
                rows.append(_node(rel, node, v, v * 7 + rng.randint(0, 30),
                                  rng.choice([3, 4, rel * 10]), vis=vis,
                                  lon=lon, lat=lat))
        wids = list(range(rel * 100, rel * 100 + rng.randint(0, 3)))
        for wid in wids:
            for v in range(1, rng.randint(1, 4)):
                vis = rng.random() > 0.2
                refs = (rng.sample(node_ids, min(len(node_ids),
                                                 rng.randint(1, 4)))
                        if node_ids and vis else [])
                rows.append(_way(rel, wid, v, v * 11 + rng.randint(0, 20),
                                 rng.choice([5, 6, rel * 10]), refs, vis=vis,
                                 tags={"t": str(v)} if rng.random() > 0.5 else {}))
        for v in range(1, rng.randint(2, 4)):
            members = []
            for wid in wids:
                if rng.random() > 0.3:
                    members.append(m("way", wid,
                                     rng.choice(["outer", "inner", ""])))
            for node in node_ids[:2]:
                if rng.random() > 0.5:
                    members.append(m("node", node))
            if rng.random() > 0.8:
                members.append(m("way", 99999))  # missing
            rows.append(_rel(rel, v, v * 13 + rng.randint(0, 10),
                             rng.choice([8, rel * 10]), members,
                             vis=rng.random() > 0.15,
                             tags=rng.choice([{"type": "multipolygon"},
                                              {"type": "route"}, {}])))
    pdf = pd.DataFrame(rows)
    assert _compare(pdf) > 40
