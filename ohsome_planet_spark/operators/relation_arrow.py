"""Array-cursor relation merge: the relation twin of history_arrow.

Same semantics as the dict kernel (`history._relation_partition_kernel`,
mirroring `Contributions2Parquet.processRelation:233-266` — member ways
resolve through their own merged contribution streams over shared node
cursors, then the relation merges over (type, id, role) member streams),
with the round-4 way-kernel machinery applied end to end:

* node member feeds run through the VECTORIZED minor-node store filter
  (`history_arrow._minor_node_keep_mask`) — no per-row dicts;
* every inner way merge is a `_merge_walk` emitting integer buffers (the
  way's raw contribution stream is four int arrays, not a list of dicts
  with per-member snapshot lists);
* the relation-level walk runs over ENCODED member positions: a node
  snapshot is its global partition row, a way snapshot is `n + j` where j
  is the partition-wide way-contribution ordinal — one int per member per
  contribution;
* ALL way-snapshot geometries of the partition batch through ONE
  `batch_geometries` + `batch_gc_moments` pass (the `_MemberEntryBatch`
  work, without ever materializing the snapshots it used to scan);
* only the relation-level raw contributions (the small output side)
  materialize as dicts, feeding the UNCHANGED `convert_relation_
  contributions` converter via pre-resolved member entries.

The dict kernel stays as the cross-check twin; tests/test_relation_arrow.py
pins row equality on adversarial fixtures, and the relation_history /
relation_geom_history / relation_mp_history / contributions_e2e oracles
value-check the Spark path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions import geometry_np as gnp
from ..functions.waygeom import is_area
from .history import (
    VALID_TO_SENTINEL_NS,
    _KIND_NAME,
    batch_gc_moments,
    batch_geometries,
    convert_relation_contributions,
)
from .history_arrow import _AHist, _merge_walk, _minor_node_keep_mask


def _empty_entry() -> dict:
    return {"gc": None, "mg": (None, None), "bbox": None, "mom": None,
            "coords": None}


def _node_entry(g: int, vis_a, lon_a, lat_a) -> dict:
    """`_member_entry` node branch over a global row (history.py)."""
    from .history import _gc_moments
    from ..functions.wkb import wkb_dumps

    e = _empty_entry()
    lon = float(lon_a[g])
    lat = float(lat_a[g])
    if (vis_a[g] and not np.isnan(lon) and not np.isnan(lat)
            and -180.0 <= lon <= 180.0 and -90.0 <= lat <= 90.0):
        gpt = ("Point", (lon, lat))
        e["gc"] = gpt
        e["mg"] = ("Point", wkb_dumps(gpt))
        e["bbox"] = gnp.bbox(np.asarray([lon]), np.asarray([lat]))
        e["mom"] = _gc_moments("Point", gpt[1])
    else:
        e["mg"] = ("Point", wkb_dumps(("Point", None)))
    return e


def relation_partition_kernel(pdf: pd.DataFrame, joiner=None):
    """One partition of the relation merge — array path."""
    pdf = pdf.sort_values(
        ["rel_id", "kind", "member_id", "version", "ts"], kind="stable"
    )
    rel_a = pdf["rel_id"].to_numpy()
    kind_a = pdf["kind"].to_numpy()
    mid_a = pdf["member_id"].to_numpy()
    ver_a = pdf["version"].to_numpy()
    ts_ns = pdf["ts"].to_numpy().view("i8")
    cs_a = pdf["changeset"].to_numpy()
    uid_a = pdf["user_id"].to_numpy()
    user_a = pdf["user"].to_numpy()
    vis_a = pdf["visible"].to_numpy()
    tags_a = pdf["tags"].to_numpy()
    refs_a = pdf["refs"].to_numpy()
    lon_a = pdf["lon"].to_numpy().astype(np.float64, copy=False)
    lat_a = pdf["lat"].to_numpy().astype(np.float64, copy=False)
    rml_a = pdf["rel_member_list"].to_numpy()
    n = len(pdf)
    if not n:
        return None
    ts_l = ts_ns.tolist()
    cs_l = cs_a.tolist()

    is_node = kind_a == "node"
    is_way = kind_a == "way"
    is_rel = kind_a == "rel"

    # ----- node member feeds: vectorized minor filter + per-segment cursors
    node_rows = np.nonzero(is_node)[0]
    if node_rows.size:
        nv = vis_a[node_rows].astype(bool)
        nlon = lon_a[node_rows]
        nlat = lat_a[node_rows]
        seg_new = np.ones(node_rows.size, bool)
        seg_new[1:] = (
            (np.diff(node_rows) != 1)
            | (mid_a[node_rows[1:]] != mid_a[node_rows[:-1]])
            | (rel_a[node_rows[1:]] != rel_a[node_rows[:-1]])
        )
        keep_mask = _minor_node_keep_mask(node_rows, seg_new, nv, nlon, nlat)
        kept_m = np.nonzero(keep_mask)[0]
        kept_g = node_rows[kept_m]
        seg_ord = np.cumsum(seg_new) - 1
        kept_seg = seg_ord[kept_m]
        kch = np.ones(kept_m.size, bool)
        kch[1:] = kept_seg[1:] != kept_seg[:-1]
        kseg_starts = np.nonzero(kch)[0]
        kseg_ends = np.append(kseg_starts[1:], kept_m.size)
        kseg_nid = mid_a[kept_g[kseg_starts]] if kept_m.size else np.zeros(0)
        kept_g_l = kept_g.tolist()
        kept_keys = list(zip(ts_ns[kept_g].tolist(), cs_a[kept_g].tolist()))
    else:
        kept_g = np.zeros(0, np.int64)
        kseg_starts = kseg_ends = np.zeros(0, np.int64)
        kseg_nid = np.zeros(0)
        kept_g_l = []
        kept_keys = []

    # ----- per-row python values for way/rel majors, built lazily & cached
    refs_cache: dict[int, list] = {}
    tags_cache: dict[int, dict] = {}

    def refs_of(g: int) -> list:
        r = refs_cache.get(g)
        if r is None:
            raw = refs_a[g]
            r = refs_cache[g] = (
                [int(x) for x in raw] if raw is not None else [])
        return r

    def tags_of(g: int) -> dict:
        t = tags_cache.get(g)
        if t is None:
            raw = tags_a[g]
            t = tags_cache[g] = dict(raw) if raw is not None else {}
        return t

    # ----- walk every relation: inner way streams + the relation stream
    cuts = np.nonzero(rel_a[1:] != rel_a[:-1])[0] + 1
    e_starts = np.concatenate([[0], cuts]).tolist()
    e_ends = np.concatenate([cuts, [n]]).tolist()
    way_pfx = np.concatenate([[0], np.cumsum(is_way)])
    rel_pfx = np.concatenate([[0], np.cumsum(is_rel)])
    node_pfx = np.concatenate([[0], np.cumsum(is_node)])

    # partition-wide way-contribution buffers (encoded ids are n + ordinal)
    ws_maj: list[int] = []
    ws_open: list[int] = []
    ws_last: list[int] = []
    ws_mem: list[int] = []
    _scratch_elem: list[int] = []
    # relation-level buffers
    rl_maj: list[int] = []
    rl_open: list[int] = []
    rl_last: list[int] = []
    rl_mem: list[int] = []
    _rl_elem: list[int] = []
    rel_slices: list[tuple[int, int, int, list]] = []  # rel_id, lo, hi, mem_off

    for s, e in zip(e_starts, e_ends):
        n_node = int(node_pfx[e] - node_pfx[s])
        n_rel = int(rel_pfx[e] - rel_pfx[s])
        n_way = int(way_pfx[e] - way_pfx[s])
        if not n_rel:
            continue
        rel_lo = s + n_node
        way_lo = rel_lo + n_rel
        # node cursors of this relation, keyed by node id
        a = int(np.searchsorted(kept_g, s, "left"))
        b = int(np.searchsorted(kept_g, e, "left"))
        node_hists: dict[int, tuple[list, list]] = {}
        if a < b:
            t0 = int(np.searchsorted(kseg_starts, a, "right")) - 1
            t1 = int(np.searchsorted(kseg_starts, b, "left"))
            for t in range(t0, t1):
                ka, kb = int(kseg_starts[t]), int(kseg_ends[t])
                node_hists[int(kseg_nid[t])] = (
                    kept_g_l[ka:kb], kept_keys[ka:kb])

        # inner way merges → encoded streams
        way_streams: dict[int, tuple[list, list]] = {}  # wid -> (enc, keys)
        if n_way:
            wcut = np.nonzero(
                mid_a[way_lo + 1:e] != mid_a[way_lo:e - 1])[0] + 1
            wstarts = np.concatenate([[0], wcut]) + way_lo
            wends = np.append(wstarts[1:], e)
            for ws, we in zip(wstarts.tolist(), wends.tolist()):
                ords = list(range(ws, we))
                ords.sort(key=lambda g: (ver_a[g], ts_l[g]))
                # minor-way store filter (`MinorWay.java:76-91`): invisible
                # always recorded (resets state), visible iff refs changed
                filt: list[int] = []
                last_refs: list = []
                for g in ords:
                    if not vis_a[g]:
                        filt.append(g)
                        last_refs = []
                    elif refs_of(g) != last_refs:
                        filt.append(g)
                        last_refs = refs_of(g)
                if not filt:
                    continue
                fresh = {
                    nid: _AHist(idx, keys)
                    for nid, (idx, keys) in node_hists.items()
                }
                base = len(ws_maj)
                _merge_walk(
                    filt,
                    [ts_l[g] for g in filt],
                    [cs_l[g] for g in filt],
                    [refs_of(g) for g in filt],
                    fresh, 0, _scratch_elem, ws_maj, ws_open, ws_last, ws_mem,
                )
                count = len(ws_maj) - base
                enc = list(range(n + base, n + base + count))
                keys = [
                    (ts_l[ws_last[base + p]], cs_l[ws_open[base + p]])
                    for p in range(count)
                ]
                way_streams[int(mid_a[ws])] = (enc, keys)

        # relation-level walk over (type, id, role) member streams
        rords = list(range(rel_lo, way_lo))
        rords.sort(key=lambda g: (ver_a[g], ts_l[g]))
        maj_refs = []
        for g in rords:
            rml = rml_a[g]
            maj_refs.append(
                [(m["type"], int(m["id"]), m["role"] or "")
                 for m in (rml if rml is not None else [])])
        hists: dict = {}
        for mrefs in maj_refs:
            for trip in mrefs:
                if trip in hists:
                    continue
                mtype, mid, _role = trip
                if mtype == "way" and mid in way_streams:
                    enc, keys = way_streams[mid]
                    hists[trip] = _AHist(enc, keys)
                elif mtype == "node" and mid in node_hists:
                    idx, keys = node_hists[mid]
                    hists[trip] = _AHist(idx, keys)
        lo = len(rl_maj)
        _merge_walk(
            rords,
            [ts_l[g] for g in rords],
            [cs_l[g] for g in rords],
            maj_refs, hists, 0, _rl_elem, rl_maj, rl_open, rl_last, rl_mem,
        )
        rel_slices.append((int(rel_a[s]), lo, len(rl_maj), maj_refs, rords))

    if not rl_maj:
        return None

    # ----- batch ALL way-snapshot geometry of the partition in one pass
    n_ws = len(ws_maj)
    if n_ws:
        wmaj = np.asarray(ws_maj, np.int64)
        nref = np.asarray([len(refs_of(int(g))) for g in wmaj], np.int64)
        moff = np.concatenate([[0], np.cumsum(nref)])
        mem = np.asarray(ws_mem, np.int64)
        okm = mem >= 0
        gsafe = np.where(okm, mem, 0)
        ml = np.where(okm, lon_a[gsafe], np.nan)
        mt = np.where(okm, lat_a[gsafe], np.nan)
        mvv = okm & vis_a[gsafe].astype(bool)
        isarea_w = np.asarray([
            is_area(tags_of(int(g)), refs_of(int(g))[0] if refs_of(int(g)) else -1,
                    refs_of(int(g))[-1] if refs_of(int(g)) else -2,
                    len(refs_of(int(g))))
            for g in wmaj], bool)
        geo = batch_geometries(nref, isarea_w, ml, mt, mvv)
        moments = batch_gc_moments(geo)
        xs, ys, voff = geo["xs"], geo["ys"], geo["voff"]
        way_entries: list[dict] = []
        for j in range(n_ws):
            kname = _KIND_NAME[geo["kind"][j]]
            s0, e0 = int(voff[j]), int(voff[j + 1])
            coords = np.column_stack([xs[s0:e0], ys[s0:e0]])
            entry = {"gc": None, "mg": (kname, geo["wkb"][j]),
                     "bbox": None, "mom": None, "coords": coords}
            if not geo["empty"][j]:
                if kname == "Point":
                    data = (float(xs[s0]), float(ys[s0]))
                elif kname == "Polygon":
                    data = [coords]
                else:
                    data = coords
                entry["gc"] = (kname, data)
                entry["bbox"] = (float(geo["xmin"][j]), float(geo["ymin"][j]),
                                 float(geo["xmax"][j]), float(geo["ymax"][j]))
                entry["mom"] = moments[j]
            way_entries.append(entry)
    else:
        way_entries = []

    node_entries: dict[int, dict] = {}

    def entry_of(enc: int):
        if enc < 0:
            return None
        if enc >= n:
            return way_entries[enc - n]
        e = node_entries.get(enc)
        if e is None:
            e = node_entries[enc] = _node_entry(enc, vis_a, lon_a, lat_a)
        return e

    # ----- decode the relation buffers and convert (unchanged converter)
    enc_open = np.concatenate(
        [np.arange(n, dtype=np.int64),
         np.asarray(ws_open, np.int64)]) if n_ws else np.arange(n, dtype=np.int64)
    enc_last = np.concatenate(
        [np.arange(n, dtype=np.int64),
         np.asarray(ws_last, np.int64)]) if n_ws else np.arange(n, dtype=np.int64)
    r_open = enc_open[np.asarray(rl_open, np.int64)]
    r_last = enc_last[np.asarray(rl_last, np.int64)]
    r_ts = ts_ns[r_last]
    r_cs = cs_a[r_open]
    r_uid = uid_a[r_open]

    # partition-wide flat offsets of rl_mem: contribution k carries
    # len(refs-of-its-major) encoded member positions, in walk order
    n_rl = len(rl_maj)
    rl_cnt = np.empty(n_rl, np.int64)
    for _rel_id, lo, hi, maj_refs, rords in rel_slices:
        pos = {g: i for i, g in enumerate(rords)}
        for k in range(lo, hi):
            rl_cnt[k] = len(maj_refs[pos[rl_maj[k]]])
    rl_off = np.concatenate([[0], np.cumsum(rl_cnt)])

    out_rows: list[dict] = []
    for rel_id, lo, hi, maj_refs, rords in rel_slices:
        pos = {g: i for i, g in enumerate(rords)}
        raw: list[dict] = []
        for k in range(lo, hi):
            g = rl_maj[k]
            mrefs = maj_refs[pos[g]]
            o0 = int(rl_off[k])
            raw.append({
                "ts": int(r_ts[k]),
                "changeset": int(r_cs[k]),
                "user_id": int(r_uid[k]),
                "user": user_a[r_open[k]],
                "version": int(ver_a[g]),
                "visible": bool(vis_a[g]),
                "tags": tags_of(int(g)),
                "refs": mrefs,
                "rel_members": [
                    {
                        "type": trip[0],
                        "id": trip[1],
                        "role": trip[2],
                        "entry": entry_of(rl_mem[o0 + t]),
                    }
                    for t, trip in enumerate(mrefs)
                ],
            })
        out_rows.extend(convert_relation_contributions(
            rel_id, raw, country_join=joiner,
            valid_to_sentinel=VALID_TO_SENTINEL_NS,
        ))
    return _finalize_rows(out_rows)


def _finalize_rows(out_rows: list[dict]):
    """dict rows → pandas with exact int64-ns → datetime64 conversion (the
    int/None mix must never pass through float64 — see the dict kernel)."""
    if not out_rows:
        return None
    nat = np.iinfo(np.int64).min
    n_out = len(out_rows)
    vf = np.fromiter((r["valid_from"] for r in out_rows),
                     np.int64, n_out).view("M8[ns]")
    vt = np.fromiter((r["valid_to"] for r in out_rows),
                     np.int64, n_out).view("M8[ns]")
    le = np.fromiter(
        (r["osm_last_edit"] if r["osm_last_edit"] is not None else nat
         for r in out_rows), np.int64, n_out).view("M8[ns]")
    pdf_out = pd.DataFrame(out_rows)
    pdf_out["valid_from"] = vf
    pdf_out["valid_to"] = vt
    pdf_out["osm_last_edit"] = le
    return pdf_out
