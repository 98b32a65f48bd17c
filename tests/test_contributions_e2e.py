"""End-to-end contributions plan: fixture PBF → node/way/relation merge →
changeset join → country join → status-partitioned GeoParquet, one call
(`Contributions2Parquet.call` parity, VERDICT r1 item 8)."""

import json

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ohsome_planet_spark.plans.contributions import (
    contributions,
    contributions_to_parquet,
)
from ohsome_planet_spark.sources.pbf import write_osm_pbf


def ms(s):
    return s * 1000


@pytest.fixture(scope="module")
def fixture_pbf(tmp_path_factory):
    """20k nodes + 200 ways + 20 relations, deterministic.

    Node i: v1 @t=i (cs i%13); every 10th node gets a v2 move @t=100000+i;
    every 97th node v2 is a deletion instead. Ways reference 100-node
    stripes; relations pair consecutive ways as type=multipolygon (closed
    squares) or type=route.
    """
    n_nodes = 20000
    nodes = []
    for i in range(n_nodes):
        lon = (i % 3600) / 10.0 - 180.0
        lat = (i % 1700) / 10.0 - 85.0
        nodes.append(
            {"id": i, "version": 1, "ts_ms": ms(i + 1), "changeset": i % 13,
             "uid": i % 50, "user": f"u{i % 50}", "visible": True,
             "tags": {"name": f"n{i}"} if i % 5 == 0 else {},
             "lon": lon, "lat": lat}
        )
        if i % 10 == 0:
            nodes.append(
                {"id": i, "version": 2, "ts_ms": ms(100000 + i), "changeset": 7000 + i % 11,
                 "uid": i % 50, "user": f"u{i % 50}", "visible": i % 97 != 0,
                 "tags": {}, "lon": lon + 0.01, "lat": lat + 0.01}
            )
    ways = []
    for w in range(200):
        refs = [w * 100 + j for j in range(5)]
        ways.append(
            {"id": w, "version": 1, "ts_ms": ms(50000 + w), "changeset": 5000 + w % 7,
             "uid": w % 50, "user": f"u{w % 50}", "visible": True,
             "tags": {"highway": "path"}, "refs": refs}
        )
    relations = [
        {"id": r, "version": 1, "ts_ms": ms(60000 + r), "changeset": 6000 + r % 5,
         "uid": r % 50, "user": f"u{r % 50}", "visible": True,
         "tags": {"type": "route"},
         "members": [("way", 2 * r, ""), ("way", 2 * r + 1, "")]}
        for r in range(20)
    ]
    p = tmp_path_factory.mktemp("pbf") / "fixture_20k.osm.pbf"
    write_osm_pbf(p, nodes, ways, relations, nodes_per_block=4096)
    return p


def test_contributions_end_to_end(spark, fixture_pbf, tmp_path):
    changesets = spark.createDataFrame(
        [(c, pd.Timestamp(c * 1000, unit="s").to_pydatetime(), None, c * 2,
          {"created_by": "editorX", "comment": f"#fix{c % 3}"})
         for c in range(0, 13)],
        "id long, created_at timestamp_ntz, closed_at timestamp_ntz, "
        "num_changes int, tags map<string,string>",
    )
    out = tmp_path / "contributions"
    counts = contributions_to_parquet(
        spark, fixture_pbf, out, changesets=changesets
    )
    # node population: 20k v1 rows; 2k have a v2 → v1 becomes history;
    # v2 deletions: i%10==0 and i%97==0 → i%970==0 → 21 of the 2000
    n_del = len([i for i in range(0, 20000, 10) if i % 97 == 0])
    assert n_del == 21
    # ways: 200 elements; relations: 20 — all get minor versions from node
    # moves; every element's last row is latest (none deleted)
    assert counts["deleted"] == n_del
    assert counts["latest"] + counts["history"] + counts["deleted"] + counts["invalid"] == (
        spark.read.parquet(str(out)).count()
    )
    back = spark.read.parquet(str(out))
    assert back.where(F.col("osm_type") == "node").select("osm_id").distinct().count() == 20000
    assert back.where(F.col("osm_type") == "way").select("osm_id").distinct().count() == 200
    assert back.where(F.col("osm_type") == "relation").select("osm_id").distinct().count() == 20
    # manifest parity
    assert json.loads((out / "_counts.json").read_text()) == counts
    # changeset join landed (J3): node v1 changesets 0..12 all covered
    ed = back.where((F.col("osm_type") == "node") & (F.col("osm_version") == 1))
    assert ed.where(F.col("changeset_editor") == "editorX").count() == 20000
    # sample hash-match: a specific node's full history
    sample = back.where((F.col("osm_type") == "node") & (F.col("osm_id") == 970)).orderBy(
        "osm_edits"
    ).collect()
    assert [r["osm_version"] for r in sample] == [1, 2]
    assert sample[0]["status"] == "history" and sample[1]["status"] == "deleted"
    assert sample[1]["contrib_type"] == "DELETION"
    # deleted row carries the v1 geometry forward (W9)
    assert sample[1]["geometry"] == sample[0]["geometry"]


def test_contributions_tag_filter_and_countries(spark, fixture_pbf):
    from ohsome_planet_spark.sources.countries import fixture_features

    contribs = contributions(
        spark,
        fixture_pbf,
        country_features=fixture_features(),
        include_tag_keys=["highway"],
        keep_untagged=False,
        entity_types=("node", "way"),
    )
    rows = contribs.select("osm_type", "countries").groupBy("osm_type").count().collect()
    got = {r["osm_type"]: r["count"] for r in rows}
    # untagged + non-highway nodes dropped entirely; all 200 ways kept
    assert "node" not in got
    assert got["way"] >= 200
    # PIP join produced sorted country arrays on at least some ways
    hit = contribs.where(F.size("countries") > 0).count()
    assert hit > 0


def test_avsc_view_shape(spark, fixture_pbf):
    """Output-shape parity with contrib.avsc (nested structs + build_time)."""
    from ohsome_planet_spark.plans.export import avsc_view

    contribs = contributions(spark, fixture_pbf, entity_types=("node", "way", "relation"))
    v = avsc_view(contribs, build_time_ms=1234)
    assert v.columns == [
        "status", "valid_from", "valid_to", "osm_type", "osm_id", "osm_version",
        "osm_minor_version", "osm_edits", "osm_last_edit", "user", "tags",
        "tags_before", "changeset", "bbox", "centroid", "xzcode",
        "geometry_type", "geometry", "area", "area_delta", "length",
        "length_delta", "contrib_type", "refs", "members", "countries",
        "build_time",
    ]
    d = dict(v.dtypes)
    assert d["user"] == "struct<id:int,name:string>"
    assert d["bbox"] == "struct<xmin:double,ymin:double,xmax:double,ymax:double>"
    assert d["centroid"] == "struct<x:double,y:double>"
    assert d["xzcode"] == "struct<level:int,code:bigint>"
    assert "numChanges:int" in d["changeset"]
    assert d["members"].startswith("array<struct<type:string,id:bigint,role:string")
    row = v.where((F.col("osm_type") == "relation") & (F.col("osm_id") == 0)).first()
    assert row["members"][0]["type"] == "way" and row["members"][0]["id"] == 0
    assert row["build_time"] == 1234
    assert row["xzcode"]["level"] >= 0
