"""Multimodal plumbing, streaming cell counts vs batch, OSM XML source."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ohsome_planet_spark.operators.multimodal import (
    decode_features,
    frame_sample_plan,
    make_media_df,
)
from ohsome_planet_spark.sources.osm_xml import read_changeset_xml, read_osm_xml


class TestMultimodal:
    def test_decode_features_deterministic(self, spark):
        media = make_media_df(spark, 30)
        f1 = decode_features(media).orderBy("media_id").collect()
        f2 = decode_features(media).orderBy("media_id").collect()
        assert len(f1) == 30
        dims = {"image": 2 + 8 + 64, "audio": 4, "video": 4}
        for a, b in zip(f1, f2):
            assert a["features"] == b["features"]
            assert a["checksum"] == b["checksum"]
            assert a["decoded"] is True
            assert len(a["features"]) == dims[a["kind"]]

    def test_image_decode_is_real(self, spark):
        """The raw image path does true byte→pixel math: a constant-value
        buffer yields mean == that value, std == 0, one-hot histogram."""
        img = bytearray([200] * (10 * 10))
        media = spark.createDataFrame(
            [(1, "image", "raw", img, {"width": 10, "height": 10,
                                        "sample_rate": None, "duration_ms": None})],
            "media_id long, kind string, format string, content binary, "
            "meta struct<width:int,height:int,sample_rate:int,duration_ms:int>",
        )
        row = decode_features(media).first()
        feats = row["features"]
        assert feats[0] == pytest.approx(200.0)  # mean
        assert feats[1] == pytest.approx(0.0)    # std
        hist = feats[2:10]
        assert hist[200 >> 5] == pytest.approx(1.0)  # all pixels in one bin
        thumb = feats[10:]
        assert all(t == pytest.approx(200 / 255) for t in thumb)

    def test_audio_spectral_centroid_real_fft(self, spark):
        """A pure sine at 1 kHz must centroid near 1 kHz (real rFFT)."""
        sr = 16000
        t = np.arange(sr) / sr
        pcm = (np.sin(2 * np.pi * 1000 * t) * 10000).astype("<i2")
        media = spark.createDataFrame(
            [(1, "audio", "raw", bytearray(pcm.tobytes()),
              {"width": None, "height": None, "sample_rate": sr, "duration_ms": 1000})],
            "media_id long, kind string, format string, content binary, "
            "meta struct<width:int,height:int,sample_rate:int,duration_ms:int>",
        )
        feats = decode_features(media).first()["features"]
        assert feats[2] == pytest.approx(1000.0, rel=0.02)  # centroid Hz
        assert feats[3] == pytest.approx(1.0, rel=1e-6)     # duration s

    def test_unknown_kind_raises(self, spark):
        bad = spark.createDataFrame(
            [(1, "hologram", "raw", bytearray(b"xx"), None)],
            "media_id long, kind string, format string, content binary, "
            "meta struct<width:int,height:int,sample_rate:int,duration_ms:int>",
        )
        with pytest.raises(Exception, match="hologram"):
            decode_features(bad).collect()

    def test_compressed_format_is_explicit_swap_point(self, spark):
        # png and jpeg decode FOR REAL now; mp3 stays a documented swap point
        mp3 = spark.createDataFrame(
            [(1, "audio", "mp3", bytearray(b"\xff\xfb\x90"), None)],
            "media_id long, kind string, format string, content binary, "
            "meta struct<width:int,height:int,sample_rate:int,duration_ms:int>",
        )
        with pytest.raises(Exception, match="codec library"):
            decode_features(mp3).collect()

    def test_jpeg_feature_path(self, spark):
        """A DC-only baseline JPEG (flat 138 gray) must yield the same
        features as the identical raw grayscale payload."""
        import numpy as np

        from ohsome_planet_spark.operators.multimodal import MEDIA_SCHEMA
        from tests.test_jpeg_decode import encode_jpeg

        co = np.zeros((2, 2, 8, 8), np.int64)
        co[:, :, 0, 0] = 80  # flat 80/8+128 = 138
        jpg = encode_jpeg([co], [(1, 1)], 16, 16)
        raw = np.full((16, 16), 138, np.uint8).tobytes()
        rows = [
            (1, "image", "jpeg", bytearray(jpg),
             {"width": 16, "height": 16, "sample_rate": None, "duration_ms": None}),
            (2, "image", "raw", bytearray(raw),
             {"width": 16, "height": 16, "sample_rate": None, "duration_ms": None}),
        ]
        media = spark.createDataFrame(rows, MEDIA_SCHEMA)
        out = {r["media_id"]: r for r in decode_features(media).collect()}
        assert out[1]["features"] == out[2]["features"]

    def test_frame_sample_plan(self, spark):
        media = make_media_df(spark, 12)
        plan = frame_sample_plan(media, every_ms=500)
        rows = plan.collect()
        assert all(r["frame_ts_ms"] == r["frame_idx"] * 500 for r in rows)
        vids = media.where(F.col("kind") == "video").select("media_id", "meta.duration_ms").collect()
        exp = sum(max(1, v["duration_ms"] // 500) for v in vids)
        assert len(rows) == exp


class TestStreaming:
    def test_stream_counts_match_batch(self, spark, tmp_path):
        from ohsome_planet_spark.sources.pages import pages_df
        from ohsome_planet_spark.streaming.cellcounts import run_file_stream

        pages = pages_df(spark, 400)
        inp = str(tmp_path / "stream_in")
        pages.write.mode("overwrite").parquet(inp)
        q = run_file_stream(
            spark, inp, str(tmp_path / "ckpt"), query_name="t_cells", zoom=8
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        stream_total = (
            spark.sql("SELECT sum(n) FROM t_cells").collect()[0][0]
        )
        # batch twin
        from ohsome_planet_spark.operators.geocode import extract_mentions, geocode_mentions
        from ohsome_planet_spark.sources.gazetteer import gazetteer_df

        batch = geocode_mentions(extract_mentions(pages), gazetteer_df(spark)).where(
            F.col("coord_valid")
        )
        assert stream_total == batch.count()


class TestStatefulSessions:
    def test_stream_sessions_match_batch_closed_sessions(self, spark, tmp_path, sf_dir):
        """applyInPandasWithState sessionizer == batch window sessionization
        on CLOSED sessions (the open tail session per user stays in state)."""
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        from ohsome_planet_spark.streaming.sessions import sessionize_stream

        events = spark.read.parquet(f"{sf_dir}/events.parquet")
        inp = str(tmp_path / "ev_stream")
        events.write.mode("overwrite").parquet(inp)

        stream = spark.readStream.schema(events.schema).parquet(inp)
        q = (
            sessionize_stream(stream, gap_seconds=3600)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("t_sessions")
            .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = {
            (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
            for r in spark.sql("SELECT * FROM t_sessions").collect()
        }

        # batch twin: window sessionization, closed sessions only
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        prev_ts = F.lag("ts").over(w)
        new_sess = F.when(
            prev_ts.isNull() | (F.col("ts") - prev_ts > F.expr("INTERVAL 1 HOUR")), 1
        ).otherwise(0)
        wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        sess = events.withColumn("sid", F.sum(new_sess).over(wcum))
        agg = sess.groupBy("user_id", "sid").agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").cast("int").alias("n_events"),
        )
        last_sid = sess.groupBy("user_id").agg(F.max("sid").alias("last_sid"))
        closed = agg.join(last_sid, "user_id").where(F.col("sid") != F.col("last_sid"))
        exp = {
            (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
            for r in closed.collect()
        }
        assert got == exp
        assert len(exp) > 0


class TestOsmXml:
    OSM = """<?xml version="1.0"?>
<osm version="0.6">
  <node id="1" version="1" timestamp="2020-01-01T00:00:00Z" changeset="10" uid="7" user="u" lat="1.0" lon="2.0">
    <tag k="amenity" v="cafe"/>
  </node>
  <node id="2" version="2" timestamp="2020-01-02T00:00:00Z" changeset="11" uid="7" user="u" visible="false" lat="1.5" lon="2.5"/>
  <way id="10" version="1" timestamp="2020-01-03T00:00:00Z" changeset="12" uid="8" user="v">
    <nd ref="1"/><nd ref="2"/>
    <tag k="highway" v="path"/>
  </way>
  <relation id="20" version="1" timestamp="2020-01-04T00:00:00Z" changeset="13" uid="8" user="v">
    <member type="way" ref="10" role="outer"/>
    <member type="node" ref="1" role=""/>
    <tag k="type" v="multipolygon"/>
  </relation>
</osm>"""

    CS = """<?xml version="1.0"?>
<osm>
  <changeset id="10" created_at="2020-01-01T00:00:00Z" closed_at="2020-01-01T01:00:00Z" num_changes="5">
    <tag k="created_by" v="TestEditor 1.0"/>
    <tag k="comment" v="mapping #hotosm-task near http://x.com/#frag"/>
  </changeset>
  <changeset id="11" created_at="2020-01-02T00:00:00Z"/>
</osm>"""

    def test_read_osm_xml(self, spark, tmp_path):
        p = tmp_path / "data.osm"
        p.write_text(self.OSM)
        nodes, ways, rels = read_osm_xml(spark, [p])
        n = {r["id"]: r for r in nodes.collect()}
        assert n[1]["tags"] == {"amenity": "cafe"}
        assert n[1]["visible"] is True and n[2]["visible"] is False
        w = ways.collect()[0]
        assert w["refs"] == [1, 2] and w["changeset"] == 12
        r = rels.collect()[0]
        assert [(m["type"], m["id"], m["role"]) for m in r["members"]] == [
            ("way", 10, "outer"), ("node", 1, ""),
        ]

    def test_changesets_and_hashtags(self, spark, tmp_path):
        from ohsome_planet_spark.functions.text import hashtags_py

        p = tmp_path / "cs.xml"
        p.write_text(self.CS)
        cs = read_changeset_xml(spark, p)
        rows = {r["id"]: r for r in cs.collect()}
        assert rows[10]["num_changes"] == 5
        assert rows[11]["closed_at"] is None and rows[11]["num_changes"] == -1
        # editor + hashtag extraction parity (K12/K13)
        assert rows[10]["tags"]["created_by"] == "TestEditor 1.0"
        assert hashtags_py(None, rows[10]["tags"]["comment"]) == ["hotosm-task"]

    def test_changeset_bz2_source(self, spark, tmp_path):
        """S10: bz2 changeset dump read via the splittable Hadoop codec."""
        import bz2

        from ohsome_planet_spark.sources.osm_xml import read_changeset_xml_bz2

        body = "\n".join(
            f'<changeset id="{i}" created_at="2020-01-0{1 + i % 9}T00:00:00Z" '
            f'num_changes="{i}">\n  <tag k="comment" v="edit #{i} #batch{i % 3}x"/>\n</changeset>'
            for i in range(1, 200)
        )
        xml = f"<osm>\n{body}\n</osm>\n"
        p = tmp_path / "changesets.osm.bz2"
        p.write_bytes(bz2.compress(xml.encode()))
        df = read_changeset_xml_bz2(spark, p)
        rows = {r["id"]: r for r in df.collect()}
        assert len(rows) == 199
        assert rows[5]["num_changes"] == 5
        assert rows[5]["tags"]["comment"] == "edit #5 #batch2x"

    def test_xml_feeds_relation_pipeline(self, spark, tmp_path):
        """Reference test-harness flow: data.osm → geometry build (§3.3)."""
        osm = """<?xml version="1.0"?>
<osm>
  <node id="1" version="1" timestamp="2020-01-01T00:00:00Z" changeset="1" uid="1" user="u" lat="0" lon="0"/>
  <node id="2" version="1" timestamp="2020-01-01T00:00:00Z" changeset="1" uid="1" user="u" lat="0" lon="4"/>
  <node id="3" version="1" timestamp="2020-01-01T00:00:00Z" changeset="1" uid="1" user="u" lat="4" lon="4"/>
  <node id="4" version="1" timestamp="2020-01-01T00:00:00Z" changeset="1" uid="1" user="u" lat="4" lon="0"/>
  <way id="10" version="1" timestamp="2020-01-02T00:00:00Z" changeset="2" uid="1" user="u">
    <nd ref="1"/><nd ref="2"/><nd ref="3"/><nd ref="4"/><nd ref="1"/>
  </way>
  <relation id="20" version="1" timestamp="2020-01-03T00:00:00Z" changeset="3" uid="1" user="u">
    <member type="way" ref="10" role="outer"/>
    <tag k="type" v="multipolygon"/>
  </relation>
</osm>"""
        p = tmp_path / "rel.osm"
        p.write_text(osm)
        nodes, ways, rels = read_osm_xml(spark, [p])
        from ohsome_planet_spark.operators.history import relation_contributions

        got = relation_contributions(rels, ways, nodes).collect()
        assert len(got) == 1
        assert got[0]["geometry_type"] == "MultiPolygon"
        assert got[0]["status"] == "latest"


def test_jdbc_changeset_scan_options():
    """S12 wiring: range-partitioned JDBC scan options (ChangesetDb.java:24-45
    analog). No PostgreSQL in the sandbox — the option plan is what's
    testable; join semantics are oracle-checked via changeset_join_default."""
    from ohsome_planet_spark.sources.changeset_db import _auth, jdbc_scan_options

    opts = jdbc_scan_options(
        "jdbc:postgresql://db/osm", "osm_changeset", "id", 0, 1_000_000, 64, 10_000
    )
    assert opts["partitionColumn"] == "id"
    assert (opts["lowerBound"], opts["upperBound"]) == ("0", "1000000")
    assert opts["numPartitions"] == "64"
    assert opts["fetchsize"] == "10000"
    auth = _auth("u", "p")
    assert auth["driver"] == "org.postgresql.Driver"
    assert auth["user"] == "u" and auth["password"] == "p"


class TestStreamingDedup:
    def test_stream_dedup_matches_batch_distinct(self, spark, tmp_path):
        """dropDuplicatesWithinWatermark keeps one row per content hash
        within the horizon — equal to batch distinct-by-hash over the same
        input (duplicates injected by unioning the corpus with itself)."""
        from ohsome_planet_spark.sources.pages import pages_df
        from ohsome_planet_spark.streaming.dedup_stream import run_dedup_stream

        pages = pages_df(spark, 200)
        dup = pages.unionByName(pages.limit(80))  # 80 exact duplicates
        inp = str(tmp_path / "dedup_in")
        dup.write.mode("overwrite").parquet(inp)
        q = run_dedup_stream(
            spark, inp, str(tmp_path / "dedup_ckpt"), query_name="t_dedup"
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = spark.sql("SELECT count(*) AS n, count(DISTINCT content_hash) AS h FROM t_dedup").collect()[0]
        exp = (
            pages.select(F.sha2(F.col("text").cast("binary"), 256).alias("h"))
            .distinct()
            .count()
        )
        assert got["n"] == got["h"] == exp

    def test_stream_dedup_plan_is_stateful(self, spark, tmp_path):
        """The streaming plan must carry the dedup-within-watermark state
        operator and the event-time watermark (bounded state at scale)."""
        from ohsome_planet_spark.sources.pages import pages_df
        from ohsome_planet_spark.streaming.dedup_stream import streaming_exact_dedup

        schema = pages_df(spark, 1).schema
        stream = spark.readStream.schema(schema).parquet(str(tmp_path))
        out = streaming_exact_dedup(stream)
        assert out.isStreaming
        plan = out._jdf.queryExecution().analyzed().toString()
        assert "dedupe-within-watermark" in plan.lower().replace("_", "-") or \
            "DeduplicateWithinWatermark" in plan
