"""North-rule deployment shape: the job ships as a zip via spark-submit
--py-files and runs end to end from the CLI (no repo on the executors'
path — only the zip)."""

import json
import os
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

SPARK_SUBMIT = shutil.which("spark-submit")


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_contributions_cli(tmp_path):
    # build the fixture PBF with the repo available (driver side only)
    sys.path.insert(0, str(REPO))
    from ohsome_planet_spark.sources.pbf import write_osm_pbf

    nodes = [
        {"id": i, "version": 1, "ts_ms": (i + 1) * 1000, "changeset": i % 5,
         "uid": 1, "user": "u", "visible": True, "tags": {},
         "lon": float(i % 100) / 10.0, "lat": float(i % 80) / 10.0}
        for i in range(500)
    ]
    ways = [
        {"id": w, "version": 1, "ts_ms": 600000 + w, "changeset": 7, "uid": 1,
         "user": "u", "visible": True, "tags": {"highway": "x"},
         "refs": [w * 5 + k for k in range(5)]}
        for w in range(20)
    ]
    pbf = tmp_path / "mini.osm.pbf"
    write_osm_pbf(pbf, nodes, ways)

    # package the engine as the north rule prescribes
    zip_out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "submit_job.py"), "--build-zip"],
        capture_output=True, text=True, check=True, timeout=120,
    ).stdout.strip().splitlines()[-1]
    assert zip_out.endswith(".zip")

    out_dir = tmp_path / "contribs"
    r = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_out,
            str(REPO / "tools" / "submit_job.py"),
            "--contributions", "--pbf", str(pbf), "--output", str(out_dir),
            "--parallel", "4",
        ],
        capture_output=True, text=True, timeout=600,
        cwd=str(tmp_path),  # NOT the repo: only the zip provides the package
    )
    assert r.returncode == 0, r.stderr[-3000:]
    counts = json.loads((out_dir / "_counts.json").read_text())
    # 500 single-version nodes + 20 single-version ways, nothing deleted
    assert counts["latest"] == 20  # nodes are untagged → hasNoTags drop (reference default)
    assert counts["deleted"] == 0 and counts["invalid"] == 0
    assert "latest=20" in r.stdout


def test_contributions_cli_refuses_existing_output(tmp_path):
    """Reference behavior without --overwrite (`Contributions2Parquet:99-106`):
    an existing output directory is refused with a message, before any Spark
    session spins up. Exit code 0 on refusal is the reference's own
    behavior (`System.exit(0)`, Contributions2Parquet:104)."""
    out_dir = tmp_path / "exists"
    out_dir.mkdir()
    r = subprocess.run(
        [sys.executable, str(REPO / "tools" / "submit_job.py"),
         "--contributions", "--pbf", "x.pbf", "--output", str(out_dir)],
        capture_output=True, text=True, timeout=60,
    )
    assert r.returncode == 0
    assert "To overwrite use --overwrite" in r.stdout


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_curate_cli(tmp_path):
    """Corpus-curation CLI: documents parquet in → cleaned parquet +
    per-stage manifest, via the packaged zip."""
    import duckdb

    con = duckdb.connect()
    inp = tmp_path / "docs.parquet"
    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    con.execute(f"""
        COPY (SELECT * FROM read_parquet('{sf}/documents.parquet'))
        TO '{inp}' (FORMAT parquet)
    """)
    zip_out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "submit_job.py"), "--build-zip"],
        capture_output=True, text=True, check=True, timeout=120,
    ).stdout.strip().splitlines()[-1]
    out_dir = tmp_path / "clean"
    r = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]", "--conf", "spark.ui.enabled=false",
         "--py-files", zip_out, str(REPO / "tools" / "submit_job.py"),
         "--curate", "--input", str(inp), "--output", str(out_dir),
         "--min-tokens", "3"],
        capture_output=True, text=True, timeout=600, cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-3000:]
    counts = json.loads((out_dir / "_counts.json").read_text())
    assert counts["input"] > 0
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{out_dir}/documents/*.parquet')"
    ).fetchone()[0]
    assert n == counts["after_quality"]


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_linkgraph_cli(tmp_path):
    """Link-graph CLI: WARC bytes in → domain degrees + PageRank parquet,
    via the packaged zip."""
    import gzip

    sys.path.insert(0, str(REPO))
    from tests.test_warc_source import _http, _record

    mk = lambda links: ("<html><body>" + "".join(
        f'<a href="{u}">l</a>' for u in links) + "</body></html>").encode()
    recs = [
        _record("response", "http://a.example/1", "2021-01-02T00:00:00Z",
                _http(mk(["http://b.example/x", "http://c.example/y"]))),
        _record("response", "http://b.example/1", "2021-01-02T00:00:00Z",
                _http(mk(["http://c.example/z"]))),
        _record("response", "http://c.example/1", "2021-01-02T00:00:00Z",
                _http(mk(["http://a.example/w"]))),
    ]
    warc = tmp_path / "links.warc.gz"
    warc.write_bytes(b"".join(gzip.compress(r) for r in recs))

    zip_out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "submit_job.py"), "--build-zip"],
        capture_output=True, text=True, check=True, timeout=120,
    ).stdout.strip().splitlines()[-1]
    out_dir = tmp_path / "authority"
    r = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]", "--conf", "spark.ui.enabled=false",
         "--py-files", zip_out, str(REPO / "tools" / "submit_job.py"),
         "--linkgraph", "--input", str(warc), "--output", str(out_dir)],
        capture_output=True, text=True, timeout=600, cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-3000:]
    import duckdb

    rows = duckdb.sql(
        f"SELECT domain, rank FROM read_parquet('{out_dir}/*.parquet') "
        "ORDER BY rank DESC"
    ).fetchall()
    assert {d for d, _ in rows} == {"a.example", "b.example", "c.example"}
    assert rows[0][0] == "a.example"  # receives c's undivided rank
