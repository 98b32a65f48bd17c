"""WARC source goldens: an in-test ISO-28500 writer (response + request +
metadata records, per-record gzip members AND plain streams) must read
back into the exact pages schema."""

from __future__ import annotations

import gzip

import pytest

from ohsome_planet_spark.sources.warc import (
    _gunzip_members,
    html_to_text,
    parse_warc_records,
    read_warc,
)


def _record(wtype: str, uri: str, date: str, payload: bytes) -> bytes:
    hdr = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {wtype}\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"WARC-Date: {date}\r\n"
        f"Content-Length: {len(payload)}\r\n"
        f"\r\n"
    ).encode()
    return hdr + payload + b"\r\n\r\n"


def _http(body: bytes) -> bytes:
    return (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body)


HTML_A = (b"<html><head><style>p{color:red}</style>"
          b"<script>var x=1;</script></head>"
          b"<body><h1>Hello &amp; welcome</h1><p>first   page</p>"
          b"<!-- hidden --></body></html>")
HTML_B = "<html><body>café 你好</body></html>".encode("utf-8")


def _records() -> list[bytes]:
    return [
        _record("request", "http://a.example/x", "2021-03-04T05:06:07Z",
                b"GET /x HTTP/1.1\r\n\r\n"),
        _record("response", "http://a.example/x", "2021-03-04T05:06:07Z",
                _http(HTML_A)),
        _record("metadata", "http://a.example/x", "2021-03-04T05:06:07Z",
                b"fetchTimeMs: 17\r\n"),
        _record("response", "http://b.example/y", "2022-12-31T23:59:59Z",
                _http(HTML_B)),
    ]


def test_html_to_text():
    t = html_to_text(HTML_A.decode())
    assert t == "Hello & welcome first page"
    assert "color" not in t and "var x" not in t and "hidden" not in t


def test_parse_and_gzip_members():
    raw = b"".join(_records())
    recs = list(parse_warc_records(raw))
    assert [h["warc-type"] for h, _ in recs] == [
        "request", "response", "metadata", "response"]
    # per-record gzip members (the Common-Crawl layout)
    members = b"".join(gzip.compress(r) for r in _records())
    assert _gunzip_members(members) == raw


@pytest.mark.parametrize("per_record_gzip", [True, False])
def test_read_warc(spark, tmp_path, per_record_gzip):
    raw = _records()
    if per_record_gzip:
        data = b"".join(gzip.compress(r) for r in raw)
    else:
        data = gzip.compress(b"".join(raw))
    p = tmp_path / "crawl-00000.warc.gz"
    p.write_bytes(data)
    df = read_warc(spark, str(p))
    rows = {r["url"]: r for r in df.collect()}
    assert set(rows) == {"http://a.example/x", "http://b.example/y"}
    a = rows["http://a.example/x"]
    assert a["text"] == "Hello & welcome first page"
    assert bytes(a["html"]) == HTML_A
    assert str(a["warc_ts"]) == "2021-03-04 05:06:07"
    assert a["lang"] == "en"
    b = rows["http://b.example/y"]
    assert "café" in b["text"] and b["lang"] == "zh"
    assert str(b["warc_ts"]) == "2022-12-31 23:59:59"


def test_corrupt_gzip_member_skipped(spark, tmp_path):
    """A corrupt member mid-archive must not lose the good records
    around it (routine in real crawl archives)."""
    good1 = gzip.compress(_record(
        "response", "http://x.example/1", "2021-01-01T00:00:00Z",
        _http(b"<html><body>first ok page</body></html>")))
    corrupt = b"\x1f\x8b\x08" + b"\x99" * 40  # gzip magic + garbage
    good2 = gzip.compress(_record(
        "response", "http://x.example/2", "2021-01-02T00:00:00Z",
        _http(b"<html><body>second ok page</body></html>")))
    p = tmp_path / "mixed.warc.gz"
    p.write_bytes(good1 + corrupt + good2)

    df = read_warc(spark, str(p))
    urls = {r["url"] for r in df.collect()}
    assert urls == {"http://x.example/1", "http://x.example/2"}


def test_mangled_content_length_skipped():
    rec_bad = (b"WARC/1.0\r\nWARC-Type: response\r\n"
               b"WARC-Target-URI: http://bad.example/\r\n"
               b"WARC-Date: 2021-01-01T00:00:00Z\r\n"
               b"Content-Length: NaN\r\n\r\n" + _http(b"junk") + b"\r\n\r\n")
    rec_good = _record("response", "http://ok.example/", "2021-01-01T00:00:00Z",
                       _http(b"<html><body>fine</body></html>"))
    recs = list(parse_warc_records(rec_bad + rec_good))
    assert [h["warc-target-uri"] for h, _ in recs] == ["http://ok.example/"]
