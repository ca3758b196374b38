"""WARC reader/writer unit depth (functions/warc.py, ISO 28500):
record framing, HTTP splits, Common Crawl gzip members, WET-style
conversion records, and the dead-letter error surface."""

from __future__ import annotations

import gzip
import io

import pytest

from streamprocess_spark.functions.warc import (
    _gunzip_all,
    np_build_warc,
    np_parse_warc,
)


def _recs():
    return [
        {"warc_type": "warcinfo", "record_id": "uuid:0",
         "date": "2026-08-14T00:00:00Z", "body": b"software: sp\r\n"},
        {"warc_type": "response", "record_id": "uuid:1",
         "date": "2026-08-14T00:00:01Z", "target_uri": "http://e.com/a",
         "http_status": 200, "http_content_type": "text/html",
         "body": b"<html>hello</html>"},
        {"warc_type": "response", "record_id": "uuid:2",
         "date": "2026-08-14T00:00:02Z", "target_uri": "http://e.com/b",
         "http_status": 404, "http_content_type": "text/plain",
         "body": b"gone"},
    ]


@pytest.mark.parametrize("gz", [False, True])
def test_roundtrip_plain_and_gzip_members(gz):
    parsed = np_parse_warc(np_build_warc(_recs(), gzip_members=gz))
    assert [r["warc_type"] for r in parsed] == [
        "warcinfo", "response", "response"
    ]
    assert parsed[1]["http_status"] == 200
    assert parsed[1]["http_content_type"] == "text/html"
    assert parsed[1]["body"] == b"<html>hello</html>"
    assert parsed[1]["target_uri"] == "http://e.com/a"
    assert parsed[2]["http_status"] == 404
    assert parsed[0]["record_id"] == "uuid:0"


def test_wet_style_conversion_records():
    # WET files are WARC 'conversion' records whose content is the
    # extracted text — the generic record walk must carry them as-is
    recs = [{
        "warc_type": "conversion", "record_id": "uuid:c",
        "date": "2026-08-14T00:00:00Z",
        "target_uri": "http://e.com/a",
        "content_type": "text/plain",
        "body": b"extracted plain text\nsecond line",
    }]
    parsed = np_parse_warc(np_build_warc(recs, gzip_members=True))
    assert parsed[0]["warc_type"] == "conversion"
    assert parsed[0]["http_status"] is None
    assert parsed[0]["body"] == b"extracted plain text\nsecond line"


def test_body_may_contain_record_like_bytes():
    # Content-Length framing must win over anything in the payload
    evil = b"\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\n"
    recs = [{"warc_type": "resource", "record_id": "uuid:e",
             "date": "2026-08-14T00:00:00Z", "body": evil}]
    parsed = np_parse_warc(np_build_warc(recs))
    assert parsed[0]["body"] == evil
    assert len(parsed) == 1


def test_multi_member_gunzip():
    members = []
    for payload in (b"aaa", b"bb", b"cccc"):
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
            g.write(payload)
        members.append(buf.getvalue())
    assert _gunzip_all(b"".join(members)) == b"aaabbcccc"


def test_error_surface():
    with pytest.raises(ValueError, match="Content-Length"):
        np_parse_warc(b"WARC/1.0\r\nWARC-Type: x\r\n\r\n")
    with pytest.raises(ValueError, match="version line"):
        np_parse_warc(b"HTTP/1.1 200 OK\r\n\r\n\r\n\r\n")
    with pytest.raises(ValueError, match="truncated WARC header"):
        np_parse_warc(b"WARC/1.0\r\nWARC-Type: x")
    with pytest.raises(ValueError, match="truncated gzip member"):
        np_parse_warc(np_build_warc(_recs(), gzip_members=True)[:-8])
    with pytest.raises(ValueError, match="trailing CRLF"):
        # correct header but content not followed by CRLF CRLF
        np_parse_warc(
            b"WARC/1.0\r\nWARC-Type: resource\r\n"
            b"Content-Length: 3\r\n\r\nabcXX"
        )
    with pytest.raises(ValueError, match="empty WARC"):
        np_parse_warc(b"\r\n\r\n")


def test_http_without_content_type_header():
    raw = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Record-ID: <uuid:x>\r\nWARC-Date: 2026-08-14T00:00:00Z\r\n"
        b"Content-Type: application/http; msgtype=response\r\n"
        b"Content-Length: 25\r\n\r\n"
        b"HTTP/1.1 204 No\r\n\r\nnobody"
        b"\r\n\r\n"
    )
    parsed = np_parse_warc(raw)
    assert parsed[0]["http_status"] == 204
    assert parsed[0]["http_content_type"] is None
    assert parsed[0]["body"] == b"nobody"
