"""WARC (Web ARChive, ISO 28500) reader/writer — the Common Crawl
ingest format (S15 extension for the web-scale training-data path).

A WARC file is a sequence of records; each record is a header block
(version line ``WARC/1.0`` + named fields, CRLF line endings), a blank
line, ``Content-Length`` bytes of content, and two trailing CRLFs.
``response`` records carry a full HTTP response (status line, headers,
blank line, body) as their content. Common Crawl stores each record as
an independent gzip member, concatenated — Python's zlib consumes
multi-member streams member-by-member, so both the plain and the
member-gzipped layout parse through the same record walk.

Implemented from the public ISO 28500 / WARC 1.1 specification and the
Common Crawl file-format documentation; no WARC library is involved.
The reference engine has no web ingest (its uploads are media bytes,
src/api/main.py:146-218); this source exists for the training-data
pipeline charter — a user pointing the engine at crawl data needs the
records, the HTTP split, and the dead-letter behavior for truncated or
malformed archives.
"""

from __future__ import annotations

import gzip
import io
import zlib

CRLF = b"\r\n"


# ---------------------------------------------------------------------------
# fixture builder (spec-shaped writer, used by tests and query legs)
# ---------------------------------------------------------------------------

def np_build_warc(records: list[dict], gzip_members: bool = False) -> bytes:
    """Serialize records into a WARC file. Each record dict:
    {"warc_type": "response"|"warcinfo"|..., "target_uri": str|None,
     "date": str, "record_id": str, "http_status": int|None,
     "http_content_type": str|None, "body": bytes}.
    ``response`` records wrap body in an HTTP/1.1 response; other
    types carry body verbatim. gzip_members=True emits one gzip
    member per record (the Common Crawl layout)."""
    out = []
    for r in records:
        if r["warc_type"] == "response":
            http = (
                b"HTTP/1.1 %d OK" % r.get("http_status", 200) + CRLF
                + b"Content-Type: "
                + r.get("http_content_type", "text/plain").encode() + CRLF
                + b"Content-Length: %d" % len(r["body"]) + CRLF
                + CRLF
                + r["body"]
            )
            content = http
            ctype = b'application/http; msgtype=response'
        else:
            content = r["body"]
            ctype = r.get("content_type", "application/warc-fields").encode()
        head = [b"WARC/1.0"]
        head.append(b"WARC-Type: " + r["warc_type"].encode())
        head.append(b"WARC-Record-ID: <" + r["record_id"].encode() + b">")
        head.append(b"WARC-Date: " + r["date"].encode())
        if r.get("target_uri"):
            head.append(b"WARC-Target-URI: " + r["target_uri"].encode())
        head.append(b"Content-Type: " + ctype)
        head.append(b"Content-Length: %d" % len(content))
        rec = CRLF.join(head) + CRLF + CRLF + content + CRLF + CRLF
        if gzip_members:
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
                g.write(rec)
            rec = buf.getvalue()
        out.append(rec)
    return b"".join(out)


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------

def _gunzip_all(raw: bytes) -> bytes:
    """Decompress a (possibly multi-member) gzip stream fully."""
    out = []
    pos = 0
    while pos < len(raw):
        d = zlib.decompressobj(wbits=31)
        out.append(d.decompress(raw[pos:]))
        out.append(d.flush())
        if not d.eof:
            # deflate stream or the 8-byte CRC/ISIZE trailer torn off
            raise ValueError("truncated gzip member")
        consumed = len(raw) - pos - len(d.unused_data)
        if consumed <= 0:
            raise ValueError("gzip member did not advance")
        pos += consumed
    return b"".join(out)


def np_parse_warc(raw: bytes) -> list[dict]:
    """Parse a WARC file (plain or member-gzipped) into records:
    [{"warc_type", "target_uri", "date", "record_id", "content_type",
      "content_length", "http_status", "http_content_type", "body"}].
    For ``response`` records the embedded HTTP response is split and
    ``body`` is the HTTP payload; for other types ``body`` is the raw
    record content. Raises ValueError on malformed or truncated input
    (the ingest edge dead-letters these)."""
    if raw[:2] == b"\x1f\x8b":
        try:
            raw = _gunzip_all(raw)
        except zlib.error as e:
            raise ValueError(f"bad gzip stream: {e}") from None
    records = []
    pos = 0
    n = len(raw)
    while pos < n:
        # skip inter-record CRLFs
        while raw[pos:pos + 2] == CRLF:
            pos += 2
        if pos >= n:
            break
        head_end = raw.find(CRLF + CRLF, pos)
        if head_end < 0:
            raise ValueError("truncated WARC header block")
        lines = raw[pos:head_end].split(CRLF)
        if not lines[0].startswith(b"WARC/"):
            raise ValueError(f"bad WARC version line: {lines[0][:20]!r}")
        fields: dict[str, str] = {}
        for ln in lines[1:]:
            k, sep, v = ln.partition(b":")
            if not sep:
                raise ValueError(f"malformed WARC header field: {ln[:40]!r}")
            fields[k.strip().decode().lower()] = v.strip().decode()
        if "content-length" not in fields:
            raise ValueError("WARC record missing Content-Length")
        clen = int(fields["content-length"])
        body_start = head_end + 4
        content = raw[body_start:body_start + clen]
        if len(content) < clen:
            raise ValueError("truncated WARC record content")
        pos = body_start + clen
        if raw[pos:pos + 4] != CRLF + CRLF:
            raise ValueError("WARC record missing trailing CRLF CRLF")
        pos += 4

        rec = {
            "warc_type": fields.get("warc-type", ""),
            "target_uri": fields.get("warc-target-uri"),
            "date": fields.get("warc-date", ""),
            "record_id": fields.get("warc-record-id", "").strip("<>"),
            "content_type": fields.get("content-type", ""),
            "content_length": clen,
            "http_status": None,
            "http_content_type": None,
            "body": content,
        }
        if rec["warc_type"] == "response" and content[:5] == b"HTTP/":
            split = content.find(CRLF + CRLF)
            if split < 0:
                raise ValueError("HTTP response without header/body split")
            http_lines = content[:split].split(CRLF)
            status_parts = http_lines[0].split(b" ")
            if len(status_parts) < 2 or not status_parts[1].isdigit():
                raise ValueError(f"bad HTTP status line: {http_lines[0]!r}")
            rec["http_status"] = int(status_parts[1])
            for ln in http_lines[1:]:
                k, _, v = ln.partition(b":")
                if k.strip().lower() == b"content-type":
                    rec["http_content_type"] = v.strip().decode()
            rec["body"] = content[split + 4:]
        records.append(rec)
    if not records:
        raise ValueError("empty WARC file")
    return records
