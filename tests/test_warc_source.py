"""Native WARC DataSource (io/warc_source.py): per-file partitioning,
schema, record parity with the direct parser, and the dead-letter
boundary on malformed files."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from streamprocess_spark.functions.warc import np_build_warc, np_parse_warc
from streamprocess_spark.io.warc_source import register_warc_source


def _recs(tag: str, n: int) -> list[dict]:
    out = [{"warc_type": "warcinfo", "record_id": f"uuid:{tag}-info",
            "target_uri": None, "date": "2024-01-01T00:00:00Z",
            "content_type": "application/warc-fields",
            "body": b"software: test\r\n"}]
    for i in range(n):
        body = f"<html><body>doc {tag}-{i}</body></html>".encode()
        out.append({
            "warc_type": "response",
            "record_id": f"uuid:{tag}-{i}",
            "target_uri": f"http://ex.com/{tag}/{i}",
            "date": "2024-01-01T00:00:00Z",
            "http_status": 200,
            "http_content_type": "text/html",
            "body": body,
        })
    return out


@pytest.fixture()
def warc_dir(tmp_path):
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "seg-0.warc").write_bytes(np_build_warc(_recs("a", 3)))
    (d / "seg-1.warc.gz").write_bytes(
        np_build_warc(_recs("b", 2), gzip_members=True)
    )
    (d / "ignore.txt").write_text("not a warc")
    return str(d)


def test_read_format_warc(spark, warc_dir):
    register_warc_source(spark)
    df = spark.read.format("warc").load(warc_dir)
    rows = df.collect()
    # 2 files: (1 warcinfo + 3 responses) + (1 + 2)
    assert len(rows) == 7
    assert df.rdd.getNumPartitions() == 2  # one partition per file
    resp = df.filter(F.col("warc_type") == "response")
    assert resp.count() == 5
    got = {r["record_id"] for r in resp.collect()}
    assert got == {f"uuid:a-{i}" for i in range(3)} | {
        f"uuid:b-{i}" for i in range(2)
    }
    one = resp.filter(F.col("record_id") == "uuid:b-1").collect()[0]
    assert one["http_status"] == 200
    assert one["http_content_type"] == "text/html"
    assert one["target_uri"] == "http://ex.com/b/1"
    assert bytes(one["body"]) == b"<html><body>doc b-1</body></html>"
    assert one["path"].endswith("seg-1.warc.gz")


def test_source_matches_direct_parser(spark, warc_dir, tmp_path):
    register_warc_source(spark)
    raw = (tmp_path / "crawl" / "seg-0.warc").read_bytes()
    direct = np_parse_warc(raw)
    df = spark.read.format("warc").load(str(tmp_path / "crawl" / "seg-0.warc"))
    got = sorted(df.collect(), key=lambda r: r["record_id"])
    want = sorted(direct, key=lambda r: r["record_id"])
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g["record_id"] == w["record_id"]
        assert g["warc_type"] == w["warc_type"]
        assert bytes(g["body"]) == bytes(w["body"])
        assert g["content_length"] == w["content_length"]


def test_projection_prunes_to_metadata(spark, warc_dir):
    """Selecting only metadata columns must work (the 100 TB listing
    query shape); body stays unread by the consumer."""
    register_warc_source(spark)
    df = spark.read.format("warc").load(warc_dir).select(
        "warc_type", "target_uri"
    )
    assert df.count() == 7


def test_malformed_file_dead_letters_its_partition(spark, tmp_path):
    d = tmp_path / "bad"
    d.mkdir()
    (d / "broken.warc").write_bytes(b"WARC/1.0\r\nbogus")
    register_warc_source(spark)
    df = spark.read.format("warc").load(str(d))
    with pytest.raises(Exception, match="truncated|malformed|WARC"):
        df.collect()


def test_empty_dir_raises(spark, tmp_path):
    register_warc_source(spark)
    with pytest.raises(Exception, match="no .warc"):
        spark.read.format("warc").load(str(tmp_path)).collect()


def test_gzip_roundtrip_bodies(spark, tmp_path):
    """Per-record gzip members (the Common Crawl on-disk form) parse
    identically to plain concatenation."""
    d = tmp_path / "gz"
    d.mkdir()
    recs = _recs("z", 4)
    (d / "p.warc").write_bytes(np_build_warc(recs))
    (d / "g.warc.gz").write_bytes(np_build_warc(recs, gzip_members=True))
    register_warc_source(spark)
    df = spark.read.format("warc").load(str(d))
    counts = (
        df.groupBy("path").count().orderBy("path").collect()
    )
    assert [c["count"] for c in counts] == [5, 5]
    bodies = (
        df.filter(F.col("warc_type") == "response")
        .groupBy("record_id")
        .agg(F.count_distinct(F.md5(F.col("body"))).alias("variants"))
        .collect()
    )
    assert all(b["variants"] == 1 for b in bodies)  # identical across forms


# ------------------------------------------------------------- streaming

def _run_stream(spark, src_dir, ckpt, cap=None):
    """One availableNow pass; foreachBatch (checkpoint-recoverable,
    unlike the memory sink) collects this pass's rows."""
    got: list = []

    reader = spark.readStream.format("warc").option("path", src_dir)
    if cap:
        reader = reader.option("max_files_per_batch", str(cap))
    q = (
        reader.load()
        .select("path", "record_id", "warc_type")
        .writeStream.foreachBatch(
            lambda df, _bid: got.extend(df.collect())
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return got


def test_stream_new_files_exactly_once(spark, tmp_path):
    register_warc_source(spark)
    src = tmp_path / "crawl"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    (src / "seg-0.warc").write_bytes(np_build_warc(_recs("a", 2)))

    rows1 = _run_stream(spark, str(src), ckpt)
    assert {r["record_id"] for r in rows1} == {
        "uuid:a-info", "uuid:a-0", "uuid:a-1"
    }

    # a new segment lands; the SAME checkpoint must emit ONLY its rows
    (src / "seg-1.warc.gz").write_bytes(
        np_build_warc(_recs("b", 3), gzip_members=True)
    )
    rows2 = _run_stream(spark, str(src), ckpt)
    assert {r["record_id"] for r in rows2} == {
        "uuid:b-info", "uuid:b-0", "uuid:b-1", "uuid:b-2"
    }

    # no new files -> an empty pass, not a replay
    rows3 = _run_stream(spark, str(src), ckpt)
    assert rows3 == []


def test_stream_max_files_per_batch_paces_intake(spark, tmp_path):
    register_warc_source(spark)
    src = tmp_path / "burst"
    src.mkdir()
    for i in range(5):
        (src / f"seg-{i}.warc").write_bytes(np_build_warc(_recs(f"f{i}", 1)))
    ckpt = str(tmp_path / "ckpt2")
    # under availableNow the engine snapshots latestOffset once per
    # pass, so the cap bounds each PASS to 2 files; repeated passes on
    # the same checkpoint drain the backlog without replay
    seen_paths: set = set()
    passes = 0
    while passes < 10:
        rows = _run_stream(spark, str(src), ckpt, cap=2)
        passes += 1
        if not rows:
            break
        paths = {r["path"] for r in rows}
        assert len(paths) <= 2              # intake paced per pass
        assert not (paths & seen_paths)     # no replay across passes
        seen_paths |= paths
    assert len(seen_paths) == 5             # backlog fully drained
    assert passes == 4                      # 2+2+1 files + 1 empty pass
