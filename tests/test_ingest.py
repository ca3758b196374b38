"""Media ingestion edge (S4/S5): upload bytes → sniffed/validated job
envelopes in the priority queue, decodable end-to-end by the same
codecs the pipeline runs."""

from __future__ import annotations

import base64
import json

import numpy as np

from streamprocess_spark.functions import audio as A
from streamprocess_spark.functions import image as I
from streamprocess_spark.functions import video as V
from streamprocess_spark.io.ingest import ingest_bytes, ingest_dir, sniff_format


def _wav() -> bytes:
    x = (0.3 * np.sin(np.arange(1600) * 0.1)).astype(np.float32)
    return A.np_build_wav(A.np_encode_linear16(x), sr=16000)


def _png() -> bytes:
    img = np.full((20, 30), 200, dtype=np.uint8)
    img[5:10, 5:20] = 30
    return I.np_encode_png(img)


def _flac() -> bytes:
    from streamprocess_spark.functions import flac as FL

    x = ((np.arange(1600) * 7) % 2001 - 1000).astype(np.int16)
    return FL.np_encode_flac(x, sr=16000, block_size=512)


def _jpeg() -> bytes:
    from streamprocess_spark.functions import jpeg as J

    img = np.full((24, 32), 130, dtype=np.uint8)
    img[8:16, 8:24] = 70
    return J.np_encode_jpeg_gray(img, quality=50)


def test_sniffers():
    assert sniff_format(_wav())[0] == "WAV"
    assert sniff_format(_png())[0] == "PNG"
    assert sniff_format(_flac())[0] == "FLAC"
    assert sniff_format(_jpeg())[0] == "JPEG"
    assert sniff_format(I.np_encode_bmp(np.zeros((4, 4), np.uint8)))[0] == "BMP"
    assert sniff_format(V.np_build_rawv(np.zeros((1, 4, 4), np.uint8)))[0] == "RAWV"
    assert sniff_format(b"GIF89a....")[0] == "GIF"   # real codec now
    assert sniff_format(b"FORM1234")[0] == "UNKNOWN"
    # RIFF that is neither WAVE nor AVI must not sniff as WAV
    webp = b"RIFF" + (100).to_bytes(4, "little") + b"WEBP" + b"\x00" * 100
    assert sniff_format(webp) == ("UNKNOWN", "unsupported_media", "low")
    # RIFF/AVI sniffs as the AVI container; a body the demuxer rejects
    # still dead-letters rather than crashing
    avi_garbage = b"RIFF" + (100).to_bytes(4, "little") + b"AVI " + b"\x00" * 100
    assert sniff_format(avi_garbage) == ("AVI", "video_batch", "low")
    from streamprocess_spark.io.ingest import make_envelope

    assert make_envelope(avi_garbage)["type"] == "corrupt_media"


def test_ingest_routes_and_validates(tmp_path):
    qdir = str(tmp_path / "q")
    ok = ingest_bytes(qdir, _wav(), name="a.wav", enqueued_at=1.0)
    assert (ok["type"], ok["payload"]["format"]) == ("stt_batch", "WAV")
    img = ingest_bytes(qdir, _png(), name="b.png", enqueued_at=2.0)
    assert img["type"] == "ocr_single"
    fl = ingest_bytes(qdir, _flac(), name="c.flac", enqueued_at=2.5)
    assert (fl["type"], fl["payload"]["format"]) == ("stt_batch", "FLAC")
    jp = ingest_bytes(qdir, _jpeg(), name="d.jpg", enqueued_at=2.7)
    assert (jp["type"], jp["payload"]["format"]) == ("ocr_single", "JPEG")
    bad = ingest_bytes(qdir, _wav()[:20], name="torn.wav", enqueued_at=3.0)
    assert bad["type"] == "corrupt_media" and "error" in bad["payload"]
    # corrupt FLAC (CRC broken) must dead-letter, not crash
    torn_flac = bytearray(_flac())
    torn_flac[-1] ^= 0xFF
    badf = ingest_bytes(qdir, bytes(torn_flac), name="t.flac", enqueued_at=3.5)
    assert badf["type"] == "corrupt_media"
    # garbage behind a real GIF magic → codec rejection → dead-letter
    badg = ingest_bytes(qdir, b"GIF89a" + b"\x00" * 10, enqueued_at=3.8)
    assert badg["type"] == "corrupt_media"
    unk = ingest_bytes(qdir, b"FORM" + b"\x00" * 10, enqueued_at=4.0)
    assert unk["type"] == "unsupported_media"
    # corrupt/unknown jobs land on the low queue, valid media on normal
    lines = open(f"{qdir}/low.jsonl").read().splitlines()
    assert len(lines) == 4
    assert len(open(f"{qdir}/normal.jsonl").read().splitlines()) == 4


def test_end_to_end_through_queue_source(spark, tmp_path):
    """Landing dir → ingest → priority_queue source → b64 decode →
    real codec: the payload that comes OUT of the queue decodes to the
    exact samples that went in (the §3.2 upload lifecycle, engine
    side)."""
    from streamprocess_spark.io.queue_source import register_queue_source

    land = tmp_path / "land"
    land.mkdir()
    wav_bytes = _wav()
    (land / "u1.wav").write_bytes(wav_bytes)
    (land / "u2.png").write_bytes(_png())
    qdir = str(tmp_path / "q")
    jobs = ingest_dir(qdir, str(land), enqueued_at=10.0)
    assert [j["payload"]["filename"] for j in jobs] == ["u1.wav", "u2.png"]

    register_queue_source(spark)
    rows = (
        spark.read.format("priority_queue").option("path", qdir).load()
        .orderBy("seq")
        .collect()
    )
    assert [r["type"] for r in rows] == ["stt_batch", "ocr_single"]
    payload = json.loads(rows[0]["payload"])
    raw = base64.b64decode(payload["content_b64"])
    assert raw == wav_bytes
    y, sr, ch = A.np_parse_wav(raw)
    assert sr == 16000 and len(y) == 1600


def test_streaming_ingest_edge(spark, tmp_path):
    """S4/S5 as a STREAM: files landing in a watched directory flow
    through executor-side envelope assembly into the priority-
    partitioned store with a dead-letter split — no driver-side file
    handling, exactly-once per file via the file-source checkpoint."""
    from streamprocess_spark.io.ingest import envelope_stream
    from streamprocess_spark.streaming.routing import route_to_storage

    land = tmp_path / "land"
    land.mkdir()
    (land / "a.wav").write_bytes(_wav())
    (land / "b.flac").write_bytes(_flac())
    (land / "c.jpg").write_bytes(_jpeg())
    (land / "d.bin").write_bytes(b"FORM" + b"\x00" * 20)     # unknown
    (land / "e.wav").write_bytes(_wav()[:16])                # corrupt

    stream = envelope_stream(spark, str(land))
    out = tmp_path / "store"
    known = ("stt_batch", "ocr_single", "ocr_batch", "video_batch")
    q = (
        route_to_storage(stream, str(out), known, type_col="type")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    valid = spark.read.parquet(str(out / "valid"))
    rows = {r["format"]: r for r in valid.collect()}
    assert set(rows) == {"WAV", "FLAC", "JPEG"}
    assert rows["FLAC"]["type"] == "stt_batch"
    assert rows["JPEG"]["priority"] == "normal"
    # payload round-trips to the exact uploaded bytes
    import base64 as b64
    import json

    payload = json.loads(rows["WAV"]["payload_json"])
    assert b64.b64decode(payload["content_b64"]) == _wav()

    dead = spark.read.parquet(str(out / "dead_letter"))
    dead_types = sorted(r["type"] for r in dead.collect())
    assert dead_types == ["corrupt_media", "unsupported_media"]
