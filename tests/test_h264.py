"""H.264 I_PCM subset (functions/h264.py): NAL framing, emulation
prevention, Exp-Golomb, SPS/PPS, cropping, and bit-exact sample
roundtrips — all against the public ITU-T H.264 spec structures."""

from __future__ import annotations

import numpy as np
import pytest

from streamprocess_spark.functions import h264 as H


def _frames(seed=5, dims=(30, 44), n=3):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, dims, np.uint8) for _ in range(n)]


def test_roundtrip_bit_exact_with_cropping():
    frames = _frames()
    dec = H.np_decode_h264_ipcm(H.np_build_h264_ipcm(frames))
    assert len(dec) == len(frames)
    for a, b in zip(frames, dec):
        assert np.array_equal(a, b)


def test_roundtrip_uncropped_and_single_mb():
    one = [np.arange(256, dtype=np.uint8).reshape(16, 16)]
    assert np.array_equal(
        H.np_decode_h264_ipcm(H.np_build_h264_ipcm(one))[0], one[0]
    )


def test_exp_golomb_roundtrip():
    w = H._BitWriter()
    vals = [0, 1, 2, 3, 7, 8, 255, 100000]
    for v in vals:
        w.ue(v)
    svals = [0, 1, -1, 2, -2, 31, -31]
    for v in svals:
        w.se(v)
    w.rbsp_trailing()
    r = H._BitReader(w.tobytes())
    assert [r.ue() for _ in vals] == vals
    assert [r.se() for _ in svals] == svals


def test_emulation_prevention_roundtrip():
    for payload in (
        b"\x00\x00\x00\x00\x01",
        b"\x00\x00\x02",
        b"\x00\x00\x03\x00",
        bytes(range(256)) * 3,
        b"\x00" * 64,
    ):
        assert H._ebsp_to_rbsp(H._rbsp_to_ebsp(payload)) == payload
        # the EBSP form never contains a start-code-looking run
        assert b"\x00\x00\x00" not in H._rbsp_to_ebsp(payload)
        assert b"\x00\x00\x01" not in H._rbsp_to_ebsp(payload)


def test_odd_dimensions_rejected():
    with pytest.raises(ValueError, match="even frame dimensions"):
        H.np_build_h264_ipcm([np.zeros((31, 44), np.uint8)])


def test_truncated_and_malformed_rejected():
    raw = H.np_build_h264_ipcm(_frames(n=1))
    with pytest.raises(ValueError):
        H.np_decode_h264_ipcm(raw[: len(raw) // 2])
    with pytest.raises(ValueError):
        H.np_decode_h264_ipcm(b"\x00\x00\x01\x87" + raw[4:40])  # forbidden bit
    with pytest.raises(ValueError):
        H.np_decode_h264_ipcm(b"junkjunkjunk")


def test_compressed_macroblock_types_dead_letter():
    # craft a stream whose slice announces a non-I_PCM macroblock:
    # reuse SPS/PPS from a valid stream, replace the slice payload
    raw = H.np_build_h264_ipcm([np.zeros((16, 16), np.uint8)])
    nals = H.split_annexb(raw)
    w = H._BitWriter()
    w.ue(0)        # first_mb_in_slice
    w.ue(7)        # I slice
    w.ue(0)        # pps
    w.u(0, 4)      # frame_num
    w.ue(0)        # idr_pic_id
    w.u(0, 1)
    w.u(0, 1)
    w.se(0)
    w.ue(0)        # mb_type = I_4x4 (compressed) -> NotImplementedError
    w.rbsp_trailing()
    stream = (
        b"\x00\x00\x00\x01" + bytes([(3 << 5) | H.NAL_SPS])
        + H._rbsp_to_ebsp(dict(enumerate(nals))[0][1])
    )
    # rebuild: SPS + PPS + crafted slice
    sps_rbsp = nals[0][1]
    pps_rbsp = nals[1][1]
    stream = (
        b"\x00\x00\x00\x01" + bytes([(3 << 5) | H.NAL_SPS]) + H._rbsp_to_ebsp(sps_rbsp)
        + b"\x00\x00\x00\x01" + bytes([(3 << 5) | H.NAL_PPS]) + H._rbsp_to_ebsp(pps_rbsp)
        + b"\x00\x00\x00\x01" + bytes([(3 << 5) | H.NAL_IDR]) + H._rbsp_to_ebsp(w.tobytes())
    )
    with pytest.raises(NotImplementedError, match="CAVLC/CABAC"):
        H.np_decode_h264_ipcm(stream)


def test_sniffer():
    raw = H.np_build_h264_ipcm(_frames(n=1))
    assert H.looks_like_annexb_h264(raw)
    assert not H.looks_like_annexb_h264(b"\x00\x00\x00\x02junk")
    assert not H.looks_like_annexb_h264(b"RIFF....WAVE")


def test_mp4_avc1_roundtrip_and_dispatch():
    from streamprocess_spark.functions.mp4 import (
        np_build_mp4_avc1,
        np_parse_mp4_avc1,
        np_parse_mp4_video,
        np_probe_mp4,
    )

    frames = _frames(seed=9, dims=(30, 44), n=3)
    raw = np_build_mp4_avc1(frames, fps=10)
    info = np_probe_mp4(raw)
    assert info["tracks"][0]["codec"] == "avc1"
    dec, fps = np_parse_mp4_avc1(raw)
    assert fps == 10 and dec.shape == (3, 30, 44)
    for a, b in zip(frames, dec):
        assert np.array_equal(a, b)
    dec2, _ = np_parse_mp4_video(raw)
    assert np.array_equal(dec, dec2)


def test_mp4_avc1_ingest_edge():
    from streamprocess_spark.functions.mp4 import np_build_mp4_avc1
    from streamprocess_spark.io.ingest import make_envelope

    raw = np_build_mp4_avc1(_frames(n=1))
    env = make_envelope(raw)
    assert (env["type"], env["payload"]["format"]) == ("video_batch", "MP4")
    bad = make_envelope(raw[:-64])
    assert bad["type"] == "corrupt_media"


def test_mkv_avc_roundtrip_and_ingest():
    from streamprocess_spark.functions.matroska import (
        np_build_mkv_avc,
        np_parse_mkv_avc,
        np_parse_mkv_video,
    )
    from streamprocess_spark.io.ingest import make_envelope

    frames = _frames(seed=3, dims=(30, 44), n=3)
    raw = np_build_mkv_avc(frames, fps=10)
    dec, fps = np_parse_mkv_avc(raw)
    assert fps == 10 and dec.shape == (3, 30, 44)
    for a, b in zip(frames, dec):
        assert np.array_equal(a, b)
    dec2, _ = np_parse_mkv_video(raw)
    assert np.array_equal(dec, dec2)

    env = make_envelope(raw)
    assert (env["type"], env["payload"]["format"]) == ("video_batch", "MKV")
    bad = make_envelope(raw[:-48])
    assert bad["type"] == "corrupt_media"
