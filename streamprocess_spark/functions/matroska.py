"""Matroska / WebM (EBML) container layer (SURVEY §2.1 S15 video
residue — the last container family the reference's upload path
accepts that this repo didn't speak).

Implemented dependency-free from the public specs — RFC 8794 (EBML)
and the Matroska element registry (IETF cellar / matroska.org):

  - EBML VINT reader (IDs keep their marker bits, sizes strip them;
    leading-zero and unknown-size rejection), nested element walk with
    parent-bounds totality — every malformed stream raises ValueError
    (the ingest dead-letter contract). EBML has no checksum layer, so
    unlike Ogg (CRC-32 per page) payload corruption is detectable only
    structurally — that asymmetry is spec-accurate, not a gap;
  - header probe: DocType, Segment→Info (TimestampScale, Duration),
    Tracks (TrackNumber/Type, CodecID, Video PixelWidth/Height),
    Cluster/Timestamp/SimpleBlock walk with per-block header
    validation (track VINT, 16-bit relative timestamp, flags,
    no-lacing enforcement for the decode path);
  - real demux + DECODE for `V_MJPEG` tracks and V_MPEG4/ISO/AVC
    (H.264 I_PCM subset via CodecPrivate avcC — see np_parse_mkv_avc
    below) (public Matroska codec
    id), where every SimpleBlock payload is a complete baseline JPEG
    routed through the repo's own codec (functions/jpeg.py) — the
    same pattern as AVI/MJPG and MP4/'jpeg';
  - a spec-valid writer for fixtures.

VP8/VP9/AV1 sample decode stays NotImplementedError at the block
boundary (entropy decoders with normative probability tables — same
policy as MP3/OPUS/H.264).

Scale: pure per-row byte parsing behind Arrow pandas UDFs — map-only.
"""

from __future__ import annotations

import struct

import numpy as np

# Matroska/WebM element IDs (public registry)
_EBML_HEAD, _DOCTYPE = 0x1A45DFA3, 0x4282
_SEGMENT, _INFO, _TSCALE, _DURATION = 0x18538067, 0x1549A966, 0x2AD7B1, 0x4489
_TRACKS, _TRACKENTRY, _TRACKNUM, _TRACKTYPE, _CODECID = (
    0x1654AE6B, 0xAE, 0xD7, 0x83, 0x86)
_VIDEO, _PIXELW, _PIXELH = 0xE0, 0xB0, 0xBA
_CLUSTER, _TIMESTAMP, _SIMPLEBLOCK = 0x1F43B675, 0xE7, 0xA3


def looks_like_ebml(raw: bytes) -> bool:
    return raw[:4] == b"\x1a\x45\xdf\xa3"


def _read_vint(raw: bytes, pos: int, is_id: bool) -> tuple[int, int]:
    if pos >= len(raw):
        raise ValueError("EBML truncated at VINT")
    first = raw[pos]
    if first == 0:
        raise ValueError("invalid EBML VINT (marker past 8 bytes)")
    length = 9 - first.bit_length()
    if pos + length > len(raw):
        raise ValueError("EBML VINT overruns input")
    v = int.from_bytes(raw[pos:pos + length], "big")
    if is_id:
        return v, pos + length         # IDs keep marker bits (RFC 8794 §5)
    v -= 1 << (7 * length)
    if v == (1 << (7 * length)) - 1:
        raise ValueError("unknown-size EBML element unsupported")
    return v, pos + length


def _walk(raw: bytes, pos: int, end: int):
    """Yield (id, body_start, body_end) for each child element."""
    while pos < end:
        eid, pos = _read_vint(raw, pos, True)
        size, pos = _read_vint(raw, pos, False)
        if pos + size > end:
            raise ValueError(f"EBML element 0x{eid:X} overruns parent")
        yield eid, pos, pos + size
        pos += size


def _uint(raw: bytes, b: int, e: int) -> int:
    if e - b > 8:
        raise ValueError("EBML uint wider than 8 bytes")
    return int.from_bytes(raw[b:e], "big")


def np_probe_matroska(raw: bytes) -> dict:
    """Validate the container structure; return movie + track metadata
    and SimpleBlock accounting. Raises ValueError on damage."""
    if not looks_like_ebml(raw):
        raise ValueError("not an EBML stream (no 0x1A45DFA3 magic)")
    pos = 0
    eid, pos = _read_vint(raw, pos, True)
    size, pos = _read_vint(raw, pos, False)
    if pos + size > len(raw):
        raise ValueError("EBML header overruns input")
    doctype = None
    for cid, b, e in _walk(raw, pos, pos + size):
        if cid == _DOCTYPE:
            doctype = raw[b:e].decode("ascii", "replace").rstrip("\x00")
    pos += size
    eid, pos = _read_vint(raw, pos, True)
    if eid != _SEGMENT:
        raise ValueError("EBML missing Segment element")
    size, pos = _read_vint(raw, pos, False)
    if pos + size > len(raw):
        raise ValueError("Matroska Segment overruns input")
    info = {
        "doctype": doctype, "timescale_ns": 1_000_000,
        "duration_ms": 0, "tracks": [], "n_clusters": 0, "n_blocks": 0,
    }

    def block_header(b: int, e: int) -> int:
        """Validate a SimpleBlock header; return its track number."""
        tn, hb = _read_vint(raw, b, False)
        if hb + 3 > e:
            raise ValueError("SimpleBlock header truncated")
        flags = raw[hb + 2]
        if flags & 0x06:
            raise ValueError("laced SimpleBlock unsupported")
        return tn

    def walk_tree(p: int, e: int) -> None:
        for cid, b, be in _walk(raw, p, e):
            if cid == _TSCALE:
                info["timescale_ns"] = _uint(raw, b, be)
            elif cid == _DURATION:
                if be - b == 8:
                    dur = struct.unpack(">d", raw[b:be])[0]
                elif be - b == 4:
                    dur = struct.unpack(">f", raw[b:be])[0]
                else:
                    raise ValueError("bad Matroska Duration size")
                info["duration_ms"] = int(
                    dur * info["timescale_ns"] / 1_000_000)
            elif cid == _TRACKENTRY:
                info["tracks"].append({"number": 0, "type": 0,
                                       "codec": "", "width": 0, "height": 0})
                walk_tree(b, be)
            elif cid == _TRACKNUM:
                info["tracks"][-1]["number"] = _uint(raw, b, be)
            elif cid == _TRACKTYPE:
                info["tracks"][-1]["type"] = _uint(raw, b, be)
            elif cid == _CODECID:
                info["tracks"][-1]["codec"] = raw[b:be].decode(
                    "ascii", "replace")
            elif cid == _PIXELW:
                info["tracks"][-1]["width"] = _uint(raw, b, be)
            elif cid == _PIXELH:
                info["tracks"][-1]["height"] = _uint(raw, b, be)
            elif cid == _CLUSTER:
                info["n_clusters"] += 1
                walk_tree(b, be)
            elif cid == _SIMPLEBLOCK:
                block_header(b, be)
                info["n_blocks"] += 1
            elif cid in (_INFO, _TRACKS, _VIDEO):
                walk_tree(b, be)

    walk_tree(pos, pos + size)
    if not info["tracks"]:
        raise ValueError("Matroska stream has no tracks")
    return info


def np_demux_mkv_mjpeg(raw: bytes) -> tuple[list[bytes], dict]:
    """Extract the JPEG payloads of the first V_MJPEG video track.
    Other codecs → NotImplementedError (container validated first)."""
    info = np_probe_matroska(raw)
    vids = [t for t in info["tracks"] if t["type"] == 1]
    if not vids:
        raise ValueError("Matroska stream has no video track")
    if vids[0]["codec"] != "V_MJPEG":
        raise NotImplementedError(
            f"Matroska codec {vids[0]['codec']!r}: only V_MJPEG is "
            "decodable here (VP8/VP9/AV1 need entropy decoders with "
            "normative probability tables — ffmpeg path in the "
            "reference)"
        )
    want = vids[0]["number"]
    frames: list[bytes] = []
    pos = 0
    _, pos = _read_vint(raw, pos, True)
    size, pos = _read_vint(raw, pos, False)
    pos += size                                  # skip EBML header
    _, pos = _read_vint(raw, pos, True)          # Segment
    size, pos = _read_vint(raw, pos, False)

    def collect(p: int, e: int) -> None:
        for cid, b, be in _walk(raw, p, e):
            if cid == _CLUSTER:
                collect(b, be)
            elif cid == _SIMPLEBLOCK:
                tn, hb = _read_vint(raw, b, False)
                if tn == want:
                    frames.append(raw[hb + 3:be])

    collect(pos, pos + size)
    if not frames:
        raise ValueError("Matroska V_MJPEG track has no blocks")
    return frames, vids[0]


def np_parse_mkv_mjpeg(raw: bytes) -> tuple[np.ndarray, int]:
    """Matroska/V_MJPEG → ((nf, h, w) uint8 luma frames, fps) through
    the repo's JPEG decoder — mirror of np_parse_avi_mjpeg."""
    from streamprocess_spark.functions.jpeg import np_decode_jpeg_gray

    payloads, track = np_demux_mkv_mjpeg(raw)
    info = np_probe_matroska(raw)
    imgs = [np_decode_jpeg_gray(p) for p in payloads]
    shape0 = imgs[0].shape
    if any(i.shape != shape0 for i in imgs):
        raise ValueError("Matroska frames disagree on dimensions")
    dur = info["duration_ms"]
    fps = len(imgs) * 1000 // dur if dur else 0
    return np.stack(imgs), fps


# ------------------------------------------------------------ builder


def _vint_id(n: int) -> bytes:
    return n.to_bytes((n.bit_length() + 7) // 8, "big")


def _vint_size(n: int) -> bytes:
    for length in range(1, 9):
        if n < (1 << (7 * length)) - 1:
            return ((1 << (7 * length)) | n).to_bytes(length, "big")
    raise ValueError("EBML size too large")


def _el(eid: int, payload: bytes) -> bytes:
    return _vint_id(eid) + _vint_size(len(payload)) + payload


def _el_uint(eid: int, v: int) -> bytes:
    return _el(eid, v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big"))


def np_build_mkv_mjpeg(frames: list[bytes], width: int, height: int,
                       fps: int = 10, doctype: str = "matroska") -> bytes:
    """Spec-valid Matroska fixture: one V_MJPEG video track, one
    Cluster per frame, SimpleBlocks keyframe-flagged, Duration from
    the frame count at the default 1 ms timescale."""
    if not frames:
        raise ValueError("need at least one frame")
    dur_ms = len(frames) * 1000 // fps
    head = _el(_EBML_HEAD, _el(_DOCTYPE, doctype.encode()))
    seg_info = _el(_INFO, _el_uint(_TSCALE, 1_000_000)
                   + _el(_DURATION, struct.pack(">d", float(dur_ms))))
    track = _el(_TRACKENTRY,
                _el_uint(_TRACKNUM, 1) + _el_uint(_TRACKTYPE, 1)
                + _el(_CODECID, b"V_MJPEG")
                + _el(_VIDEO, _el_uint(_PIXELW, width)
                      + _el_uint(_PIXELH, height)))
    tracks = _el(_TRACKS, track)
    clusters = b""
    for i, f in enumerate(frames):
        blk = _el(_SIMPLEBLOCK,
                  b"\x81" + int(0).to_bytes(2, "big") + b"\x80" + f)
        clusters += _el(_CLUSTER,
                        _el_uint(_TIMESTAMP, i * 1000 // fps) + blk)
    return head + _el(_SEGMENT, seg_info + tracks + clusters)


# ----------------------------------------------- V_MPEG4/ISO/AVC track

_CODECPRIV = 0x63A2  # CodecPrivate: carries avcC for H.264 tracks


def _track_codec_private(raw: bytes, want_track: int) -> bytes:
    """Fetch the CodecPrivate bytes of a track (avcC for AVC)."""
    pos = 0
    _, pos = _read_vint(raw, pos, True)
    size, pos = _read_vint(raw, pos, False)
    pos += size
    _, pos = _read_vint(raw, pos, True)          # Segment
    size, pos = _read_vint(raw, pos, False)
    for cid, b, be in _walk(raw, pos, pos + size):
        if cid != _TRACKS:
            continue
        for tid, tb, te in _walk(raw, b, be):
            if tid != _TRACKENTRY:
                continue
            num = None
            priv = None
            for eid, eb, ee in _walk(raw, tb, te):
                if eid == _TRACKNUM:
                    num = _uint(raw, eb, ee)
                elif eid == _CODECPRIV:
                    priv = raw[eb:ee]
            if num == want_track:
                if priv is None:
                    raise ValueError("AVC track missing CodecPrivate")
                return priv
    raise ValueError("track entry not found for CodecPrivate")


def np_parse_mkv_avc(raw: bytes) -> tuple[np.ndarray, int]:
    """Matroska/V_MPEG4/ISO/AVC → ((nf, h, w) luma frames, fps): the
    CodecPrivate avcC record supplies SPS/PPS and the NAL length size,
    SimpleBlock payloads are length-prefixed NALs (the same layout as
    MP4 'avc1'); decode through the H.264 I-slice subset (I_PCM and
    Intra_16x16 CAVLC macroblocks)."""
    from streamprocess_spark.functions.h264_islice import (
        np_decode_h264_islice as np_decode_h264_ipcm,
    )
    from streamprocess_spark.functions.mp4 import _parse_avcc

    info = np_probe_matroska(raw)
    vids = [t for t in info["tracks"] if t["type"] == 1]
    if not vids or vids[0]["codec"] != "V_MPEG4/ISO/AVC":
        raise ValueError("Matroska stream has no AVC video track")
    want = vids[0]["number"]
    priv = _track_codec_private(raw, want)
    avcc = _parse_avcc(priv, 0, len(priv))
    ls = avcc["length_size"]

    blocks: list[bytes] = []
    pos = 0
    _, pos = _read_vint(raw, pos, True)
    size, pos = _read_vint(raw, pos, False)
    pos += size
    _, pos = _read_vint(raw, pos, True)
    size, pos = _read_vint(raw, pos, False)

    def collect(p: int, e: int) -> None:
        for cid, b, be in _walk(raw, p, e):
            if cid == _CLUSTER:
                collect(b, be)
            elif cid == _SIMPLEBLOCK:
                tn, hb = _read_vint(raw, b, False)
                if tn == want:
                    blocks.append(raw[hb + 3:be])

    collect(pos, pos + size)
    if not blocks:
        raise ValueError("Matroska AVC track has no blocks")
    annexb = [b"\x00\x00\x00\x01" + u for u in avcc["sps"] + avcc["pps"]]
    for blk in blocks:
        p = 0
        while p < len(blk):
            if p + ls > len(blk):
                raise ValueError("AVC block NAL length overruns")
            ln = int.from_bytes(blk[p:p + ls], "big")
            p += ls
            if p + ln > len(blk):
                raise ValueError("AVC block NAL overruns block")
            annexb.append(b"\x00\x00\x00\x01" + blk[p:p + ln])
            p += ln
    frames = np_decode_h264_ipcm(b"".join(annexb))
    dur = info["duration_ms"]
    fps = len(frames) * 1000 // dur if dur else 0
    return np.stack(frames), fps


def np_parse_mkv_video(raw: bytes) -> tuple[np.ndarray, int]:
    """Dispatch the first Matroska video track to its codec path:
    V_MJPEG or V_MPEG4/ISO/AVC (I_PCM subset). Others raise
    NotImplementedError with the container validated."""
    info = np_probe_matroska(raw)
    vids = [t for t in info["tracks"] if t["type"] == 1]
    if not vids:
        raise ValueError("Matroska stream has no video track")
    codec = vids[0]["codec"]
    if codec == "V_MJPEG":
        return np_parse_mkv_mjpeg(raw)
    if codec == "V_MPEG4/ISO/AVC":
        return np_parse_mkv_avc(raw)
    raise NotImplementedError(
        f"Matroska codec {codec!r}: V_MJPEG and V_MPEG4/ISO/AVC "
        "(I_PCM subset) decode here; VP8/VP9/AV1 need entropy decoders "
        "with normative probability tables"
    )


def np_build_mkv_avc(frames_gray, fps: int = 10,
                     es: bytes | None = None) -> bytes:
    """Spec-valid Matroska fixture: one V_MPEG4/ISO/AVC track whose
    CodecPrivate is the avcC record and whose SimpleBlocks carry
    length-prefixed I_PCM IDR NALs (mirrors np_build_mp4_avc1). Pass
    `es` to wrap a pre-built Annex B stream (e.g. the compressed
    Intra_16x16 encoder) instead."""
    import struct as _struct

    from streamprocess_spark.functions.h264 import (
        NAL_IDR,
        NAL_PPS,
        NAL_SPS,
        np_build_h264_ipcm,
        split_annexb_raw,
    )

    if not frames_gray:
        raise ValueError("need at least one frame")
    h, w = frames_gray[0].shape
    units = split_annexb_raw(
        es if es is not None else np_build_h264_ipcm(list(frames_gray))
    )
    sps = [u for t, u in units if t == NAL_SPS]
    pps = [u for t, u in units if t == NAL_PPS]
    idr = [u for t, u in units if t == NAL_IDR]
    avcc = (
        bytes([1, sps[0][1], sps[0][2], sps[0][3], 0xFF])
        + bytes([0xE0 | len(sps)])
        + b"".join(_struct.pack(">H", len(u)) + u for u in sps)
        + bytes([len(pps)])
        + b"".join(_struct.pack(">H", len(u)) + u for u in pps)
    )
    dur_ms = len(idr) * 1000 // fps
    head = _el(_EBML_HEAD, _el(_DOCTYPE, b"matroska"))
    seg_info = _el(_INFO, _el_uint(_TSCALE, 1_000_000)
                   + _el(_DURATION, struct.pack(">d", float(dur_ms))))
    track = _el(_TRACKENTRY,
                _el_uint(_TRACKNUM, 1) + _el_uint(_TRACKTYPE, 1)
                + _el(_CODECID, b"V_MPEG4/ISO/AVC")
                + _el(_CODECPRIV, avcc)
                + _el(_VIDEO, _el_uint(_PIXELW, w)
                      + _el_uint(_PIXELH, h)))
    tracks = _el(_TRACKS, track)
    clusters = b""
    for i, u in enumerate(idr):
        payload = _struct.pack(">I", len(u)) + u
        blk = _el(_SIMPLEBLOCK,
                  b"\x81" + int(0).to_bytes(2, "big") + b"\x80" + payload)
        clusters += _el(_CLUSTER,
                        _el_uint(_TIMESTAMP, i * 1000 // fps) + blk)
    return head + _el(_SEGMENT, seg_info + tracks + clusters)
