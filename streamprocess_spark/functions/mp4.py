"""MP4 / ISO Base Media File Format container layer (SURVEY §2.1 S15
video residue).

The reference accepts MP4 uploads on its video path and decodes via
ffmpeg (src/workers — not present in this container). What this module
implements from the public ISO/IEC 14496-12 spec, dependency-free:

  - full box walk (size/type headers, 64-bit largesize, size-0 =
    to-EOF, nested containers) with totality — every malformed
    container raises ValueError (ingest dead-letter contract);
  - movie metadata: mvhd timescale/duration, per-track tkhd/mdhd/
    hdlr, stsd sample-entry fourcc + visual width/height;
  - the complete sample-table machinery: stts (decode durations),
    stsc (sample→chunk runs), stsz (sizes), stco/co64 (chunk
    offsets) — resolved to exact per-sample byte ranges and
    cross-checked against file bounds and each other;
  - real demux + DECODE for the QuickTime/ISO 'jpeg' video sample
    entry, where every sample is a complete baseline JPEG — routed
    through the repo's own from-scratch JPEG codec
    (functions/jpeg.py), the same path the AVI/MJPEG demuxer uses;
  - a spec-valid writer for fixtures (ftyp/mdat/moov with correct
    sample tables).

'avc1' tracks route through the H.264 I_PCM decoder
(functions/h264.py: real NAL/SPS/PPS/slice parsing, avcC parameter
sets, length-prefixed sample NALs) — spec-compliant H.264 both ways
for the I_PCM macroblock subset. Codecs that need entropy-coded
bitstream decoders with normative tables not derivable offline
(compressed-macroblock H.264 CAVLC/CABAC, vp09, hev1) raise
NotImplementedError at the sample-decode boundary, with the container
fully validated first — same boundary policy as MP3/OPUS
(functions/mpeg_audio.py, functions/ogg_opus.py).

Scale: pure per-row byte parsing behind Arrow pandas UDFs — map-only.
"""

from __future__ import annotations

import struct

import numpy as np

_U32 = struct.Struct(">I")
_U64 = struct.Struct(">Q")


def looks_like_mp4(raw: bytes) -> bool:
    return len(raw) >= 12 and raw[4:8] == b"ftyp"


# ----------------------------------------------------------- box walk


def _iter_boxes(raw: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_end) for each box in [pos, end)."""
    while pos < end:
        if pos + 8 > end:
            raise ValueError(f"truncated MP4 box header at {pos}")
        size = _U32.unpack_from(raw, pos)[0]
        typ = raw[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:                          # 64-bit largesize
            if pos + 16 > end:
                raise ValueError("truncated MP4 largesize")
            size = _U64.unpack_from(raw, pos + 8)[0]
            body = pos + 16
            if size < 16:
                raise ValueError("MP4 largesize smaller than header")
        elif size == 0:                        # box extends to EOF
            size = end - pos
        elif size < 8:
            raise ValueError(f"MP4 box size {size} smaller than header")
        if pos + size > end:
            raise ValueError(f"MP4 box {typ!r} overruns container")
        yield typ, body, pos + size
        pos += size


def _find(raw: bytes, pos: int, end: int, fourcc: bytes) -> tuple[int, int]:
    for typ, b, e in _iter_boxes(raw, pos, end):
        if typ == fourcc:
            return b, e
    raise ValueError(f"MP4 missing {fourcc!r} box")


def _full(raw: bytes, body: int) -> tuple[int, int]:
    """(version, flags) of a FullBox; caller advances body by 4."""
    v = raw[body]
    fl = int.from_bytes(raw[body + 1:body + 4], "big")
    return v, fl


# ------------------------------------------------------- sample table


def _parse_stbl(raw: bytes, b: int, e: int) -> dict:
    out: dict = {}
    for typ, bb, be in _iter_boxes(raw, b, e):
        if typ == b"stsd":
            v, _ = _full(raw, bb)
            n = _U32.unpack_from(raw, bb + 4)[0]
            if n < 1:
                raise ValueError("MP4 stsd has no sample entries")
            # first sample entry: size + fourcc
            es = _U32.unpack_from(raw, bb + 8)[0]
            if es < 16 or bb + 8 + es > be:
                raise ValueError("MP4 stsd entry overruns box")
            out["codec"] = raw[bb + 12:bb + 16].decode("ascii", "replace")
            # VisualSampleEntry: width/height at +24/+26 past entry start
            if es >= 36:
                out["width"] = struct.unpack_from(">H", raw, bb + 8 + 32)[0]
                out["height"] = struct.unpack_from(">H", raw, bb + 8 + 34)[0]
        elif typ == b"stts":
            n = _U32.unpack_from(raw, bb + 4)[0]
            if bb + 8 + 8 * n > be:
                raise ValueError("MP4 stts overruns box")
            ent = [struct.unpack_from(">II", raw, bb + 8 + 8 * i)
                   for i in range(n)]
            out["stts"] = ent
        elif typ == b"stsc":
            n = _U32.unpack_from(raw, bb + 4)[0]
            if bb + 8 + 12 * n > be:
                raise ValueError("MP4 stsc overruns box")
            out["stsc"] = [struct.unpack_from(">III", raw, bb + 8 + 12 * i)
                           for i in range(n)]
        elif typ == b"stsz":
            fixed = _U32.unpack_from(raw, bb + 4)[0]
            n = _U32.unpack_from(raw, bb + 8)[0]
            if fixed == 0:
                if bb + 12 + 4 * n > be:
                    raise ValueError("MP4 stsz overruns box")
                sizes = list(struct.unpack_from(f">{n}I", raw, bb + 12))
            else:
                sizes = [fixed] * n
            out["sizes"] = sizes
        elif typ == b"stco":
            n = _U32.unpack_from(raw, bb + 4)[0]
            if bb + 8 + 4 * n > be:
                raise ValueError("MP4 stco overruns box")
            out["chunks"] = list(struct.unpack_from(f">{n}I", raw, bb + 8))
        elif typ == b"co64":
            n = _U32.unpack_from(raw, bb + 4)[0]
            if bb + 8 + 8 * n > be:
                raise ValueError("MP4 co64 overruns box")
            out["chunks"] = list(struct.unpack_from(f">{n}Q", raw, bb + 8))
    for need in ("codec", "stts", "stsc", "sizes", "chunks"):
        if need not in out:
            raise ValueError(f"MP4 sample table missing {need}")
    return out


def _sample_ranges(stbl: dict, file_len: int) -> list[tuple[int, int]]:
    """Resolve stsc/stco/stsz to absolute (start, end) per sample,
    bounds-checked (ISO 14496-12 §8.7)."""
    sizes, chunks, stsc = stbl["sizes"], stbl["chunks"], stbl["stsc"]
    n_chunks = len(chunks)
    # expand stsc runs: samples-per-chunk for each chunk index (1-based)
    if not stsc or stsc[0][0] != 1:
        raise ValueError("MP4 stsc must start at chunk 1")
    per_chunk = []
    for i, (first, spc, _sdi) in enumerate(stsc):
        last = stsc[i + 1][0] - 1 if i + 1 < len(stsc) else n_chunks
        if first > last:
            raise ValueError("MP4 stsc chunk runs not increasing")
        per_chunk += [spc] * (last - first + 1)
    if len(per_chunk) != n_chunks:
        raise ValueError("MP4 stsc does not cover every chunk")
    ranges: list[tuple[int, int]] = []
    si = 0
    for ci, base in enumerate(chunks):
        at = base
        for _ in range(per_chunk[ci]):
            if si >= len(sizes):
                raise ValueError("MP4 stsc references more samples than stsz")
            end = at + sizes[si]
            if end > file_len:
                raise ValueError("MP4 sample overruns file")
            ranges.append((at, end))
            at = end
            si += 1
    if si != len(sizes):
        raise ValueError("MP4 chunk map leaves samples unplaced")
    return ranges


# ---------------------------------------------------------- probe API


def np_probe_mp4(raw: bytes) -> dict:
    """Validate the whole container; return movie + track metadata.
    Raises ValueError on any structural damage."""
    if not looks_like_mp4(raw):
        raise ValueError("not an MP4 (no ftyp)")
    end = len(raw)
    ftyp_b, ftyp_e = _find(raw, 0, end, b"ftyp")
    brand = raw[ftyp_b:ftyp_b + 4].decode("ascii", "replace")
    moov_b, moov_e = _find(raw, 0, end, b"moov")
    mv_b, mv_e = _find(raw, moov_b, moov_e, b"mvhd")
    v, _ = _full(raw, mv_b)
    if v == 1:
        timescale = _U32.unpack_from(raw, mv_b + 4 + 16)[0]
        duration = _U64.unpack_from(raw, mv_b + 4 + 20)[0]
    else:
        timescale = _U32.unpack_from(raw, mv_b + 4 + 8)[0]
        duration = _U32.unpack_from(raw, mv_b + 4 + 12)[0]
    if timescale == 0:
        raise ValueError("MP4 mvhd timescale 0")
    tracks = []
    for typ, tb, te in _iter_boxes(raw, moov_b, moov_e):
        if typ != b"trak":
            continue
        md_b, md_e = _find(raw, tb, te, b"mdia")
        mh_b, _ = _find(raw, md_b, md_e, b"mdhd")
        mv2, _fl = _full(raw, mh_b)
        if mv2 == 1:
            mts = _U32.unpack_from(raw, mh_b + 4 + 16)[0]
            mdur = _U64.unpack_from(raw, mh_b + 4 + 20)[0]
        else:
            mts = _U32.unpack_from(raw, mh_b + 4 + 8)[0]
            mdur = _U32.unpack_from(raw, mh_b + 4 + 12)[0]
        if mts == 0:
            raise ValueError("MP4 mdhd timescale 0")
        hd_b, hd_e = _find(raw, md_b, md_e, b"hdlr")
        handler = raw[hd_b + 8:hd_b + 12].decode("ascii", "replace")
        mi_b, mi_e = _find(raw, md_b, md_e, b"minf")
        st_b, st_e = _find(raw, mi_b, mi_e, b"stbl")
        stbl = _parse_stbl(raw, st_b, st_e)
        ranges = _sample_ranges(stbl, len(raw))
        stts_samples = sum(c for c, _d in stbl["stts"])
        if stts_samples != len(stbl["sizes"]):
            raise ValueError("MP4 stts/stsz sample counts disagree")
        stts_dur = sum(c * d for c, d in stbl["stts"])
        # real-world muxers legitimately disagree here (edit lists,
        # last-sample rounding): tolerate up to one sample's duration,
        # and surface larger gaps as a warning field rather than
        # dead-lettering a valid file (round-4 advice). Structural
        # corruption is still caught by the stts/stsz count check.
        max_sample_dur = max((d for _c, d in stbl["stts"]), default=0)
        delta = int(mdur) - int(stts_dur)
        duration_warning = (
            f"stts/mdhd duration mismatch: {stts_dur} vs {mdur}"
            if abs(delta) > max_sample_dur
            else None
        )
        tracks.append({
            "handler": handler,
            "codec": stbl["codec"],
            "n_samples": len(ranges),
            "width": int(stbl.get("width", 0)),
            "height": int(stbl.get("height", 0)),
            "duration_ms": int(mdur * 1000 // mts),
            "total_bytes": int(sum(e - s for s, e in ranges)),
            "duration_warning": duration_warning,
        })
    if not tracks:
        raise ValueError("MP4 has no tracks")
    return {
        "brand": brand,
        "timescale": int(timescale),
        "duration_ms": int(duration * 1000 // timescale),
        "n_tracks": len(tracks),
        "tracks": tracks,
    }


def np_demux_mp4_jpeg(raw: bytes) -> tuple[list[bytes], dict]:
    """Extract the JPEG samples of the first 'jpeg'-coded video track.
    Other codecs → NotImplementedError (container validated first)."""
    info = np_probe_mp4(raw)
    vids = [t for t in info["tracks"] if t["handler"] == "vide"]
    if not vids:
        raise ValueError("MP4 has no video track")
    codec = vids[0]["codec"]
    if codec != "jpeg":
        raise NotImplementedError(
            f"MP4 codec {codec!r}: only 'jpeg' sample entries are "
            "decodable here (H.264/VP9/HEVC need entropy decoders with "
            "normative tables — ffmpeg path in the reference)"
        )
    # re-walk to the jpeg track's table for the ranges
    moov_b, moov_e = _find(raw, 0, len(raw), b"moov")
    for typ, tb, te in _iter_boxes(raw, moov_b, moov_e):
        if typ != b"trak":
            continue
        md_b, md_e = _find(raw, tb, te, b"mdia")
        hd_b, _ = _find(raw, md_b, md_e, b"hdlr")
        if raw[hd_b + 8:hd_b + 12] != b"vide":
            continue
        mi_b, mi_e = _find(raw, md_b, md_e, b"minf")
        st_b, st_e = _find(raw, mi_b, mi_e, b"stbl")
        stbl = _parse_stbl(raw, st_b, st_e)
        if stbl["codec"] != "jpeg":
            continue
        ranges = _sample_ranges(stbl, len(raw))
        if not ranges:
            raise ValueError("MP4 jpeg track has no samples")
        return [raw[s:e] for s, e in ranges], vids[0]
    raise ValueError("MP4 jpeg track table not found")


def np_parse_mp4_jpeg(raw: bytes) -> tuple[np.ndarray, int]:
    """MP4/'jpeg' → ((nf, h, w) uint8 luma frames, fps) through the
    repo's own baseline JPEG decoder — mirror of np_parse_avi_mjpeg."""
    from streamprocess_spark.functions.jpeg import np_decode_jpeg_gray

    payloads, track = np_demux_mp4_jpeg(raw)
    imgs = [np_decode_jpeg_gray(p) for p in payloads]
    shape0 = imgs[0].shape
    if any(i.shape != shape0 for i in imgs):
        raise ValueError("MP4 frames disagree on dimensions")
    dur = track["duration_ms"]
    fps = track["n_samples"] * 1000 // dur if dur else 0
    return np.stack(imgs), fps


# ------------------------------------------------------------ builder


def _box(typ: bytes, *parts: bytes) -> bytes:
    body = b"".join(parts)
    return _U32.pack(8 + len(body)) + typ + body


def _fbox(typ: bytes, version: int, flags: int, *parts: bytes) -> bytes:
    return _box(typ, bytes([version]) + flags.to_bytes(3, "big"), *parts)


def np_build_mp4_mjpeg(frames: list[bytes], width: int, height: int,
                       fps: int = 10) -> bytes:
    """Spec-valid unfragmented MP4: one 'vide' track whose samples are
    the given complete JPEG images ('jpeg' VisualSampleEntry), all in
    one chunk inside mdat, full stts/stsc/stsz/stco tables."""
    return _assemble_mp4_video(frames, width, height, fps, b"jpeg", b"")


def _assemble_mp4_video(frames: list[bytes], width: int, height: int,
                        fps: int, fourcc: bytes,
                        entry_children: bytes) -> bytes:
    """Shared unfragmented-MP4 assembly for one video track; the
    sample-entry fourcc and its child boxes (e.g. avcC) vary."""
    if not frames:
        raise ValueError("need at least one frame")
    nf = len(frames)
    timescale = fps * 100
    delta = 100                                # exact: fps frames/sec
    duration = nf * delta
    ftyp = _box(b"ftyp", b"isom", _U32.pack(0x200), b"isom", b"iso2",
                b"mp41")
    mdat = _box(b"mdat", *frames)
    first_sample = len(ftyp) + 8               # mdat body start
    mvhd = _fbox(b"mvhd", 0, 0,
                 _U32.pack(0), _U32.pack(0),   # times
                 _U32.pack(timescale), _U32.pack(duration),
                 _U32.pack(0x00010000),        # rate 1.0
                 struct.pack(">H", 0x0100),    # volume
                 b"\x00" * 10,
                 # identity matrix
                 _U32.pack(0x10000), _U32.pack(0), _U32.pack(0),
                 _U32.pack(0), _U32.pack(0x10000), _U32.pack(0),
                 _U32.pack(0), _U32.pack(0), _U32.pack(0x40000000),
                 b"\x00" * 24,                 # pre_defined
                 _U32.pack(2))                 # next_track_ID
    tkhd = _fbox(b"tkhd", 0, 3,
                 _U32.pack(0), _U32.pack(0), _U32.pack(1),  # track 1
                 _U32.pack(0), _U32.pack(duration),
                 b"\x00" * 8,
                 struct.pack(">hh", 0, 0),     # layer, alt group
                 struct.pack(">H", 0),         # volume (video)
                 b"\x00" * 2,
                 _U32.pack(0x10000), _U32.pack(0), _U32.pack(0),
                 _U32.pack(0), _U32.pack(0x10000), _U32.pack(0),
                 _U32.pack(0), _U32.pack(0), _U32.pack(0x40000000),
                 _U32.pack(width << 16), _U32.pack(height << 16))
    mdhd = _fbox(b"mdhd", 0, 0,
                 _U32.pack(0), _U32.pack(0),
                 _U32.pack(timescale), _U32.pack(duration),
                 struct.pack(">H", 0x55C4),    # 'und'
                 struct.pack(">H", 0))
    hdlr = _fbox(b"hdlr", 0, 0, _U32.pack(0), b"vide", b"\x00" * 12,
                 b"VideoHandler\x00")
    # VisualSampleEntry (ISO 14496-12 §12.1.3) + optional children
    entry = (_U32.pack(86 + len(entry_children)) + fourcc + b"\x00" * 6
             + struct.pack(">H", 1)            # data_reference_index
             + b"\x00" * 16
             + struct.pack(">HH", width, height)
             + _U32.pack(0x00480000) + _U32.pack(0x00480000)
             + _U32.pack(0) + struct.pack(">H", 1)
             + b"\x00" * 32                    # compressorname
             + struct.pack(">Hh", 24, -1)
             + entry_children)
    stsd = _fbox(b"stsd", 0, 0, _U32.pack(1), entry)
    stts = _fbox(b"stts", 0, 0, _U32.pack(1),
                 _U32.pack(nf), _U32.pack(delta))
    stsc = _fbox(b"stsc", 0, 0, _U32.pack(1),
                 _U32.pack(1), _U32.pack(nf), _U32.pack(1))
    stsz = _fbox(b"stsz", 0, 0, _U32.pack(0), _U32.pack(nf),
                 *(_U32.pack(len(f)) for f in frames))
    stco = _fbox(b"stco", 0, 0, _U32.pack(1), _U32.pack(first_sample))
    stbl = _box(b"stbl", stsd, stts, stsc, stsz, stco)
    vmhd = _fbox(b"vmhd", 0, 1, b"\x00" * 8)
    dref = _fbox(b"dref", 0, 0, _U32.pack(1), _fbox(b"url ", 0, 1))
    dinf = _box(b"dinf", dref)
    minf = _box(b"minf", vmhd, dinf, stbl)
    mdia = _box(b"mdia", mdhd, hdlr, minf)
    trak = _box(b"trak", tkhd, mdia)
    moov = _box(b"moov", mvhd, trak)
    return ftyp + mdat + moov


# --------------------------------------------------- avc1 (H.264) track


def _parse_avcc(raw: bytes, b: int, e: int) -> dict:
    """AVCDecoderConfigurationRecord (ISO 14496-15): parameter-set NAL
    units + the sample NAL length-field size."""
    if e - b < 7:
        raise ValueError("avcC record too short")
    if raw[b] != 1:
        raise ValueError(f"avcC configurationVersion {raw[b]}")
    length_size = (raw[b + 4] & 0x03) + 1
    pos = b + 5
    n_sps = raw[pos] & 0x1F
    pos += 1
    sps = []
    for _ in range(n_sps):
        ln = struct.unpack_from(">H", raw, pos)[0]
        pos += 2
        sps.append(raw[pos:pos + ln])
        pos += ln
    n_pps = raw[pos]
    pos += 1
    pps = []
    for _ in range(n_pps):
        ln = struct.unpack_from(">H", raw, pos)[0]
        pos += 2
        pps.append(raw[pos:pos + ln])
        pos += ln
    if not sps or not pps:
        raise ValueError("avcC missing SPS/PPS")
    return {"length_size": length_size, "sps": sps, "pps": pps}


def _find_avcc_in_stsd(raw: bytes, st_b: int, st_e: int) -> dict:
    """Locate the avcC child box of the first 'avc1' stsd entry."""
    for typ, bb, be in _iter_boxes(raw, st_b, st_e):
        if typ != b"stsd":
            continue
        entry = bb + 8           # first sample entry (size+fourcc at +0/+4)
        # children start after the 78-byte VisualSampleEntry body
        child = entry + 8 + 78
        for ctyp, cb, ce in _iter_boxes(raw, child,
                                        entry + _U32.unpack_from(raw, entry)[0]):
            if ctyp == b"avcC":
                return _parse_avcc(raw, cb, ce)
    raise ValueError("avc1 entry has no avcC box")


def np_parse_mp4_avc1(raw: bytes) -> tuple[np.ndarray, int]:
    """MP4/'avc1' → ((nf, h, w) uint8 luma frames, fps) through the
    H.264 I-slice decoder (functions/h264_islice.py): avcC parameter
    sets + length-prefixed sample NALs are reassembled into Annex B
    and decoded — I_PCM and Intra_16x16 CAVLC macroblocks both play;
    I_NxN/inter/CABAC raise NotImplementedError."""
    from streamprocess_spark.functions.h264_islice import (
        np_decode_h264_islice as np_decode_h264_ipcm,
    )

    info = np_probe_mp4(raw)
    vids = [t for t in info["tracks"] if t["handler"] == "vide"]
    if not vids or vids[0]["codec"] != "avc1":
        raise ValueError("MP4 has no avc1 video track")
    moov_b, moov_e = _find(raw, 0, len(raw), b"moov")
    for typ, tb, te in _iter_boxes(raw, moov_b, moov_e):
        if typ != b"trak":
            continue
        md_b, md_e = _find(raw, tb, te, b"mdia")
        hd_b, _ = _find(raw, md_b, md_e, b"hdlr")
        if raw[hd_b + 8:hd_b + 12] != b"vide":
            continue
        mi_b, mi_e = _find(raw, md_b, md_e, b"minf")
        st_b, st_e = _find(raw, mi_b, mi_e, b"stbl")
        stbl = _parse_stbl(raw, st_b, st_e)
        if stbl["codec"] != "avc1":
            continue
        avcc = _find_avcc_in_stsd(raw, st_b, st_e)
        ranges = _sample_ranges(stbl, len(raw))
        if not ranges:
            raise ValueError("MP4 avc1 track has no samples")
        ls = avcc["length_size"]
        annexb = [b"\x00\x00\x00\x01" + u
                  for u in avcc["sps"] + avcc["pps"]]
        for s, e in ranges:
            pos = s
            while pos < e:
                if pos + ls > e:
                    raise ValueError("avc1 sample NAL length overruns")
                ln = int.from_bytes(raw[pos:pos + ls], "big")
                pos += ls
                if pos + ln > e:
                    raise ValueError("avc1 sample NAL overruns sample")
                annexb.append(b"\x00\x00\x00\x01" + raw[pos:pos + ln])
                pos += ln
        frames = np_decode_h264_ipcm(b"".join(annexb))
        track = vids[0]
        dur = track["duration_ms"]
        fps = track["n_samples"] * 1000 // dur if dur else 0
        return np.stack(frames), fps
    raise ValueError("MP4 avc1 track table not found")


def np_build_mp4_avc1(frames_gray: list[np.ndarray],
                      fps: int = 10, es: bytes | None = None) -> bytes:
    """Spec-valid unfragmented MP4 with one 'avc1' track: avcC carries
    the SPS/PPS, each sample is the length-prefixed IDR NAL of an
    I_PCM-coded frame (functions/h264.py encoder). Pass `es` to wrap a
    pre-built Annex B elementary stream instead (e.g. the compressed
    Intra_16x16 encoder, functions/h264_islice.py); frames_gray then
    only supplies the display dimensions."""
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
        es if es is not None else np_build_h264_ipcm(frames_gray)
    )
    sps = [u for t, u in units if t == NAL_SPS]
    pps = [u for t, u in units if t == NAL_PPS]
    idr = [u for t, u in units if t == NAL_IDR]
    avcc = (
        bytes([1, sps[0][1], sps[0][2], sps[0][3], 0xFF])  # cfg v1 + len=4
        + bytes([0xE0 | len(sps)])
        + b"".join(struct.pack(">H", len(u)) + u for u in sps)
        + bytes([len(pps)])
        + b"".join(struct.pack(">H", len(u)) + u for u in pps)
    )
    samples = [struct.pack(">I", len(u)) + u for u in idr]
    entry_children = _box(b"avcC", avcc)
    return _assemble_mp4_video(
        samples, w, h, fps, b"avc1", entry_children
    )


def np_parse_mp4_video(raw: bytes) -> tuple[np.ndarray, int]:
    """Dispatch the first video track to its codec path: 'jpeg' ->
    the baseline JPEG decoder, 'avc1' -> the H.264 I_PCM decoder.
    Other codecs raise NotImplementedError (container validated)."""
    info = np_probe_mp4(raw)
    vids = [t for t in info["tracks"] if t["handler"] == "vide"]
    if not vids:
        raise ValueError("MP4 has no video track")
    codec = vids[0]["codec"]
    if codec == "jpeg":
        return np_parse_mp4_jpeg(raw)
    if codec == "avc1":
        return np_parse_mp4_avc1(raw)
    raise NotImplementedError(
        f"MP4 codec {codec!r}: 'jpeg' and 'avc1' (I_PCM subset) decode "
        "here; VP9/HEVC/AV1 and compressed-macroblock H.264 need "
        "entropy decoders with normative tables"
    )
