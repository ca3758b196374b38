"""MPEG audio (MP3/MP2/MP1) container layer (SURVEY §2.1 S15 residue).

The reference accepts MP3 uploads (protos/stream_process.proto:75-81)
and decodes them via soundfile/ffmpeg (src/workers/stt_worker.py:
381-394). What this module implements from the public ISO 11172-3
spec, dependency-free:

  - full frame-walk prober: sync + header field decode (version,
    layer, bitrate/sample-rate tables, padding, channel mode), exact
    per-frame length arithmetic, cross-frame consistency checks,
    ID3v2 header skip (syncsafe size) and ID3v1 trailer detection,
    exact duration from samples-per-frame — everything the ingest
    edge needs to validate, route, meter, and dead-letter MPEG audio;
  - a structurally-valid frame builder for fixtures.

What it deliberately does NOT implement: PCM reconstruction. The
subband synthesis filterbank requires the 512-coefficient window
D[i] (ISO 11172-3 Annex B, Table 3-B.3) — normative TABULATED data
with no closed form, not reproducible from the spec's prose in this
offline container (unlike FLAC/JPEG, whose transforms are fully
formula-defined). A decoder with a wrong window would silently
produce wrong audio, which is worse than an explicit
NotImplementedError at the PCM boundary (functions/audio.py keeps
that error); the same applies to OPUS (RFC 6716 CELT/SILK codebooks).
The restricted-subset route the FLAC playbook used (from-scratch
encoder for fixtures) dead-ends for the same reason: a conforming
ENCODER needs the same tables.

Round-5 coefficient-sourcing attempt (closing the round-4 ask): the
retrieved public-content channel (PAPERS.md / SNIPPETS.md) was
searched for Table 3-B.3 / the Table 3-C.1 analysis prototype — zero
hits (no 11172/MPEG/polyphase material was retrieved at all). The
remaining Layer I/II pieces ARE formula-defined and would be
implementable the moment the 512 window values arrive: bit-allocation
table walk, scalefactor decode (six-bit indices into 2^(-i/3)
geometric grid), dequantization (ISO §2.4.3.3's closed-form
(s'''+D)*C grid for each quantizer), and the 32x64 matrixing
N(i,k) = cos((16+i)(2k+1)pi/64). The window alone gates PCM, so the
boundary stands as final for this container; the probe/duration layer
below remains the full extent of offline-derivable MP3 support.

Scale: pure per-row byte parsing behind Arrow pandas UDFs — map-only.
"""

from __future__ import annotations

import numpy as np

_BITRATE_V1 = {  # kbps, MPEG-1, bitrate index 1..14 (ISO 11172-3 §2.4.2.3)
    1: [32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    2: [32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    3: [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
}
_BITRATE_V2 = {  # MPEG-2 / 2.5 (ISO 13818-3)
    1: [32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    2: [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    3: [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_SR = {3: [44100, 48000, 32000], 2: [22050, 24000, 16000],
       0: [11025, 12000, 8000]}              # version code → rates
_SPF = {  # samples per frame: (is_mpeg1, layer)
    (True, 1): 384, (True, 2): 1152, (True, 3): 1152,
    (False, 1): 384, (False, 2): 1152, (False, 3): 576,
}


def _parse_header(b: bytes) -> dict | None:
    """One 4-byte frame header → fields, or None if not a valid sync."""
    if len(b) < 4:
        return None
    h = int.from_bytes(b[:4], "big")
    if (h >> 21) & 0x7FF != 0x7FF:
        return None
    ver_code = (h >> 19) & 3              # 0=2.5, 1=reserved, 2=V2, 3=V1
    layer_code = (h >> 17) & 3            # 1=III, 2=II, 3=I
    if ver_code == 1 or layer_code == 0:
        return None
    layer = 4 - layer_code
    br_idx = (h >> 12) & 0xF
    sr_idx = (h >> 10) & 3
    if br_idx in (0, 15) or sr_idx == 3:
        return None                       # free-format / reserved
    v1 = ver_code == 3
    kbps = (_BITRATE_V1 if v1 else _BITRATE_V2)[layer][br_idx - 1]
    sr = _SR[ver_code][sr_idx]
    padding = (h >> 9) & 1
    mode = (h >> 6) & 3
    if layer == 1:
        flen = (12 * kbps * 1000 // sr + padding) * 4
    else:
        coef = 144 if (v1 or layer == 2) else 72
        flen = coef * kbps * 1000 // sr + padding
    return {
        "version": "1" if v1 else ("2" if ver_code == 2 else "2.5"),
        "layer": layer, "kbps": kbps, "sample_rate": sr,
        "channels": 1 if mode == 3 else 2,
        "frame_len": flen,
        "spf": _SPF[(v1, layer)],
    }


def looks_like_mpeg_audio(raw: bytes) -> bool:
    """Cheap sniff: ID3v2 tag, or a valid frame sync at byte 0."""
    if raw[:3] == b"ID3":
        return True
    return _parse_header(raw[:4]) is not None


def np_probe_mpeg_audio(raw: bytes) -> dict:
    """Walk EVERY frame of an MPEG audio stream: validates sync and
    per-frame header consistency, returns stream metadata + exact
    duration. Raises ValueError on any malformed byte (the ingest
    dead-letter boundary)."""
    pos = 0
    if raw[:3] == b"ID3":                 # ID3v2: syncsafe 28-bit size
        if len(raw) < 10:
            raise ValueError("truncated ID3v2 header")
        sz = ((raw[6] & 0x7F) << 21) | ((raw[7] & 0x7F) << 14) \
            | ((raw[8] & 0x7F) << 7) | (raw[9] & 0x7F)
        pos = 10 + sz
    n_frames = 0
    samples = 0
    first: dict | None = None
    bytes_audio = 0
    while pos + 4 <= len(raw):
        if raw[pos:pos + 3] == b"TAG" and len(raw) - pos == 128:
            break                         # ID3v1 trailer
        hdr = _parse_header(raw[pos:pos + 4])
        if hdr is None:
            raise ValueError(f"bad MPEG frame sync at byte {pos}")
        if first is None:
            first = hdr
        elif (hdr["version"], hdr["layer"], hdr["sample_rate"]) != (
            first["version"], first["layer"], first["sample_rate"]
        ):
            raise ValueError("inconsistent stream parameters mid-stream")
        if pos + hdr["frame_len"] > len(raw):
            raise ValueError("truncated final MPEG frame")
        n_frames += 1
        samples += hdr["spf"]
        bytes_audio += hdr["frame_len"]
        pos += hdr["frame_len"]
    if first is None or n_frames == 0:
        raise ValueError("no MPEG audio frames found")
    return {
        "version": first["version"], "layer": first["layer"],
        "sample_rate": first["sample_rate"], "channels": first["channels"],
        "n_frames": n_frames,
        "duration_ms": samples * 1000 // first["sample_rate"],
        "avg_kbps": bytes_audio * 8 * first["sample_rate"]
        // (samples * 1000) if samples else 0,
    }


def np_build_mpeg_frames(n_frames: int, layer: int = 3, kbps: int = 128,
                         sr: int = 44100, seed: int = 0,
                         id3_title: str | None = None) -> bytes:
    """Structurally valid MPEG-1 stream for fixtures: correct headers
    and frame lengths, deterministic filler payload (NOT decodable
    audio — module docstring explains why a conforming payload is out
    of reach here). Good enough to exercise every prober branch and
    the ingest routing path."""
    tab = _BITRATE_V1[layer]
    br_idx = tab.index(kbps) + 1
    sr_idx = _SR[3].index(sr)
    layer_code = 4 - layer
    out = bytearray()
    if id3_title is not None:
        body = (b"TIT2" + (len(id3_title) + 1).to_bytes(4, "big")
                + b"\x00\x00\x03" + id3_title.encode())
        sz = len(body)
        out += b"ID3\x04\x00\x00" + bytes([
            (sz >> 21) & 0x7F, (sz >> 14) & 0x7F, (sz >> 7) & 0x7F, sz & 0x7F,
        ]) + body
    rng = np.random.default_rng(seed)
    for _ in range(n_frames):
        h = (0x7FF << 21) | (3 << 19) | (layer_code << 17) | (1 << 16) \
            | (br_idx << 12) | (sr_idx << 10) | (0 << 9) | (3 << 6)
        if layer == 1:
            flen = (12 * kbps * 1000 // sr) * 4
        else:
            flen = 144 * kbps * 1000 // sr
        payload = rng.integers(0, 255, flen - 4, dtype=np.uint8)
        payload[payload == 0xFF] = 0x7E   # no accidental sync bytes
        out += h.to_bytes(4, "big") + payload.tobytes()
    return bytes(out)
