"""Ogg/Opus container layer (SURVEY §2.1 S15 residue).

The reference accepts OPUS uploads (protos/stream_process.proto:75-81)
and decodes them via soundfile/ffmpeg (src/workers/stt_worker.py:
381-394). What this module implements from the public specs,
dependency-free:

  - RFC 3533 Ogg page walk: capture pattern, header-type flags
    (continued/BOS/EOS), granule positions, serials, page sequence
    continuity, the Ogg CRC-32 (poly 0x04C11DB7, unreflected, init 0)
    verified per page, lacing-value packet reassembly INCLUDING
    packets continued across pages (255-chains);
  - RFC 7845 Opus-in-Ogg: OpusHead (version, channels, pre-skip,
    input rate, output gain, mapping family) and OpusTags parse,
    granule-position duration at the normative 48 kHz clock with
    pre-skip subtracted;
  - RFC 6716 §3.1 TOC-byte arithmetic per audio packet: config →
    mode (SILK/Hybrid/CELT) and frame duration, stereo flag, frame
    count code c (0/1/2/3, with the code-3 VBR/padding byte) — giving
    an independent per-packet duration sum the prober cross-checks
    against the granule clock.

What it deliberately does NOT implement: PCM reconstruction. SILK and
CELT decode require normative tabulated codebooks (RFC 6716 appendix
tables) with no closed form — same boundary as MP3's subband window
(functions/mpeg_audio.py docstring); functions/audio.py keeps the
explicit NotImplementedError at the PCM layer.

Scale: pure per-row byte parsing behind Arrow pandas UDFs — map-only,
zero shuffles.
"""

from __future__ import annotations

import numpy as np

# --------------------------------------------------------------- Ogg CRC

_OGG_POLY = 0x04C11DB7


def _crc_table() -> np.ndarray:
    tab = np.zeros(256, dtype=np.uint32)
    for i in range(256):
        r = i << 24
        for _ in range(8):
            r = ((r << 1) ^ _OGG_POLY if r & 0x80000000 else r << 1) & 0xFFFFFFFF
        tab[i] = r
    return tab


_CRC_TAB = _crc_table()


def _ogg_crc(data: bytes) -> int:
    """RFC 3533 §6: CRC-32, poly 0x04C11DB7, no reflection, init 0,
    xorout 0 — NOT the zlib CRC."""
    crc = np.uint32(0)
    tab = _CRC_TAB
    for b in data:
        crc = np.uint32((int(crc) << 8) & 0xFFFFFFFF) ^ tab[(int(crc) >> 24) ^ b]
    return int(crc)


# ------------------------------------------------------------- TOC byte

# config (TOC >> 3) → frame duration in µs (RFC 6716 Table 2)
_SILK_MS = (10000, 20000, 40000, 60000)
_HYBRID_MS = (10000, 20000)
_CELT_MS = (2500, 5000, 10000, 20000)


def toc_info(toc: int) -> tuple[str, int]:
    """(mode, frame_duration_us) from an Opus TOC byte's config field."""
    config = toc >> 3
    if config < 12:                          # SILK-only, 3 bandwidths
        return "SILK", _SILK_MS[config % 4]
    if config < 16:                          # Hybrid, 2 bandwidths
        return "HYBRID", _HYBRID_MS[config % 2]
    return "CELT", _CELT_MS[config % 4]      # CELT, 4 bandwidths


def _packet_duration_us(pkt: bytes) -> tuple[str, int]:
    """(mode, total duration µs) of one Opus packet from its TOC byte
    and frame-count code (RFC 6716 §3.2)."""
    if not pkt:
        raise ValueError("empty Opus packet")
    toc = pkt[0]
    mode, per_frame = toc_info(toc)
    code = toc & 0x3
    if code == 0:
        n = 1
    elif code in (1, 2):
        n = 2
    else:                                    # code 3: count in next byte
        if len(pkt) < 2:
            raise ValueError("Opus code-3 packet missing count byte")
        n = pkt[1] & 0x3F
        if n == 0:
            raise ValueError("Opus code-3 packet with zero frames")
    total = n * per_frame
    if total > 120_000:                      # §3.2.5 hard limit
        raise ValueError(f"Opus packet duration {total}us exceeds 120ms")
    return mode, total


# ------------------------------------------------------------ page walk


def looks_like_ogg(raw: bytes) -> bool:
    return raw[:4] == b"OggS"


def _iter_pages(raw: bytes):
    """Yield (flags, granule, serial, seq, segments:list[bytes-lens],
    body) for each page, verifying structure + CRC."""
    pos = 0
    expect_seq: dict[int, int] = {}
    while pos < len(raw):
        if raw[pos:pos + 4] != b"OggS":
            raise ValueError(f"Ogg capture pattern missing at {pos}")
        hdr = raw[pos:pos + 27]
        if len(hdr) < 27:
            raise ValueError("truncated Ogg page header")
        if hdr[4] != 0:
            raise ValueError(f"Ogg version {hdr[4]} (only 0)")
        flags = hdr[5]
        granule = int.from_bytes(hdr[6:14], "little", signed=True)
        serial = int.from_bytes(hdr[14:18], "little")
        seq = int.from_bytes(hdr[18:22], "little")
        crc = int.from_bytes(hdr[22:26], "little")
        nseg = hdr[26]
        lace = raw[pos + 27:pos + 27 + nseg]
        if len(lace) < nseg:
            raise ValueError("truncated Ogg segment table")
        body_len = int(np.frombuffer(lace, dtype=np.uint8).sum()) if nseg else 0
        body = raw[pos + 27 + nseg:pos + 27 + nseg + body_len]
        if len(body) < body_len:
            raise ValueError("truncated Ogg page body")
        # CRC computed over the whole page with the CRC field zeroed
        page = bytearray(raw[pos:pos + 27 + nseg + body_len])
        page[22:26] = b"\x00\x00\x00\x00"
        if _ogg_crc(bytes(page)) != crc:
            raise ValueError(f"Ogg page CRC mismatch at {pos}")
        want = expect_seq.get(serial)
        if want is not None and seq != want:
            raise ValueError(f"Ogg page sequence gap: {seq} != {want}")
        expect_seq[serial] = seq + 1
        yield flags, granule, serial, seq, list(lace), body
        pos += 27 + nseg + body_len


def _iter_packets(raw: bytes):
    """Reassemble logical packets across pages (lacing 255-chains and
    the continued-packet flag). Yields (packet_bytes, granule_of_page
    _the_packet_ENDS_on, flags_of_that_page)."""
    partial = b""
    partial_open = False
    for flags, granule, serial, seq, lace, body in _iter_pages(raw):
        if bool(flags & 0x01) != partial_open:
            raise ValueError("Ogg continued-packet flag inconsistent")
        at = 0
        cur = partial
        for i, lv in enumerate(lace):
            cur += body[at:at + lv]
            at += lv
            if lv < 255:                      # packet boundary
                yield cur, granule, flags
                cur = b""
        partial = cur
        partial_open = len(cur) > 0
    if partial_open:
        raise ValueError("Ogg stream ends mid-packet")


def np_probe_ogg_opus(raw: bytes) -> dict:
    """Full-container probe: header fields + two independent duration
    clocks (granule position vs TOC sum). Raises ValueError on any
    structural damage — the ingest dead-letter contract."""
    if not looks_like_ogg(raw):
        raise ValueError("not an Ogg stream (no OggS capture pattern)")
    packets = _iter_packets(raw)
    try:
        head, g0, f0 = next(packets)
    except StopIteration:
        raise ValueError("Ogg stream has no packets") from None
    if head[:8] != b"OpusHead":
        raise ValueError("first Ogg packet is not OpusHead")
    if len(head) < 19:
        raise ValueError("OpusHead too short")
    version = head[8]
    if version >> 4 != 0:                    # RFC 7845 §5.1: major 0
        raise ValueError(f"OpusHead version {version} unsupported")
    channels = head[9]
    if channels == 0:
        raise ValueError("OpusHead channel count 0")
    pre_skip = int.from_bytes(head[10:12], "little")
    input_rate = int.from_bytes(head[12:16], "little")
    gain_q8 = int.from_bytes(head[16:18], "little", signed=True)
    mapping = head[18]
    try:
        tags, _, _ = next(packets)
    except StopIteration:
        raise ValueError("Ogg stream missing OpusTags") from None
    if tags[:8] != b"OpusTags":
        raise ValueError("second Ogg packet is not OpusTags")
    n_audio = 0
    toc_us = 0
    modes: set[str] = set()
    last_granule = 0
    saw_eos = False
    for pkt, granule, flags in packets:
        mode, us = _packet_duration_us(pkt)
        modes.add(mode)
        toc_us += us
        n_audio += 1
        if granule >= 0:
            last_granule = max(last_granule, granule)
        saw_eos = bool(flags & 0x04)
    if not saw_eos:
        raise ValueError("Ogg stream missing EOS page")
    # both clocks tick at the normative 48 kHz regardless of input rate
    dur_samples = max(0, last_granule - pre_skip)
    return {
        "channels": int(channels),
        "pre_skip": int(pre_skip),
        "input_sample_rate": int(input_rate),
        "output_gain_q8": int(gain_q8),
        "mapping_family": int(mapping),
        "n_packets": int(n_audio),
        "duration_ms": int(dur_samples * 1000 // 48000),
        "toc_duration_ms": int(toc_us // 1000),
        "modes": ",".join(sorted(modes)),
    }


# ------------------------------------------------------------- builder


def _page(serial: int, seq: int, granule: int, flags: int,
          segments: list[bytes]) -> bytes:
    """One Ogg page from pre-laced segment chunks (each ≤255 bytes)."""
    lace = bytes(len(s) for s in segments)
    body = b"".join(segments)
    hdr = (b"OggS" + bytes([0, flags])
           + granule.to_bytes(8, "little", signed=True)
           + serial.to_bytes(4, "little") + seq.to_bytes(4, "little")
           + b"\x00\x00\x00\x00" + bytes([len(segments)]) + lace)
    crc = _ogg_crc(hdr + body)
    return hdr[:22] + crc.to_bytes(4, "little") + hdr[26:] + body


def _lacing(pkt: bytes) -> list[bytes]:
    """Split one packet into lacing segments (255-chain + short tail;
    a packet of exactly k*255 bytes needs a 0-length terminator)."""
    segs = [pkt[i:i + 255] for i in range(0, len(pkt), 255)]
    if not segs or len(segs[-1]) == 255:
        segs.append(b"")
    return segs


def np_build_ogg_opus(
    n_packets: int,
    config: int = 1,
    channels: int = 1,
    pre_skip: int = 312,
    input_rate: int = 16000,
    frames_per_packet: int = 1,
    packets_per_page: int = 4,
    payload_bytes: int = 40,
    seed: int = 0,
) -> bytes:
    """Structurally-valid Opus-in-Ogg fixture: correct CRCs, BOS/EOS,
    granule positions advancing on the 48 kHz clock per the audio
    packets' own TOC arithmetic. Payload past the TOC is seeded noise
    (never decoded — PCM is out of scope by design)."""
    if not 0 <= config < 32:
        raise ValueError("config is 5 bits")
    rng = np.random.default_rng(seed)
    serial = 0x5350 + seed % 97
    # TOC: config<<3 | stereo<<2 | code (0 = 1 frame, 3 = N frames)
    stereo = 1 if channels == 2 else 0
    if frames_per_packet == 1:
        toc = bytes([(config << 3) | (stereo << 2) | 0])
        count = b""
    else:
        toc = bytes([(config << 3) | (stereo << 2) | 3])
        count = bytes([0x80 | frames_per_packet])  # CBR, padding=0
    _, per_frame_us = toc_info(toc[0])
    pkt_samples = frames_per_packet * per_frame_us * 48 // 1000
    head = (b"OpusHead" + bytes([1, channels])
            + pre_skip.to_bytes(2, "little")
            + input_rate.to_bytes(4, "little")
            + b"\x00\x00" + b"\x00")
    tags = b"OpusTags" + (4).to_bytes(4, "little") + b"spkg" \
        + (0).to_bytes(4, "little")
    pages = [_page(serial, 0, 0, 0x02, _lacing(head)),
             _page(serial, 1, 0, 0, _lacing(tags))]
    seq = 2
    granule = pre_skip
    done = 0
    while done < n_packets:
        take = min(packets_per_page, n_packets - done)
        segs: list[bytes] = []
        for _ in range(take):
            body = rng.integers(0, 256, payload_bytes, dtype=np.uint8)
            segs += _lacing(toc + count + body.tobytes())
            granule += pkt_samples
        done += take
        flags = 0x04 if done >= n_packets else 0
        pages.append(_page(serial, seq, granule, flags, segs))
        seq += 1
    return b"".join(pages)
