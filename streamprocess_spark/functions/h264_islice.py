"""H.264 compressed I-slice coding — Intra_16x16 macroblocks with
CAVLC residuals (ITU-T Rec. H.264 clauses 7.3.5, 8.3.3, 8.5, 9.2),
from the public specification, on top of the repo's NAL/SPS/PPS layer
(functions/h264.py) and the sparse-residual CAVLC codec
(functions/h264_cavlc.py).

This decodes REAL compressed macroblocks — quantized transform
coefficients, not I_PCM passthrough:

  encoder  np_encode_h264_i16: per macroblock, Intra_16x16 DC
    prediction from the RECONSTRUCTED neighbours (the closed encoder
    loop every real encoder runs), 4x4 integer forward transform,
    luma-DC Hadamard, quantization at a fixed QP, then a sparsity cap
    (keep the two largest-magnitude levels per block) so every block
    stays inside the CAVLC sparse-residual subset — a legal encoder
    operating point (see h264_cavlc.py). CodedBlockPatternChroma = 0
    (chroma carried by prediction only; the repo's frame model is
    luma-grayscale). The PPS sets
    deblocking_filter_control_present_flag and every slice disables
    the loop filter (disable_deblocking_filter_idc = 1, spec 7.4.3),
    so the in-loop filter is LEGALLY off and a conformant third-party
    decoder reproduces this decoder's output bit-for-bit.

  decoder  np_decode_h264_islice: full slice walk dispatching per
    mb_type — I_PCM (25) via raw samples, Intra_16x16 (1..24) via
    CAVLC residual decode (DC 4x4 Hadamard + per-block AC), spec-exact
    dequantization (8.5.10 luma DC, 8.5.12 residual, the normative
    v-matrix), prediction modes 0/1/2/3 (vertical, horizontal, DC,
    plane — 8.3.3), inverse integer transform with the (x+32)>>6
    output stage, and the 9.2.1 nC neighbour-context derivation
    (I_PCM neighbours count 16). I_NxN (mb_type 0) needs the 4x4
    intra-mode predictor machinery and raises NotImplementedError.

Everything here is formula-defined in the spec except the small
normative v-matrix (LevelScale, six rows of three — transcribed below
and cross-checked by the v*MF ~ 2^20 identity in the tests); the deep
CAVLC tables remain the documented boundary of h264_cavlc.py.
"""

from __future__ import annotations

import numpy as np

from streamprocess_spark.functions.h264 import (
    MB_I_PCM,
    NAL_IDR,
    NAL_PPS,
    NAL_SPS,
    _BitReader,
    _BitWriter,
    _nal,
    _parse_pps,
    _parse_sps,
    _write_sps,
    split_annexb_hdr,
)
from streamprocess_spark.functions.h264_cavlc import (
    decode_residual_block,
    encode_residual_block,
)

# ---------------------------------------------------------------------------
# normative scaling tables (8.5.12): v-matrix rows by qp % 6, columns
# by coefficient position class; MF is the matching (informative)
# encoder-side multiplier, kept here because the tests cross-check
# v * MF ~ 2^20 per class, which pins transcription errors in either
# ---------------------------------------------------------------------------

V_MATRIX = np.array([
    [10, 16, 13],
    [11, 18, 14],
    [13, 20, 16],
    [14, 23, 18],
    [16, 25, 20],
    [18, 29, 23],
], dtype=np.int64)

MF_MATRIX = np.array([
    [13107, 5243, 8066],
    [11916, 4660, 7490],
    [10082, 4194, 6554],
    [9362, 3647, 5825],
    [8192, 3355, 5243],
    [7282, 2893, 4559],
], dtype=np.int64)

# coefficient position class within a 4x4 block: 0 at the four
# even-even positions, 1 at the four odd-odd, 2 elsewhere
_POS_CLASS = np.array([
    [0, 2, 0, 2],
    [2, 1, 2, 1],
    [0, 2, 0, 2],
    [2, 1, 2, 1],
], dtype=np.int64)

# 4x4 zigzag scan (8.5.6): scan index -> (row, col)
ZIGZAG_4x4 = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (3, 1), (2, 2), (1, 3), (2, 3), (3, 2), (3, 3),
]

_HADAMARD = np.array([
    [1, 1, 1, 1],
    [1, 1, -1, -1],
    [1, -1, -1, 1],
    [1, -1, 1, -1],
], dtype=np.int64)

_CF = np.array([
    [1, 1, 1, 1],
    [2, 1, -1, -2],
    [1, -1, -1, 1],
    [1, -2, 2, -1],
], dtype=np.int64)

# luma4x4BlkIdx (7.4.5.3.2 inverse scan): block index -> (y4, x4) in
# 4x4 units inside the macroblock — 8x8 quadrant raster, then 4x4
# raster within the quadrant
_BLK_YX = [
    (2 * (b // 4 // 2) + (b % 4) // 2, 2 * (b // 4 % 2) + (b % 4) % 2)
    for b in range(16)
]


def _sr(x, n):
    """Spec '>>': arithmetic right shift (sign-extending) — numpy
    int64 >> matches; wrapped for readability."""
    return x >> n


def dequant_ac(coeffs_4x4: np.ndarray, qp: int) -> np.ndarray:
    """8.5.12.1 residual scaling with the flat (default) scaling list.
    LevelScale4x4(m,i,j) = weightScale(=16) * normAdjust(v); the
    unified d = (c * LS) << (qP/6) >> 4 collapses to (c*v) << (qP/6)
    exactly, for every qp — no rounding branch in the AC path."""
    ls = V_MATRIX[qp % 6][_POS_CLASS]
    return (coeffs_4x4.astype(np.int64) * ls) << (qp // 6)


def dequant_dc_luma(dc_4x4: np.ndarray, qp: int) -> np.ndarray:
    """8.5.10: inverse Hadamard on the 16 luma DC coefficients, then
    the DC-specific scaling with LevelScale(qp%6, (0,0)) = 16 * v0
    (the flat weightScale folds in here; only the DC path carries the
    rounded right-shift for qp < 36)."""
    f = _HADAMARD @ dc_4x4.astype(np.int64) @ _HADAMARD
    ls00 = 16 * int(V_MATRIX[qp % 6][0])
    if qp >= 36:
        return (f * ls00) << (qp // 6 - 6)
    return _sr(f * ls00 + (1 << (5 - qp // 6)), 6 - qp // 6)


def inverse_transform_4x4(d: np.ndarray) -> np.ndarray:
    """8.5.12.2: the 4x4 integer inverse transform, rows then columns,
    with the final (x + 32) >> 6 rounding. Input: dequantized
    coefficients with the DC already placed at (0,0)."""
    d = d.astype(np.int64)

    def stage(m):
        e0 = m[0] + m[2]
        e1 = m[0] - m[2]
        e2 = _sr(m[1], 1) - m[3]
        e3 = m[1] + _sr(m[3], 1)
        return np.stack([e0 + e3, e1 + e2, e1 - e2, e0 - e3])

    h = stage(d.T).T          # horizontal (row) stage
    g = stage(h)              # vertical (column) stage
    return _sr(g + 32, 6)


def forward_transform_4x4(residual: np.ndarray) -> np.ndarray:
    """Encoder-side 4x4 forward transform W = Cf X Cf^T (informative
    in the spec; only the decoder path is normative)."""
    return _CF @ residual.astype(np.int64) @ _CF.T


def quant_ac(w: np.ndarray, qp: int) -> np.ndarray:
    """Encoder-side quantization with the standard MF multipliers and
    the intra rounding offset f = 2^qbits / 3."""
    mf = MF_MATRIX[qp % 6][_POS_CLASS]
    qbits = 15 + qp // 6
    f = (1 << qbits) // 3
    return np.sign(w) * ((np.abs(w.astype(np.int64)) * mf + f) >> qbits)


def quant_dc_luma(w_dc: np.ndarray, qp: int) -> np.ndarray:
    """Encoder-side luma DC: forward Hadamard / 2, then quantize with
    MF(0,0) at qbits+1."""
    f_dc = _sr(_HADAMARD @ w_dc.astype(np.int64) @ _HADAMARD, 1)
    mf00 = int(MF_MATRIX[qp % 6][0])
    qbits = 15 + qp // 6
    off = 2 * ((1 << qbits) // 3)
    return np.sign(f_dc) * ((np.abs(f_dc) * mf00 + off) >> (qbits + 1))


def _keep_largest(levels: np.ndarray, k: int = 2) -> np.ndarray:
    """Sparsity cap: zero all but the k largest-|.| entries
    (deterministic tie-break: earlier scan position wins)."""
    flat = levels.reshape(-1)
    nz = np.flatnonzero(flat)
    if len(nz) <= k:
        return levels
    order = sorted(nz, key=lambda i: (-abs(int(flat[i])), i))
    out = np.zeros_like(flat)
    for i in order[:k]:
        out[i] = flat[i]
    return out.reshape(levels.shape)


def _scan(block_4x4: np.ndarray) -> list[int]:
    return [int(block_4x4[r, c]) for r, c in ZIGZAG_4x4]


def _unscan(coeffs: list[int]) -> np.ndarray:
    out = np.zeros((4, 4), dtype=np.int64)
    for idx, (r, c) in enumerate(ZIGZAG_4x4):
        out[r, c] = coeffs[idx]
    return out


# ---------------------------------------------------------------------------
# Intra 16x16 prediction (8.3.3)
# ---------------------------------------------------------------------------


def predict_16x16(plane: np.ndarray, my: int, mx: int, mode: int) -> np.ndarray:
    """Prediction for the MB at (my, mx) from already-reconstructed
    neighbour samples in `plane`. Modes: 0 vertical, 1 horizontal,
    2 DC, 3 plane."""
    y0, x0 = 16 * my, 16 * mx
    top = plane[y0 - 1, x0:x0 + 16].astype(np.int64) if my > 0 else None
    left = plane[y0:y0 + 16, x0 - 1].astype(np.int64) if mx > 0 else None
    if mode == 0:
        if top is None:
            raise ValueError("vertical prediction without top neighbour")
        return np.tile(top, (16, 1))
    if mode == 1:
        if left is None:
            raise ValueError("horizontal prediction without left neighbour")
        return np.tile(left[:, None], (1, 16))
    if mode == 2:
        if top is not None and left is not None:
            dc = (int(top.sum()) + int(left.sum()) + 16) >> 5
        elif top is not None:
            dc = (int(top.sum()) + 8) >> 4
        elif left is not None:
            dc = (int(left.sum()) + 8) >> 4
        else:
            dc = 128
        return np.full((16, 16), dc, dtype=np.int64)
    if mode == 3:
        if top is None or left is None or not (my > 0 and mx > 0):
            raise ValueError("plane prediction needs both neighbours")
        corner = int(plane[y0 - 1, x0 - 1])
        hh = sum((x + 1) * (int(top[8 + x])
                            - (int(top[6 - x]) if x < 7 else corner))
                 for x in range(8))
        vv = sum((y + 1) * (int(left[8 + y])
                            - (int(left[6 - y]) if y < 7 else corner))
                 for y in range(8))
        a = 16 * (int(top[15]) + int(left[15]))
        b = _sr(5 * hh + 32, 6)
        c = _sr(5 * vv + 32, 6)
        yy, xx = np.mgrid[0:16, 0:16]
        return np.clip(_sr(a + b * (xx - 7) + c * (yy - 7) + 16, 5), 0, 255)
    raise ValueError(f"intra 16x16 prediction mode {mode}")


# ---------------------------------------------------------------------------
# nC neighbour context (9.2.1)
# ---------------------------------------------------------------------------


def _nc(tc_grid: np.ndarray, gy: int, gx: int) -> int:
    """nC for the luma 4x4 block at global 4x4 coordinates (gy, gx):
    average of left/above TotalCoeff where available."""
    na = int(tc_grid[gy, gx - 1]) if gx > 0 else -1
    nb = int(tc_grid[gy - 1, gx]) if gy > 0 else -1
    if na >= 0 and nb >= 0:
        return (na + nb + 1) >> 1
    if na >= 0:
        return na
    if nb >= 0:
        return nb
    return 0


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _write_pps_i16() -> bytes:
    """PPS with deblocking_filter_control_present_flag = 1 so slices
    may legally disable the loop filter (spec 7.4.2.2)."""
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
    w.u(1, 1)    # deblocking_filter_control_present_flag
    w.u(0, 1)    # constrained_intra_pred_flag
    w.u(0, 1)    # redundant_pic_cnt_present_flag
    w.rbsp_trailing()
    return w.tobytes()


def _put_bits(w: _BitWriter, bits: str) -> None:
    for b in bits:
        w.bits.append(1 if b == "1" else 0)


def np_encode_h264_i16(frames: list[np.ndarray], qp: int = 26,
                       pcm_every: int = 0, pred_mode: int = 2,
                       return_recon: bool = False):
    """Encode grayscale frames as an Annex B stream of IDR pictures of
    Intra_16x16 macroblocks (DC prediction, CAVLC sparse residuals,
    fixed QP, loop filter disabled). `pcm_every` > 0 interleaves an
    I_PCM macroblock every n-th MB (mixed-type streams for the nC=16
    neighbour path). `pred_mode` requests a 16x16 prediction mode
    (0 vertical / 1 horizontal / 2 DC / 3 plane) for macroblocks whose
    neighbours allow it; edge MBs fall back to DC. Returns
    spec-conformant bytes; lossy — the exact reconstruction any
    conformant decoder produces is returned by np_decode_h264_islice.
    With return_recon=True, returns (bytes, [reconstructed frames])
    so tests can pin decoder output to the encoder's closed-loop model
    bit-for-bit."""
    if not frames:
        raise ValueError("no frames")
    if not 24 <= qp <= 35:
        # keeps every scaling path on the well-attested qp branches
        # (8.5.12.1 qp>=24 shift form; 8.5.10 qp<36 rounded form)
        raise ValueError("qp must be in 24..35")
    h, w = frames[0].shape
    if h % 2 or w % 2:
        raise ValueError("4:2:0 H.264 requires even frame dimensions")
    mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
    out = [_nal(NAL_SPS, _write_sps(mb_w, mb_h, 16 * mb_w - w,
                                    16 * mb_h - h)),
           _nal(NAL_PPS, _write_pps_i16())]
    recons: list[np.ndarray] = []
    for fi, frame in enumerate(frames):
        if frame.shape != (h, w):
            raise ValueError("frame dimension mismatch")
        padded = np.pad(
            frame, ((0, 16 * mb_h - h), (0, 16 * mb_w - w)), mode="edge"
        ).astype(np.int64)
        recon = np.zeros_like(padded)
        tc_grid = np.zeros((4 * mb_h, 4 * mb_w), dtype=np.int64)

        bw = _BitWriter()
        bw.ue(0)           # first_mb_in_slice
        bw.ue(7)           # slice_type: I (all slices in pic)
        bw.ue(0)           # pps id
        bw.u(0, 4)         # frame_num
        bw.ue(fi % 65536)  # idr_pic_id
        bw.u(0, 1)         # no_output_of_prior_pics_flag
        bw.u(0, 1)         # long_term_reference_flag
        bw.se(qp - 26)     # slice_qp_delta (pic_init_qp is 26)
        bw.ue(1)           # disable_deblocking_filter_idc = 1 (off)
        mb_idx = 0
        for my in range(mb_h):
            for mx in range(mb_w):
                src = padded[16 * my:16 * my + 16, 16 * mx:16 * mx + 16]
                mb_idx += 1
                if pcm_every and mb_idx % pcm_every == 0:
                    bw.ue(MB_I_PCM)
                    bw.align_zero()
                    bw.raw_bytes(src.astype(np.uint8).tobytes())
                    bw.raw_bytes(b"\x80" * 128)
                    recon[16 * my:16 * my + 16, 16 * mx:16 * mx + 16] = src
                    tc_grid[4 * my:4 * my + 4, 4 * mx:4 * mx + 4] = 16
                    continue

                mode = pred_mode
                if (mode == 0 and my == 0) or (mode == 1 and mx == 0) \
                        or (mode == 3 and (my == 0 or mx == 0)):
                    mode = 2
                pred = predict_16x16(recon, my, mx, mode)
                residual = src - pred

                # forward transform all 16 blocks; split DC / AC
                wblocks = np.zeros((4, 4, 4, 4), dtype=np.int64)
                for b in range(16):
                    y4, x4 = _BLK_YX[b]
                    blk = residual[4 * y4:4 * y4 + 4, 4 * x4:4 * x4 + 4]
                    wblocks[y4, x4] = forward_transform_4x4(blk)
                dc_levels = _keep_largest(
                    quant_dc_luma(wblocks[:, :, 0, 0], qp)
                )
                ac_levels = np.zeros((4, 4, 4, 4), dtype=np.int64)
                for b in range(16):
                    y4, x4 = _BLK_YX[b]
                    q = quant_ac(wblocks[y4, x4], qp)
                    q[0, 0] = 0
                    ac_levels[y4, x4] = _keep_largest(q)
                cbp_luma = 15 if np.any(ac_levels) else 0

                # mb_type: 1 + predMode + 4*cbpChroma + 12*(cbpLuma==15)
                bw.ue(1 + mode + 0 + (12 if cbp_luma else 0))
                bw.ue(0)       # intra_chroma_pred_mode: DC
                bw.se(0)       # mb_qp_delta

                # residual: DC block first (nC as for luma4x4BlkIdx 0)
                gy0, gx0 = 4 * my, 4 * mx
                _put_bits(bw, encode_residual_block(
                    _scan(dc_levels), _nc(tc_grid, gy0, gx0), 16
                ))
                if cbp_luma:
                    for b in range(16):
                        y4, x4 = _BLK_YX[b]
                        gy, gx = gy0 + y4, gx0 + x4
                        coeffs = _scan(ac_levels[y4, x4])[1:]  # 15 AC
                        bits = encode_residual_block(
                            coeffs, _nc(tc_grid, gy, gx), 15
                        )
                        _put_bits(bw, bits)
                        tc_grid[gy, gx] = sum(1 for c in coeffs if c)
                # cbp_luma == 0 leaves tc_grid zeros for this MB

                # reconstruct exactly as the decoder will
                recon_mb = _reconstruct_i16(pred, dc_levels, ac_levels, qp)
                recon[16 * my:16 * my + 16, 16 * mx:16 * mx + 16] = recon_mb
        bw.rbsp_trailing()
        out.append(_nal(NAL_IDR, bw.tobytes()))
        recons.append(recon[:h, :w].astype(np.uint8).copy())
    raw = b"".join(out)
    return (raw, recons) if return_recon else raw


def _reconstruct_i16(pred: np.ndarray, dc_levels: np.ndarray,
                     ac_levels: np.ndarray, qp: int) -> np.ndarray:
    """The normative reconstruction both encoder and decoder run:
    dequantize, inverse-Hadamard the DC plane, inverse-transform each
    4x4, add prediction, clip."""
    dc = dequant_dc_luma(dc_levels, qp)
    out = np.empty((16, 16), dtype=np.int64)
    for b in range(16):
        y4, x4 = _BLK_YX[b]
        d = dequant_ac(ac_levels[y4, x4], qp)
        d[0, 0] = dc[y4, x4]
        r = inverse_transform_4x4(d)
        out[4 * y4:4 * y4 + 4, 4 * x4:4 * x4 + 4] = (
            pred[4 * y4:4 * y4 + 4, 4 * x4:4 * x4 + 4] + r
        )
    return np.clip(out, 0, 255)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _ReaderCursor:
    """Adapts the h264 _BitReader to the CAVLC BitCursor interface."""

    def __init__(self, r: _BitReader):
        self.r = r

    def take(self, n: int) -> str:
        return format(self.r.u(n), f"0{n}b") if n else ""

    def take_int(self, n: int) -> int:
        return self.r.u(n) if n else 0

    def unary_zeros(self) -> int:
        n = 0
        while self.r.u(1) == 0:
            n += 1
            if n > 64:
                raise ValueError("CAVLC: runaway unary code")
        return n


def np_decode_h264_islice(raw: bytes) -> list[np.ndarray]:
    """Decode an Annex B H.264 stream of I slices (I_PCM and/or
    Intra_16x16 CAVLC macroblocks) into grayscale luma frames.
    I_NxN / inter / CABAC raise NotImplementedError; malformed streams
    raise ValueError."""
    sps = pps = None
    frames: list[np.ndarray] = []
    for ref_idc, nal_type, rbsp in split_annexb_hdr(raw):
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
            if slice_type % 5 != 2:
                raise NotImplementedError(
                    "P/B slices: inter prediction not in the I subset"
                )
            if first_mb != 0:
                raise NotImplementedError("multi-slice pictures unsupported")
            # slice header, I-slice field order per spec 7.3.3: every
            # u(v) width comes from the SPS, every conditional from the
            # SPS/PPS flags — a third-party conformant stream parses
            # exactly, never by lucky fixed widths
            r.ue()                            # pps id
            r.u(sps["log2_max_frame_num"])    # frame_num, u(v)
            if nal_type == NAL_IDR:
                r.ue()                        # idr_pic_id
            if sps["poc_type"] == 0:
                r.u(sps["log2_max_poc_lsb"])  # pic_order_cnt_lsb, u(v)
                if pps["bottom_field_poc"]:
                    r.se()                    # delta_pic_order_cnt_bottom
            elif sps["poc_type"] == 1 and not sps["delta_poc_always_zero"]:
                r.se()                        # delta_pic_order_cnt[0]
                if pps["bottom_field_poc"]:
                    r.se()                    # delta_pic_order_cnt[1]
            if pps["redundant_present"] and r.ue() != 0:
                raise NotImplementedError(
                    "redundant coded pictures (redundant_pic_cnt > 0)"
                )
            if nal_type == NAL_IDR:
                r.u(1)                        # no_output_of_prior_pics
                r.u(1)                        # long_term_reference_flag
            elif ref_idc != 0:
                # dec_ref_pic_marking, non-IDR reference slice (7.3.3.3)
                if r.u(1):  # adaptive_ref_pic_marking_mode_flag
                    while True:
                        mmco = r.ue()
                        if mmco == 0:
                            break
                        if mmco in (1, 3):
                            r.ue()  # difference_of_pic_nums_minus1
                        if mmco == 2:
                            r.ue()  # long_term_pic_num
                        if mmco in (3, 6):
                            r.ue()  # long_term_frame_idx
                        if mmco == 4:
                            r.ue()  # max_long_term_frame_idx_plus1
            qp = 26 + r.se()  # slice_qp_delta on pic_init_qp 26
            # in-loop deblocking (8.7): active unless the slice turns it
            # off. The filter itself is not implemented; see the MB-loop
            # guard below for why all-I_PCM pictures are still exact.
            filter_active = True
            if pps["dbf_present"]:
                if r.ue() != 1:
                    r.se()
                    r.se()
                else:
                    filter_active = False
            mb_w, mb_h = sps["mb_w"], sps["mb_h"]
            plane = np.zeros((16 * mb_h, 16 * mb_w), dtype=np.int64)
            tc_grid = np.zeros((4 * mb_h, 4 * mb_w), dtype=np.int64)
            for my in range(mb_h):
                for mx in range(mb_w):
                    mb_type = r.ue()
                    if mb_type == MB_I_PCM:
                        r.align()
                        luma = np.frombuffer(r.bytes_(256), dtype=np.uint8)
                        plane[16 * my:16 * my + 16, 16 * mx:16 * mx + 16] = \
                            luma.reshape(16, 16).astype(np.int64)
                        r.bytes_(128)
                        tc_grid[4 * my:4 * my + 4, 4 * mx:4 * mx + 4] = 16
                        continue
                    if not 1 <= mb_type <= 24:
                        raise NotImplementedError(
                            f"mb_type {mb_type}: I_NxN needs the 4x4 "
                            "intra-mode predictor machinery (spec 8.3.1)"
                        )
                    if filter_active:
                        # I_PCM MBs are exact either way (QPy=0 for
                        # deblocking => alpha/beta thresholds 0, no edge
                        # filtered), but a residual-coded Intra_16x16 MB
                        # at working QPs WOULD be filtered by a
                        # conformant decoder — decoding it unfiltered
                        # silently diverges, so refuse instead
                        # (dead-letter-on-unrepresentable convention).
                        raise NotImplementedError(
                            "in-loop deblocking filter (spec 8.7) not "
                            "implemented: slice leaves the loop filter "
                            "enabled and contains residual-coded "
                            "macroblocks"
                        )
                    m = mb_type - 1
                    pred_mode = m % 4
                    cbp_chroma = (m % 12) // 4
                    cbp_luma = 15 if m >= 12 else 0
                    r.ue()     # intra_chroma_pred_mode (chroma dropped)
                    dqp = r.se()
                    qp += dqp  # mb_qp_delta accumulates (7.4.5)

                    cur = _ReaderCursor(r)
                    gy0, gx0 = 4 * my, 4 * mx
                    dc_levels = _unscan(decode_residual_block(
                        cur, _nc(tc_grid, gy0, gx0), 16
                    ))
                    ac_levels = np.zeros((4, 4, 4, 4), dtype=np.int64)
                    if cbp_luma:
                        for b in range(16):
                            y4, x4 = _BLK_YX[b]
                            gy, gx = gy0 + y4, gx0 + x4
                            coeffs = decode_residual_block(
                                cur, _nc(tc_grid, gy, gx), 15
                            )
                            ac_levels[y4, x4] = _unscan([0] + coeffs)
                            tc_grid[gy, gx] = sum(1 for c in coeffs if c)
                    if cbp_chroma:
                        raise NotImplementedError(
                            "chroma residual decode (grayscale frame "
                            "model carries chroma by prediction only)"
                        )
                    pred = predict_16x16(plane, my, mx, pred_mode)
                    plane[16 * my:16 * my + 16, 16 * mx:16 * mx + 16] = \
                        _reconstruct_i16(pred, dc_levels, ac_levels, qp)
            _, crop_r, _, crop_b = sps["crop"]
            frames.append(
                plane[:16 * mb_h - crop_b, :16 * mb_w - crop_r]
                .astype(np.uint8).copy()
            )
    if not frames:
        raise ValueError("no coded pictures in stream")
    return frames
