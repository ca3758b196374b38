"""Compressed H.264 Intra_16x16 I-slices (functions/h264_islice.py):
decoder output must equal the encoder's closed-loop reconstruction
bit-for-bit across prediction modes, QPs, crops, mixed I_PCM streams,
and both container wrappers; scaling tables pinned by the v*MF
identity; boundary errors stay typed."""

from __future__ import annotations

import numpy as np
import pytest

from streamprocess_spark.functions.h264_islice import (
    MF_MATRIX,
    V_MATRIX,
    dequant_ac,
    dequant_dc_luma,
    inverse_transform_4x4,
    np_decode_h264_islice,
    np_encode_h264_i16,
    predict_16x16,
)


def _img(h=48, w=64, seed=0):
    yy, xx = np.mgrid[0:h, 0:w]
    return (128 + 60 * np.sin(yy / 9.0 + seed)
            + 50 * np.cos(xx / 11.0)).clip(0, 255).astype(np.uint8)


# ------------------------------------------------------------- tables

def test_v_times_mf_identity():
    """The dequant v-matrix and quant MF multipliers must satisfy
    v * MF ~ 2^17 / basis-norm-ratio per position class (1, 25/16,
    5/4) — a transcription error in either table breaks this."""
    target = np.array([2.0 ** 17, 2.0 ** 17 * 16 / 25, 2.0 ** 17 * 4 / 5])
    prod = (V_MATRIX * MF_MATRIX).astype(float)
    # the integer tables round the ideal products; worst cell is
    # 25*3355 = 83875 vs 83886.08 (1.3e-4)
    assert np.all(np.abs(prod - target[None, :]) / target[None, :] < 2e-4)


def test_dc_only_inverse_transform():
    d = np.zeros((4, 4), dtype=np.int64)
    d[0, 0] = 64
    assert np.array_equal(inverse_transform_4x4(d), np.ones((4, 4)))
    d[0, 0] = -64
    assert np.array_equal(inverse_transform_4x4(d), -np.ones((4, 4)))


def test_dequant_scaling_shapes():
    c = np.zeros((4, 4), dtype=np.int64)
    c[0, 1] = 1
    # class-2 position, qp 24: d = 1 * v[0][2] << 4
    assert dequant_ac(c, 24)[0, 1] == 13 << 4
    dc = np.zeros((4, 4), dtype=np.int64)
    dc[0, 0] = 1
    # constant DC plane: inverse Hadamard spreads the single coeff
    out = dequant_dc_luma(dc, 28)
    assert len(np.unique(out)) == 1


# -------------------------------------------------- end-to-end bit-exact

@pytest.mark.parametrize("qp", [24, 26, 30, 35])
@pytest.mark.parametrize("pred_mode", [0, 1, 2, 3])
def test_decode_matches_encoder_reconstruction(qp, pred_mode):
    img = _img()
    raw, recons = np_encode_h264_i16(
        [img], qp=qp, pred_mode=pred_mode, return_recon=True
    )
    dec = np_decode_h264_islice(raw)
    assert len(dec) == 1 and dec[0].dtype == np.uint8
    assert np.array_equal(dec[0], recons[0])


def test_multiframe_crop_and_mixed_pcm():
    imgs = [_img(46, 62, s) for s in range(3)]  # non-multiple-of-16
    raw, recons = np_encode_h264_i16(
        imgs, qp=28, pcm_every=4, return_recon=True
    )
    dec = np_decode_h264_islice(raw)
    assert len(dec) == 3
    for d, r in zip(dec, recons):
        assert d.shape == (46, 62)
        assert np.array_equal(d, r)


def test_flat_image_is_lossless():
    """A constant image survives exactly: DC prediction absorbs it
    after the first MB, and the first MB's DC residual quantizes and
    reconstructs without error at these QPs."""
    for v in (0, 77, 128, 255):
        flat = np.full((32, 48), v, np.uint8)
        dec = np_decode_h264_islice(np_encode_h264_i16([flat], qp=28))[0]
        assert np.array_equal(dec, flat), v


def test_compression_is_real():
    img = _img()
    raw = np_encode_h264_i16([img], qp=30)
    assert len(raw) < img.size // 4  # >4x vs raw 8-bit samples


def test_quality_monotone_with_rate():
    """More texture energy kept (lower QP) must not reduce PSNR."""
    img = _img()

    def psnr(qp):
        d = np_decode_h264_islice(np_encode_h264_i16([img], qp=qp))[0]
        mse = float(((d.astype(float) - img) ** 2).mean())
        return 10 * np.log10(255 ** 2 / mse)

    assert psnr(24) >= psnr(35) - 0.1
    assert psnr(24) > 20.0


def test_plane_mode_wins_on_gradient():
    yy, xx = np.mgrid[0:48, 0:64]
    grad = (yy * 2 + xx * 1.5).clip(0, 255).astype(np.uint8)
    out = {}
    for pm in (2, 3):
        _, rec = np_encode_h264_i16([grad], qp=26, pred_mode=pm,
                                    return_recon=True)
        out[pm] = float(((rec[0].astype(float) - grad) ** 2).mean())
    assert out[3] < out[2]


# --------------------------------------------------------- boundaries

def test_parameter_validation():
    with pytest.raises(ValueError):
        np_encode_h264_i16([], qp=26)
    with pytest.raises(ValueError):
        np_encode_h264_i16([_img()], qp=20)   # off the attested branches
    with pytest.raises(ValueError):
        np_encode_h264_i16([_img(47, 64)], qp=26)  # odd dims


def test_ipcm_only_decoder_keeps_its_boundary():
    """The I_PCM-only decoder must still refuse compressed MBs with a
    typed error (its contract), while the islice decoder accepts."""
    from streamprocess_spark.functions.h264 import np_decode_h264_ipcm

    raw = np_encode_h264_i16([_img()], qp=26)
    with pytest.raises(NotImplementedError):
        np_decode_h264_ipcm(raw)
    assert len(np_decode_h264_islice(raw)) == 1


def test_islice_decoder_accepts_pure_ipcm():
    from streamprocess_spark.functions.h264 import np_build_h264_ipcm

    img = _img(32, 32)
    raw = np_build_h264_ipcm([img])
    dec = np_decode_h264_islice(raw)
    assert np.array_equal(dec[0], img)  # I_PCM is lossless


def test_prediction_edge_requirements():
    plane = np.zeros((32, 32), dtype=np.int64)
    with pytest.raises(ValueError):
        predict_16x16(plane, 0, 0, 0)
    with pytest.raises(ValueError):
        predict_16x16(plane, 0, 1, 3)
    assert predict_16x16(plane, 0, 0, 2)[0, 0] == 128


# --------------------------------------------------------- containers

def test_mp4_avc1_carries_compressed_stream():
    from streamprocess_spark.functions.mp4 import (
        np_build_mp4_avc1,
        np_parse_mp4_video,
    )

    img = _img(48, 64)
    es, recons = np_encode_h264_i16([img], qp=28, return_recon=True)
    mp4 = np_build_mp4_avc1([img], fps=10, es=es)
    frames, fps = np_parse_mp4_video(mp4)
    assert fps == 10 and frames.shape == (1, 48, 64)
    assert np.array_equal(frames[0], recons[0])


def test_mkv_carries_compressed_stream():
    from streamprocess_spark.functions.matroska import (
        np_build_mkv_avc,
        np_parse_mkv_avc,
    )

    img = _img(48, 64)
    es, recons = np_encode_h264_i16([img], qp=30, return_recon=True)
    mkv = np_build_mkv_avc([img], fps=10, es=es)
    frames, _ = np_parse_mkv_avc(mkv)
    assert frames.shape == (1, 48, 64)
    assert np.array_equal(frames[0], recons[0])


def test_ingest_edge_accepts_compressed_h264(tmp_path):
    from streamprocess_spark.io.ingest import ingest_bytes, sniff_format

    raw = np_encode_h264_i16([_img()], qp=26)
    assert sniff_format(raw)[0] == "H264"
    env = ingest_bytes(str(tmp_path), raw, name="clip.h264", enqueued_at=1.0)
    assert env["payload"]["format"] == "H264"
    assert env["type"] == "video_batch"
