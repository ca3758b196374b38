"""Numerical verification of the reference-parity DSP kernels
(functions/dsp.py, image.py np_clahe/np_nlmeans).

Ground truth here is mathematics, not a library: the Butterworth
design is checked against the analytic bilinear magnitude response,
the FFT-convolution lfilter against the direct recursion, NLM against
a brute-force double loop, and CLAHE against its closed-form LUT on a
uniform-histogram fixture.
"""

from __future__ import annotations

import numpy as np
import pytest

from streamprocess_spark.functions import dsp
from streamprocess_spark.functions.image import np_clahe, np_nlmeans


# --------------------------------------------------------------- design

def test_butter_design_matches_analytic_response():
    b, a = dsp.butter_highpass_ba(4, 80.0, 16000.0)
    assert len(b) == len(a) == 5
    for f in (20, 50, 80, 200, 1000, 4000, 7000):
        z = np.exp(1j * 2 * np.pi * f / 16000)
        h2 = abs(np.polyval(b, z) / np.polyval(a, z)) ** 2
        assert abs(h2 - dsp.butter_highpass_gain_sq(4, 80.0, 16000, f)) < 1e-8


def test_butter_design_halfpower_at_cutoff():
    for order in (2, 4, 6):
        for cutoff, sr in ((80.0, 16000.0), (300.0, 8000.0)):
            b, a = dsp.butter_highpass_ba(order, cutoff, sr)
            z = np.exp(1j * 2 * np.pi * cutoff / sr)
            h2 = abs(np.polyval(b, z) / np.polyval(a, z)) ** 2
            # -3 dB point lands at the cutoff; tolerance covers the
            # (b, a) polynomial conditioning at order 6 narrow-band
            # (the classic transfer-function-form limitation — the
            # reference's filter is order 4, where this is ~1e-10)
            assert abs(h2 - 0.5) < 1e-5


def test_butter_rejects_bad_cutoff():
    with pytest.raises(ValueError):
        dsp.butter_highpass_ba(4, 9000.0, 16000.0)


# --------------------------------------------------------------- lfilter

def test_fft_lfilter_equals_direct_recursion():
    b, a = dsp.butter_highpass_ba(4, 80.0, 16000.0)
    rng = np.random.default_rng(7)
    x = rng.normal(size=5000)
    zi = dsp.lfilter_zi(b, a)
    y_fft = dsp.np_lfilter(b, a, x, zi_scale=x[0])
    y_dir = dsp._df2t_run(
        b / a[0], a / a[0], x.copy(), (zi * x[0]).copy()
    )
    assert np.max(np.abs(y_fft - y_dir)) < 1e-8


def test_lfilter_zi_step_steady_state():
    # with zi scaled by a unit step's level, the step response starts
    # at steady state: a constant input yields the DC gain immediately
    b, a = dsp.butter_highpass_ba(2, 1000.0, 16000.0)
    x = np.ones(2000)
    y = dsp.np_lfilter(b, a, x, zi_scale=1.0)
    dc_gain = np.sum(b) / np.sum(a)
    assert abs(y[0] - dc_gain) < 1e-9
    assert abs(y[-1] - dc_gain) < 1e-9


# --------------------------------------------------------------- filtfilt

def test_filtfilt_gain_is_squared_magnitude():
    b, a = dsp.butter_highpass_ba(4, 80.0, 16000.0)
    sr = 16000
    t = np.arange(sr)
    for f in (50, 100, 1000):
        tone = np.sin(2 * np.pi * f * t / sr)
        y = dsp.np_filtfilt(b, a, tone)
        core = slice(2000, -2000)
        gain = np.sqrt(np.mean(y[core] ** 2) / np.mean(tone[core] ** 2))
        assert abs(gain - dsp.butter_highpass_gain_sq(4, 80, 16000, f)) < 1e-3


def test_filtfilt_zero_phase():
    # zero-phase: a passband tone comes back aligned, not delayed
    b, a = dsp.butter_highpass_ba(4, 80.0, 16000.0)
    t = np.arange(16000)
    tone = np.sin(2 * np.pi * 1000 * t / 16000)
    y = dsp.np_filtfilt(b, a, tone)
    core = slice(2000, -2000)
    assert np.max(np.abs(y[core] - tone[core])) < 1e-3


def test_filtfilt_rejects_dc_and_preserves_length():
    y = dsp.np_butter_highpass_filtfilt(np.ones(4000), 80.0, 16000.0)
    assert len(y) == 4000
    assert np.max(np.abs(y)) < 1e-6


def test_filtfilt_short_input_passthrough():
    x = np.arange(10, dtype=np.float32)
    assert np.array_equal(dsp.np_butter_highpass_filtfilt(x), x)


# --------------------------------------------------------------- kaiser

def test_i0_against_known_values():
    # I0(0)=1, I0(1)=1.2660658..., I0(5)=27.239871...
    got = dsp.np_i0(np.array([0.0, 1.0, 5.0]))
    assert abs(got[0] - 1.0) < 1e-12
    assert abs(got[1] - 1.2660658777520084) < 1e-10
    assert abs(got[2] - 27.239871823604442) < 1e-8


def test_resample_tone_preservation_up_down():
    for sr0, sr1 in ((8000, 16000), (48000, 16000), (44100, 16000)):
        n = sr0 // 2
        tone = np.sin(2 * np.pi * 440 * np.arange(n) / sr0).astype(np.float32)
        y = dsp.np_resample_kaiser(tone, sr0, sr1)
        assert len(y) == int(np.ceil(n * sr1 / sr0))  # librosa convention
        ref = np.sin(2 * np.pi * 440 * np.arange(len(y)) / sr1)
        m = max(200, len(y) // 50)
        assert np.max(np.abs(y[m:-m] - ref[m:-m])) < 1e-4


def test_resample_identity_and_empty():
    x = np.arange(100, dtype=np.float32)
    assert np.array_equal(dsp.np_resample_kaiser(x, 16000, 16000), x)
    assert len(dsp.np_resample_kaiser(np.array([], np.float32), 8, 16)) == 0


def test_resample_downsample_removes_above_nyquist():
    # a 7 kHz tone cannot survive 48k -> 16k (new Nyquist 8 kHz is
    # fine, but the anti-aliasing rolloff cuts near it; 7.9 kHz must
    # be attenuated, 1 kHz must not)
    n = 48000
    hi = np.sin(2 * np.pi * 7900 * np.arange(n) / 48000)
    lo = np.sin(2 * np.pi * 1000 * np.arange(n) / 48000)
    y_hi = dsp.np_resample_kaiser(hi.astype(np.float32), 48000, 16000)
    y_lo = dsp.np_resample_kaiser(lo.astype(np.float32), 48000, 16000)
    assert np.sqrt(np.mean(y_hi[400:-400] ** 2)) < 0.3
    assert abs(np.sqrt(2 * np.mean(y_lo[400:-400] ** 2)) - 1.0) < 1e-2


# --------------------------------------------------------------- stft

def test_stft_istft_roundtrip():
    rng = np.random.default_rng(3)
    x = rng.normal(size=10000)
    y = dsp.np_istft(dsp.np_stft(x), length=len(x))
    assert np.max(np.abs(y - x)) < 1e-10


def test_spectral_subtract_gate_and_length():
    short = np.sin(2 * np.pi * 440 * np.arange(2000) / 16000).astype(
        np.float32
    )
    assert np.array_equal(dsp.np_spectral_subtract(short), short)
    sig = np.concatenate([
        np.zeros(8000, np.float32),
        np.sin(2 * np.pi * 500 * np.arange(16000) / 16000).astype(np.float32),
    ])
    y = dsp.np_spectral_subtract(sig)
    assert len(y) == len(sig)
    # noise estimated from leading silence ~ 0 -> tone preserved
    r = np.sqrt(np.mean(y[10000:22000] ** 2) / np.mean(sig[10000:22000] ** 2))
    assert 0.99 < r < 1.01


def test_spectral_subtract_reduces_noise():
    rng = np.random.default_rng(11)
    tone = np.sin(2 * np.pi * 500 * np.arange(32000) / 16000)
    noisy = (tone + 0.3 * rng.normal(size=32000)).astype(np.float32)
    y = dsp.np_spectral_subtract(noisy)
    # off-tone spectral energy must drop
    spec_in = np.abs(np.fft.rfft(noisy[8000:24000].astype(np.float64)))
    spec_out = np.abs(np.fft.rfft(y[8000:24000].astype(np.float64)))
    k = int(500 * 16000 / 16000)  # tone bin
    mask = np.ones(len(spec_in), bool)
    mask[k - 20:k + 20] = False
    assert np.sum(spec_out[mask] ** 2) < 0.5 * np.sum(spec_in[mask] ** 2)


# --------------------------------------------------------------- clahe

def test_clahe_uniform_histogram_closed_form():
    yy, xx = np.mgrid[0:128, 0:128]
    img = (16 * (yy % 16) + (xx % 16)).astype(np.uint8)
    out = np_clahe(img, clip_limit=2.0, grid=(8, 8))
    lut = np.rint((np.arange(256) + 1) * 255.0 / 256.0).astype(np.int64)
    assert np.array_equal(out.astype(np.int64), lut[img])


def test_clahe_clipping_redistributes():
    # constant tiles hit the clip limit hard; output must stay
    # constant (all tiles identical), far from naive equalization
    img = np.full((128, 128), 77, np.uint8)
    out = np_clahe(img)
    vals = np.unique(out)
    assert len(vals) == 1
    # clipped redistribution: limit=2, excess=254 spread 1/bin ->
    # cdf[77] = 78 + 2 = 80 -> rint(80*255/256) = 80
    assert vals[0] == 80


def test_clahe_nonmultiple_size_and_range():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (100, 90), dtype=np.uint8)
    out = np_clahe(img)
    assert out.shape == img.shape
    assert out.dtype == np.uint8


# --------------------------------------------------------------- nlm

def _nlm_brute(img, h=10.0, template=7, search=21):
    f, s = template // 2, search // 2
    x = img.astype(np.float64)
    hh, ww = img.shape
    p = np.pad(x, s + f, mode="reflect")
    out = np.empty((hh, ww))
    for y in range(hh):
        for xq in range(ww):
            py, px = y + s + f, xq + s + f
            patch = p[py - f:py + f + 1, px - f:px + f + 1]
            acc = wsum = 0.0
            for dy in range(-s, s + 1):
                for dx in range(-s, s + 1):
                    q = p[py + dy - f:py + dy + f + 1,
                          px + dx - f:px + dx + f + 1]
                    d2 = np.sum((q - patch) ** 2) / (template * template)
                    w = np.exp(-d2 / (h * h))
                    acc += w * p[py + dy, px + dx]
                    wsum += w
            out[y, xq] = acc / wsum
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def test_nlm_matches_bruteforce():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (12, 12), dtype=np.uint8)
    assert np.array_equal(np_nlmeans(img), _nlm_brute(img))


def test_nlm_constant_fixed_point():
    img = np.full((48, 48), 131, np.uint8)
    assert np.array_equal(np_nlmeans(img), img)


def test_nlm_denoises_structured_image():
    rng = np.random.default_rng(9)
    yy, _ = np.mgrid[0:64, 0:64]
    clean = np.where((yy // 8) % 2 == 0, 200, 60).astype(np.float64)
    noisy = np.clip(clean + rng.normal(0, 15, clean.shape), 0, 255).astype(
        np.uint8
    )
    den = np_nlmeans(noisy)
    assert (
        np.mean((den.astype(np.float64) - clean) ** 2)
        < 0.7 * np.mean((noisy.astype(np.float64) - clean) ** 2)
    )


# --------------------------------------------------------- fft resample

def _trig_interpolant(x, m):
    """Ground truth: evaluate x's trigonometric interpolant at the
    m-point grid (O(nm), definitionally exact for band-limited
    periodic signals)."""
    n = len(x)
    sp = np.fft.rfft(x)
    t = np.arange(m) * n / m
    out = np.full(m, sp[0].real)
    for k in range(1, (n - 1) // 2 + 1):
        out = out + 2 * (sp[k] * np.exp(2j * np.pi * k * t / n)).real
    if n % 2 == 0:
        out = out + (sp[n // 2] * np.exp(1j * np.pi * t)).real
    return out / n


def test_fft_resample_matches_direct_interpolant_upsampling():
    rng = np.random.default_rng(1)
    for n, m in [(16, 24), (16, 33), (15, 40), (64, 96)]:
        x = rng.normal(size=n)
        got = dsp.np_resample_fft(x, m)
        assert np.max(np.abs(got - _trig_interpolant(x, m))) < 1e-5


def test_fft_resample_downsampling_truncates_spectrum():
    rng = np.random.default_rng(2)
    for n, m in [(24, 16), (24, 15), (16, 8)]:
        x = rng.normal(size=n)
        got = dsp.np_resample_fft(x, m)
        sp = np.fft.rfft(x)
        keep = np.zeros_like(sp)
        nyq = m // 2 + 1
        keep[:nyq] = sp[:nyq]
        if m % 2 == 0:
            keep[m // 2] = sp[m // 2].real
        xb = np.fft.irfft(keep, n)
        assert np.max(np.abs(got - _trig_interpolant(xb, m))) < 1e-5


def test_fft_resample_tone_exact():
    n, m, k = 1024, 2048, 40
    tone = np.sin(2 * np.pi * k * np.arange(n) / n)
    up = dsp.np_resample_fft(tone, m)
    ref = np.sin(2 * np.pi * k * np.arange(m) / m)
    assert np.max(np.abs(up - ref)) < 1e-5


# --------------------------------------------------------- bicubic

def test_cubic_weights_partition_of_unity():
    from streamprocess_spark.functions.image import _cubic_weights

    t = np.linspace(0, 1, 101)
    assert np.max(np.abs(_cubic_weights(t).sum(-1) - 1.0)) < 1e-12


def test_resize_cubic_constant_and_ramp():
    from streamprocess_spark.functions.image import np_resize_cubic

    const = np.full((40, 52), 173, np.uint8)
    assert np.all(np_resize_cubic(const, 95, 130) == 173)

    w = 64
    ramp = np.tile(np.arange(w) * 3, (16, 1)).astype(np.uint8)
    out = np_resize_cubic(ramp, 16, 128)
    fx = (np.arange(128) + 0.5) * (w / 128) - 0.5
    expect = np.rint(np.clip(fx, 0, w - 1) * 3).astype(np.int64)
    assert np.max(np.abs(out[8, 4:-4].astype(np.int64) - expect[4:-4])) <= 1


def test_warp_affine_cubic_integer_shift_exact():
    from streamprocess_spark.functions.image import np_warp_affine_cubic

    img = (np.arange(32 * 32).reshape(32, 32) * 7 % 256).astype(np.uint8)
    m = np.array([[1.0, 0.0, 3.0], [0.0, 1.0, 5.0]])
    got = np_warp_affine_cubic(img, m)
    ys = np.clip(np.arange(32) - 5, 0, 31)
    xs = np.clip(np.arange(32) - 3, 0, 31)
    assert np.array_equal(got, img[ys[:, None], xs[None, :]])


def test_warp_affine_cubic_rotation_roundtrip():
    import math

    from streamprocess_spark.functions.image import np_warp_affine_cubic

    def rot(angle_deg, cx=16.0, cy=16.0):
        a = math.radians(angle_deg)
        return np.array([
            [math.cos(a), math.sin(a),
             (1 - math.cos(a)) * cx - math.sin(a) * cy],
            [-math.sin(a), math.cos(a),
             math.sin(a) * cx + (1 - math.cos(a)) * cy],
        ])

    yy, xx = np.mgrid[0:32, 0:32]
    smooth = (yy * 4 + xx * 3).astype(np.uint8)
    back = np_warp_affine_cubic(
        np_warp_affine_cubic(smooth, rot(7.0)), rot(-7.0)
    )
    assert np.max(np.abs(
        back[8:-8, 8:-8].astype(np.int64)
        - smooth[8:-8, 8:-8].astype(np.int64)
    )) <= 1


# --------------------------------------------------------- adaptive

def test_gaussian_kernel_normalized_symmetric():
    from streamprocess_spark.functions.image import np_gaussian_kernel1d

    k = np_gaussian_kernel1d(11)
    assert abs(k.sum() - 1.0) < 1e-12
    assert np.allclose(k, k[::-1])
    assert np.argmax(k) == 5


def test_adaptive_threshold_gaussian_matches_bruteforce():
    from streamprocess_spark.functions.image import (
        np_adaptive_threshold_gaussian,
        np_gaussian_kernel1d,
    )

    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (24, 26), np.uint8)
    k = np_gaussian_kernel1d(11)
    kk = np.outer(k, k)
    p = np.pad(img.astype(np.float64), 5, mode="edge")
    brute = np.empty(img.shape)
    for y in range(img.shape[0]):
        for x in range(img.shape[1]):
            brute[y, x] = np.sum(kk * p[y:y + 11, x:x + 11])
    want = np.where(img > np.rint(brute) - 2.0, 255, 0).astype(np.uint8)
    assert np.array_equal(np_adaptive_threshold_gaussian(img), want)


def test_adaptive_threshold_constant_all_white():
    from streamprocess_spark.functions.image import (
        np_adaptive_threshold_gaussian,
    )

    for v in (0, 40, 255):
        img = np.full((20, 20), v, np.uint8)
        assert np.all(np_adaptive_threshold_gaussian(img) == 255)


# --------------------------------------------------------------- mfcc

def test_mfcc_silence_closed_form():
    n = 8192
    m = dsp.np_mfcc(np.zeros(n))
    assert m.shape == (13, 1 + n // 512)
    # silence -> power_to_db floor -100 dB in every mel band; DCT of
    # a constant vector: c0 = -100*sqrt(n_mels), the rest zero
    assert np.max(np.abs(m[0] - (-100.0 * np.sqrt(128.0)))) < 1e-9
    assert np.max(np.abs(m[1:])) < 1e-9


def test_mfcc_deterministic_and_tone_structure():
    sr = 16000
    # 500 Hz = exactly 16 cycles per 512-sample hop, so every interior
    # frame sees an identical waveform (an un-aligned tone like 440 Hz
    # shifts phase per frame and ripples through the hann window)
    tone = 0.5 * np.sin(2 * np.pi * 500 * np.arange(sr) / sr)
    m1 = dsp.np_mfcc(tone, sr)
    m2 = dsp.np_mfcc(tone, sr)
    assert np.array_equal(m1, m2)
    interior = m1[:, 4:-4]
    assert np.max(np.std(interior, axis=1)) < 1e-9


def test_mel_filterbank_structure():
    fb = dsp.np_mel_filterbank(16000, 2048)
    assert fb.shape == (128, 1025)
    assert (fb >= 0).all()
    # every filter is nonempty and interior bins are covered
    assert (fb.sum(axis=1) > 0).all()
    assert (fb > 0).any(axis=0)[5:-5].all()
    # slaney norm: triangle area ~ 1 when integrated over Hz
    hz_step = 8000.0 / 1024
    areas = fb.sum(axis=1) * hz_step
    assert np.all((areas > 0.7) & (areas < 1.3))


def test_dct_ortho_matches_dense_definition():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(16, 3))
    got = dsp._dct_ortho(x, 16)
    n = 16
    ref = np.empty_like(got)
    for k in range(n):
        s = np.sqrt(1.0 / n) if k == 0 else np.sqrt(2.0 / n)
        ref[k] = s * np.sum(
            x * np.cos(np.pi * k * (2 * np.arange(n)[:, None] + 1) / (2 * n)),
            axis=0,
        )
    assert np.max(np.abs(got - ref)) < 1e-12
    # orthogonality: inverse via transpose reconstructs
    full_basis = np.array([
        [(np.sqrt(1.0 / n) if k == 0 else np.sqrt(2.0 / n))
         * np.cos(np.pi * k * (2 * i + 1) / (2 * n)) for i in range(n)]
        for k in range(n)
    ])
    assert np.max(np.abs(full_basis.T @ got - x)) < 1e-12


def test_frame_features_tone_physics():
    sr = 16000
    amp, f_hz = 0.5, 1000.0
    tone = amp * np.sin(2 * np.pi * f_hz * np.arange(sr) / sr)
    f = dsp.np_frame_features(tone, sr)
    mid = slice(4, -4)
    assert abs(np.mean(f["centroid"][mid]) - f_hz) < 1.0
    assert np.mean(f["bandwidth"][mid]) < 50.0
    assert abs(np.mean(f["rolloff"][mid]) - f_hz) < 16.0
    assert abs(np.mean(f["zcr"][mid]) - 2 * f_hz / sr) < 1e-3
    assert abs(np.mean(f["rms"][mid]) - amp / np.sqrt(2)) < 1e-6


def test_hz_mel_roundtrip():
    f = np.array([0.0, 200.0, 999.0, 1000.0, 4000.0, 8000.0])
    back = dsp._mel_to_hz_slaney(dsp._hz_to_mel_slaney(f))
    assert np.max(np.abs(back - f)) < 1e-6


# --------------------------------------------------------------- beats

def _click_track(bpm, sr=16000, dur=10):
    x = np.zeros(sr * dur, np.float32)
    period_s = 60.0 / bpm
    i = 0
    while int(i * period_s * sr) < len(x) - 64:
        p = int(i * period_s * sr)
        x[p:p + 64] = np.sin(
            2 * np.pi * 2000 * np.arange(64) / sr
        ).astype(np.float32)
        i += 1
    return x


def test_beat_track_recovers_click_tempo():
    for bpm in (90, 120, 140):
        tempo, beats = dsp.np_beat_track(_click_track(bpm))
        # tempo is quantized to integer onset-frame lags (~31.25 fps)
        assert abs(tempo - bpm) / bpm < 0.08
        assert len(beats) > 5


def test_beat_track_beats_align_with_clicks():
    sr, hop = 16000, 512
    tempo, beats = dsp.np_beat_track(_click_track(120, sr))
    fps = sr / hop
    clicks = np.array([
        int(i * 0.5 * fps) for i in range(20)
    ])
    d = np.min(np.abs(beats[:, None] - clicks[None, :]), axis=1)
    assert float(np.median(d)) <= 2.0


def test_beat_track_silence_empty():
    tempo, beats = dsp.np_beat_track(np.zeros(16000, np.float32))
    assert len(beats) == 0
    assert tempo == 0.0


def test_onset_strength_shape_and_peaks():
    sr = 16000
    x = _click_track(120, sr, dur=4)
    env = dsp.np_onset_strength(x, sr)
    assert len(env) == 1 + len(x) // 512
    # envelope peaks at click onsets (frame ~ every 15.6)
    peak_frames = np.argsort(env)[-8:]
    clicks = np.array([int(i * 0.5 * sr / 512) for i in range(8)])
    d = np.min(np.abs(peak_frames[:, None] - clicks[None, :]), axis=1)
    assert float(np.median(d)) <= 2.0


# ------------------------------------------------------- spark surface

def test_frame_features_and_beat_udfs(spark):
    import pyspark.sql.functions as F

    from streamprocess_spark.functions.audio import (
        beat_track_udf,
        frame_features_udf,
    )

    sr = 16000
    tone = (0.5 * np.sin(2 * np.pi * 500 * np.arange(sr) / sr)).astype(
        float
    ).tolist()
    clicks = np.zeros(sr * 4, np.float32)
    for i in range(8):
        p = int(i * 0.5 * sr)
        clicks[p:p + 64] = 1.0
    df = spark.createDataFrame(
        [(1, tone, clicks.tolist())], "id long, tone array<double>, clicks array<double>"
    )
    ff = frame_features_udf(sr)
    bt = beat_track_udf(sr)
    row = (
        df.select(ff(F.col("tone")).alias("f"), bt(F.col("clicks")).alias("b"))
        .collect()[0]
    )
    assert row["f"]["n_frames"] == 1 + sr // 512
    assert len(row["f"]["mfcc_mean"]) == 13
    assert abs(row["f"]["centroid_mean"] - 500.0) < 30.0
    assert abs(row["b"]["tempo_bpm"] - 120.0) < 10.0
    assert row["b"]["n_beats"] >= 5
