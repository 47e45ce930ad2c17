"""Evaluation metric sanity tests: MCD/f0 metrics behave as distances."""

import numpy as np

from parallelwavegan_tpu.ops.audio import trim_silence, yin_f0
from parallelwavegan_tpu.ops.eval_metrics import (
    dtw_path,
    log_f0_rmse,
    mcep,
    mel_cepstral_distortion,
    semitone_accuracy,
)


def _tone(freq, sr=16000, dur=0.5, noise=0.0, seed=0):
    t = np.arange(int(sr * dur))
    x = 0.5 * np.sin(2 * np.pi * freq * t / sr)
    if noise:
        x = x + noise * np.random.default_rng(seed).standard_normal(len(t))
    return x.astype(np.float32)


def test_mcd_zero_for_identical_and_positive_for_different():
    sr = 16000
    a = _tone(220, sr, noise=0.01)
    b = _tone(220, sr, noise=0.01)
    c = _tone(800, sr, noise=0.3, seed=1)
    d_same = mel_cepstral_distortion(a, b, sr)
    d_diff = mel_cepstral_distortion(a, c, sr)
    assert d_same < 1e-3
    assert d_diff > d_same + 1.0


def test_mcd_robust_to_time_offset():
    sr = 16000
    a = _tone(220, sr, dur=0.6, noise=0.01)
    shifted = np.concatenate([np.zeros(400, np.float32), a])
    # DTW absorbs the shift; the residual is boundary frames (c0 included
    # per the reference's MCD definition, so partial-frame gain counts)
    assert mel_cepstral_distortion(a, shifted, sr) < 3.0


def test_dtw_identity():
    x = np.random.default_rng(0).standard_normal((20, 4)).astype(np.float32)
    px, py = dtw_path(x, x)
    np.testing.assert_array_equal(px, py)


def test_yin_detects_tone_frequency():
    sr = 16000
    for freq in (110.0, 220.0, 330.0):
        f0 = yin_f0(_tone(freq, sr, dur=0.3), sr, hop_size=160,
                    pitch_min=60, pitch_max=500)
        voiced = f0[f0 > 0]
        assert len(voiced) > 0
        assert abs(np.median(voiced) - freq) / freq < 0.03, (freq, np.median(voiced))


def test_yin_silence_is_unvoiced():
    sr = 16000
    x = 1e-4 * np.random.default_rng(0).standard_normal(sr // 2).astype(
        np.float32
    )
    f0 = yin_f0(x, sr, hop_size=160)
    assert (f0 == 0).mean() > 0.8


def test_log_f0_reference_contract():
    """log_f0 matches the reference torchyin dump contract
    (/root/reference/parallel_wavegan/bin/preprocess.py:92-131): voiced
    frames carry log(f0) with integer-period quantization (f0 = sr/tau, so
    |df| <= f0^2/sr, i.e. |dlog f0| <= f0/sr), unvoiced frames are 0, and
    frame_length drives pitch_min = sr/(frame_length/2)."""
    from parallelwavegan_tpu.ops.audio import log_f0

    sr = 16000
    freq = 220.0
    lf = log_f0(_tone(freq, sr, dur=0.4, noise=0.002), sr, hop_size=160,
                frame_length=1024)
    voiced = lf[lf != 0]
    assert len(voiced) > 0
    # quantized grid: every voiced value must be log(sr / integer)
    taus = sr / np.exp(voiced)
    np.testing.assert_allclose(taus, np.round(taus), atol=1e-3)
    assert abs(np.median(voiced) - np.log(freq)) < 2 * freq / sr + 1e-2
    # noise -> unvoiced zeros (constant/DC input is degenerate for YIN --
    # every lag matches -- so aperiodicity is tested with noise)
    lf = log_f0(
        1e-4 * np.random.default_rng(0).standard_normal(sr // 2)
        .astype(np.float32),
        sr, hop_size=160, frame_length=1024,
    )
    assert (lf == 0).mean() > 0.8


def test_yin_harmonic_rich_tracks_fundamental():
    """A sawtooth-like harmonic stack must resolve to the fundamental, not
    a harmonic (the classic YIN failure mode its CMND threshold guards)."""
    sr = 16000
    f = 165.0
    t = np.arange(int(sr * 0.4)) / sr
    x = sum(
        (0.6 / h) * np.sin(2 * np.pi * f * h * t) for h in range(1, 6)
    ).astype(np.float32)
    f0 = yin_f0(x, sr, hop_size=160, pitch_min=60, pitch_max=500)
    voiced = f0[f0 > 0]
    assert len(voiced) > 0
    assert abs(np.median(voiced) - f) / f < 0.03


def test_yin_tracks_vibrato():
    """Slow 5 Hz vibrato (+-3%) is tracked frame-wise within 5%."""
    sr = 16000
    t = np.arange(int(sr * 0.6)) / sr
    inst = 200.0 * (1.0 + 0.03 * np.sin(2 * np.pi * 5.0 * t))
    phase = 2 * np.pi * np.cumsum(inst) / sr
    x = np.sin(phase).astype(np.float32)
    hop, fl = 160, 800
    f0 = yin_f0(x, sr, hop_size=hop, pitch_min=60, pitch_max=500,
                frame_length=fl)
    centers = (np.arange(len(f0)) * hop + fl // 2).clip(0, len(t) - 1)
    ref = inst[centers]
    voiced = f0 > 0
    assert voiced.mean() > 0.8
    rel = np.abs(f0[voiced] - ref[voiced]) / ref[voiced]
    assert np.percentile(rel, 90) < 0.05, np.percentile(rel, 90)


def test_log_f0_rmse_and_semitone():
    sr = 16000
    a = _tone(220, sr, noise=0.005)
    b = _tone(233.08, sr, noise=0.005, seed=2)  # one semitone up
    rmse_same, vuv_same = log_f0_rmse(a, a, sr)
    rmse_diff, _ = log_f0_rmse(a, b, sr)
    assert rmse_same < 1e-3
    assert abs(rmse_diff - np.log(233.08 / 220)) < 0.02
    assert semitone_accuracy(a, a, sr) > 0.99
    assert semitone_accuracy(a, b, sr) < 0.6


def test_trim_silence():
    sr = 16000
    tone = _tone(220, sr, dur=0.3)
    x = np.concatenate(
        [np.zeros(4000, np.float32), tone, np.zeros(4000, np.float32)]
    )
    trimmed, (start, end) = trim_silence(x, top_db=40)
    # centered RMS frames bleed ~frame_length/2 into the silence on each side
    assert 2500 <= start <= 4096
    assert len(trimmed) < 8000  # removed most of the 8000 silent samples


def test_mcep_shape():
    sr = 22050
    mc = mcep(_tone(220, sr, dur=0.2), sr)
    assert mc.shape[1] == 35  # dim 34 + c0
    assert np.isfinite(mc).all()


# ---------------------------------------------------------------------------
# SPTK-exactness of mcep: the implementation minimizes the SPTK criterion
# (gamma=0 mel-generalized cepstrum); these tests pin that down analytically.
# ---------------------------------------------------------------------------

def _random_periodogram(F=3, n_fft=512, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((F, n_fft)) * 1000.0  # int16-ish scale
    return np.abs(np.fft.rfft(x * np.hamming(n_fft), axis=-1)) ** 2 + 1e-6


def test_mcep_alpha0_full_order_equals_cepstrum():
    """alpha=0, order=n_fft/2: the model can represent log P exactly, so the
    minimizer IS the real cepstrum of log P (E=0) — a closed-form oracle."""
    from parallelwavegan_tpu.ops.eval_metrics import mcep_from_periodogram

    n_fft = 64
    P = _random_periodogram(2, n_fft, seed=1)
    M = n_fft // 2
    mc = mcep_from_periodogram(P, M, 0.0, n_fft, max_iter=200)
    logP_full = np.log(
        np.concatenate([P, P[:, -2:0:-1]], axis=-1)
    )
    # real cepstrum = inverse DFT of the (symmetric) log spectrum
    c = np.fft.ifft(logP_full, axis=-1).real[:, : M + 1]
    expected = c.copy()
    expected[:, 0] /= 2.0  # model has 2*sum mc_m cos; cepstrum c0 counted once
    expected[:, M] /= 2.0  # nyquist term likewise
    np.testing.assert_allclose(mc, expected, rtol=1e-6, atol=1e-8)


def test_mcep_recovers_planted_coefficients():
    """If P = |H|^2 for an order<=M warped model, E=0 is attainable and the
    unique minimizer is the planted coefficient vector — validates warping
    + optimizer end to end at alpha=0.45."""
    from parallelwavegan_tpu.ops.eval_metrics import (
        mcep_from_periodogram,
        warped_phase,
    )

    n_fft, M, alpha = 512, 24, 0.45
    rng = np.random.default_rng(2)
    v = rng.standard_normal((2, M + 1)) * (0.7 ** np.arange(M + 1))
    v[:, 0] += 5.0
    K = n_fft // 2 + 1
    beta = warped_phase(np.arange(K) * (np.pi / (K - 1)), alpha)
    A = np.cos(np.outer(beta, np.arange(M + 1)))
    P = np.exp(2.0 * (v @ A.T))
    mc = mcep_from_periodogram(P, M, alpha, n_fft, max_iter=200)
    np.testing.assert_allclose(mc, v, rtol=1e-7, atol=1e-9)


def test_mcep_stationarity_of_sptk_criterion():
    """Gradient of the SPTK objective vanishes at the returned solution
    (speech-like random frames, the production fs=22050 params)."""
    from parallelwavegan_tpu.ops.eval_metrics import (
        mcep_from_periodogram,
        warped_phase,
    )

    n_fft, M, alpha = 512, 34, 0.45
    P = _random_periodogram(3, n_fft, seed=3)
    mc = mcep_from_periodogram(P, M, alpha, n_fft)
    K = n_fft // 2 + 1
    beta = warped_phase(np.arange(K) * (np.pi / (K - 1)), alpha)
    A = np.cos(np.outer(beta, np.arange(M + 1)))
    w = np.full(K, 2.0 / n_fft)
    w[0] = w[-1] = 1.0 / n_fft
    D = np.exp(np.log(P) - 2.0 * (mc @ A.T))
    grad = 2.0 * ((1.0 - D) * w) @ A
    assert np.abs(grad).max() < 1e-8, np.abs(grad).max()


def test_mcep_gain_shift_invariance():
    """Scaling audio by s only shifts mc[0] by log(s): higher coefficients
    (the MCD-relevant shape) are amplitude-invariant."""
    sr = 22050
    a = _tone(220, sr, dur=0.2, noise=0.01)
    m1 = mcep(a, sr)
    m2 = mcep(0.25 * a, sr)
    # residual difference is int16 quantization + the eps periodogram floor
    np.testing.assert_allclose(m1[:, 1:], m2[:, 1:], atol=5e-3)
    np.testing.assert_allclose(
        m1[:, 0] - m2[:, 0], np.log(4.0), atol=1e-3
    )


def test_fastdtw_matches_exact_dtw_on_easy_sequences():
    """For sequences with an unambiguous alignment, fastdtw (radius 1) finds
    the exact DTW path; in general its cost upper-bounds the exact one."""
    from parallelwavegan_tpu.ops.eval_metrics import fastdtw_path

    rng = np.random.default_rng(4)
    x = np.cumsum(rng.standard_normal((40, 3)), axis=0)
    px, py = fastdtw_path(x, x)
    np.testing.assert_array_equal(px, py)

    y = np.concatenate([x[:1]] * 3 + [x], axis=0)  # time-warped copy
    px, py = fastdtw_path(x, y)
    # a valid monotonic path covering both sequences end to end
    assert px[0] == 0 and py[0] == 0
    assert px[-1] == len(x) - 1 and py[-1] == len(y) - 1
    assert (np.diff(px) >= 0).all() and (np.diff(py) >= 0).all()
    cost_fast = np.sum(
        np.sqrt(((x[px] - y[py]) ** 2).sum(-1))
    )
    ex, ey = dtw_path(x, y)
    cost_exact = np.sum(np.sqrt(((x[ex] - y[ey]) ** 2).sum(-1)))
    assert cost_fast >= cost_exact - 1e-9
    assert cost_fast < 1e-9  # warped copy aligns perfectly


def test_mcep_no_overflow_on_large_dynamic_range():
    """Regression: the Newton solver must run overflow-free on real
    decoded speech-like audio with large per-frame dynamic range.

    tests/data/mcep_overflow_regression.wav is a slice of a rich-corpus
    ground-truth utterance (egs/synthetic rich mode) on which the previous
    gain-only initialization overflowed np.exp inside the criterion (the
    damped Newton recovered, but fired RuntimeWarning: overflow on every
    rich-eval utterance). The WLS-on-log-spectrum init plus the clamped
    line-search energy must be exactly stationary AND warning-free.
    """
    import os
    import warnings

    from parallelwavegan_tpu.utils.io import read_wav

    path = os.path.join(
        os.path.dirname(__file__), "data", "mcep_overflow_regression.wav"
    )
    audio, sr = read_wav(path)
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any RuntimeWarning fails the test
        with np.errstate(over="raise", invalid="raise"):
            mc = mcep(np.asarray(audio, np.float64), 22050)
    assert np.isfinite(mc).all()
    # converged to the SPTK stationary point: gradient of the criterion ~ 0
    from parallelwavegan_tpu.ops.eval_metrics import warped_phase

    a = np.asarray(audio, np.float64)
    if np.abs(a).max() <= 1.0 + 1e-6:
        a = np.round(a * 32767.0)
    fft_size, n_shift, order, alpha = 512, 256, 34, 0.45
    n_frames = 1 + (len(a) - fft_size) // n_shift
    idx = np.arange(n_frames)[:, None] * n_shift + np.arange(fft_size)
    P = np.abs(np.fft.rfft(a[idx] * np.hamming(fft_size), axis=-1)) ** 2 + 1e-6
    beta = warped_phase(np.arange(P.shape[1]) * (np.pi / (P.shape[1] - 1)), alpha)
    A = np.cos(np.outer(beta, np.arange(order + 1)))
    w = np.full(P.shape[1], 2.0 / fft_size)
    w[0] = w[-1] = 1.0 / fft_size
    D = np.exp(np.log(P) - 2.0 * (mc.astype(np.float64) @ A.T))
    grad = 2.0 * ((1.0 - D) @ (w[:, None] * A))
    # threshold reflects mcep()'s float32 return rounding, not solver slack
    assert np.abs(grad).max() < 1e-4
