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
    assert mel_cepstral_distortion(a, shifted, sr) < 2.0  # DTW absorbs shift


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
