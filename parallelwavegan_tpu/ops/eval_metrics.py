"""Objective quality metrics: mel-cepstral distortion, log-F0 RMSE,
semitone accuracy, V/UV error.

Equivalents of the reference's evaluation scripts
(/root/reference/parallel_wavegan/bin/evaluate_mcd.py, evaluate_f0.py,
utils/evaluate_semitone.py, utils/evaluate_vuv.py). pysptk/pyworld/fastdtw
are not in this image, so:
  - mcep: alpha-warped real cepstrum of the log magnitude spectrum (the
    standard frequency-warping approximation of SPTK mcep; rankings agree,
    absolute values differ slightly from SPTK's iterative fit)
  - DTW: exact O(T1*T2) numpy dynamic programming
  - f0: our YIN (ops.audio.yin_f0)
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

# fs -> (mcep_dim, alpha), following the reference's table
# (bin/evaluate_mcd.py:106-118)
MCEP_PARAMS = {
    8000: (13, 0.31),
    16000: (23, 0.42),
    22050: (34, 0.45),
    24000: (34, 0.46),
    32000: (36, 0.50),
    44100: (39, 0.53),
    48000: (39, 0.55),
}


def _warp_frequencies(n_bins: int, alpha: float) -> np.ndarray:
    """All-pass warped frequency grid: omega_w = omega + 2*atan(...)"""
    omega = np.linspace(0, np.pi, n_bins)
    warped = omega + 2.0 * np.arctan(
        alpha * np.sin(omega) / (1.0 - alpha * np.cos(omega))
    )
    return warped


def mcep(
    audio: np.ndarray,
    sampling_rate: int,
    fft_size: int = 512,
    shift_ms: float = 5.0,
    dim: int | None = None,
    alpha: float | None = None,
) -> np.ndarray:
    """Mel-cepstral coefficients per frame, shape (n_frames, dim + 1)."""
    if dim is None or alpha is None:
        d, a = MCEP_PARAMS.get(sampling_rate, (34, 0.45))
        dim = dim if dim is not None else d
        alpha = alpha if alpha is not None else a
    hop = int(sampling_rate * shift_ms * 1e-3)
    n_frames = max(0, 1 + (len(audio) - fft_size) // hop)
    idx = np.arange(n_frames)[:, None] * hop + np.arange(fft_size)[None, :]
    frames = audio[idx] * np.hanning(fft_size)
    spec = np.abs(np.fft.rfft(frames, axis=-1))
    log_spec = np.log(np.maximum(spec, 1e-10))
    # warp the frequency axis (alpha all-pass), then real cepstrum
    n_bins = log_spec.shape[-1]
    warped_grid = _warp_frequencies(n_bins, alpha)
    uniform = np.linspace(0, np.pi, n_bins)
    warped = np.stack(
        [np.interp(uniform, warped_grid, row) for row in log_spec]
    )
    # IDCT-like: real cepstrum of the warped log spectrum
    full = np.concatenate([warped, warped[:, -2:0:-1]], axis=-1)
    ceps = np.fft.irfft(full, axis=-1)[:, : dim + 1]
    return ceps.astype(np.float32)


def dtw_path(x: np.ndarray, y: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """DTW alignment path between frame sequences (T1, D), (T2, D)."""
    t1, t2 = len(x), len(y)
    dist = np.sqrt(
        np.maximum(
            (x**2).sum(-1)[:, None]
            - 2 * x @ y.T
            + (y**2).sum(-1)[None, :],
            0.0,
        )
    )
    acc = np.full((t1 + 1, t2 + 1), np.inf)
    acc[0, 0] = 0.0
    for i in range(1, t1 + 1):
        row = dist[i - 1]
        prev = acc[i - 1]
        cur = acc[i]
        for j in range(1, t2 + 1):
            cur[j] = row[j - 1] + min(prev[j], cur[j - 1], prev[j - 1])
    # backtrack
    path_x, path_y = [], []
    i, j = t1, t2
    while i > 0 and j > 0:
        path_x.append(i - 1)
        path_y.append(j - 1)
        choices = (acc[i - 1, j - 1], acc[i - 1, j], acc[i, j - 1])
        move = int(np.argmin(choices))
        if move == 0:
            i, j = i - 1, j - 1
        elif move == 1:
            i -= 1
        else:
            j -= 1
    return np.array(path_x[::-1]), np.array(path_y[::-1])


def mel_cepstral_distortion(
    gen_audio: np.ndarray,
    gt_audio: np.ndarray,
    sampling_rate: int,
    fft_size: int = 512,
    shift_ms: float = 5.0,
) -> float:
    """MCD in dB between generated and ground-truth waves (DTW-aligned,
    0th coefficient excluded — reference evaluate_mcd.py:140-170)."""
    mc_gen = mcep(gen_audio, sampling_rate, fft_size, shift_ms)
    mc_gt = mcep(gt_audio, sampling_rate, fft_size, shift_ms)
    px, py = dtw_path(mc_gen, mc_gt)
    diff = mc_gen[px, 1:] - mc_gt[py, 1:]
    return float(
        np.mean(10.0 / np.log(10.0) * np.sqrt(2.0 * (diff**2).sum(-1)))
    )


def log_f0_rmse(
    gen_audio: np.ndarray,
    gt_audio: np.ndarray,
    sampling_rate: int,
    hop_size: int | None = None,
    f0min: float = 40.0,
    f0max: float = 800.0,
) -> Tuple[float, float]:
    """(log-F0 RMSE over co-voiced DTW-aligned frames, V/UV error rate)."""
    from parallelwavegan_tpu.ops.audio import yin_f0

    if hop_size is None:
        hop_size = int(sampling_rate * 0.005)
    f0_gen = yin_f0(gen_audio, sampling_rate, hop_size, f0min, f0max)
    f0_gt = yin_f0(gt_audio, sampling_rate, hop_size, f0min, f0max)
    n = min(len(f0_gen), len(f0_gt))
    f0_gen, f0_gt = f0_gen[:n], f0_gt[:n]
    # align on mcep features (f0 sequences can be degenerate)
    mc_gen = mcep(gen_audio, sampling_rate, shift_ms=hop_size / sampling_rate * 1e3)
    mc_gt = mcep(gt_audio, sampling_rate, shift_ms=hop_size / sampling_rate * 1e3)
    m = min(len(mc_gen), n), min(len(mc_gt), n)
    px, py = dtw_path(mc_gen[: m[0]], mc_gt[: m[1]])
    g, r = f0_gen[px], f0_gt[py]
    voiced = (g > 0) & (r > 0)
    vuv_error = float(np.mean((g > 0) != (r > 0)))
    if voiced.sum() == 0:
        return float("nan"), vuv_error
    rmse = float(
        np.sqrt(np.mean((np.log(g[voiced]) - np.log(r[voiced])) ** 2))
    )
    return rmse, vuv_error


def semitone_accuracy(
    gen_audio: np.ndarray,
    gt_audio: np.ndarray,
    sampling_rate: int,
    tolerance: float = 0.5,
) -> float:
    """Fraction of co-voiced frames within +-tolerance semitones."""
    from parallelwavegan_tpu.ops.audio import yin_f0

    hop = int(sampling_rate * 0.005)
    f0_gen = yin_f0(gen_audio, sampling_rate, hop)
    f0_gt = yin_f0(gt_audio, sampling_rate, hop)
    n = min(len(f0_gen), len(f0_gt))
    g, r = f0_gen[:n], f0_gt[:n]
    voiced = (g > 0) & (r > 0)
    if voiced.sum() == 0:
        return float("nan")
    semitones = 12.0 * np.abs(np.log2(g[voiced] / r[voiced]))
    return float(np.mean(semitones <= tolerance))
