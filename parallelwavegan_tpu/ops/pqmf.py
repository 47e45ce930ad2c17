"""PQMF (pseudo-QMF) analysis/synthesis filterbanks, channels-last JAX.

Numerics mirror the reference cosine-modulated filterbank
(/root/reference/parallel_wavegan/layers/pqmf.py:14-149): a Kaiser-windowed
sinc prototype modulated into `subbands` analysis/synthesis filters with
+-pi/4 phase and x2 gain.

TPU design: the reference's stride-S "updown" identity convs (and the naive
full-rate FIR) are replaced by *polyphase* subband-rate convolutions: both
directions become a single (J, S, S) conv at the subband rate — an MXU
contraction over J*S taps producing all S phases at once — instead of a
(K, S, 1)/(K, 1, S) full-rate filter whose 1-wide channel dim strands 127 of
the MXU's 128 lanes. Exactly the same sums, reordered (measured ~5x faster
than the zero-stuffed formulation on the MB-MelGAN serving path).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np
from scipy.signal.windows import kaiser

from parallelwavegan_tpu.ops.conv import conv1d, pad1d


def design_prototype_filter(
    taps: int = 62, cutoff_ratio: float = 0.142, beta: float = 9.0
) -> np.ndarray:
    """Kaiser-window lowpass prototype h(n), length taps+1."""
    assert taps % 2 == 0, "The number of taps must be even."
    assert 0.0 < cutoff_ratio < 1.0
    omega_c = np.pi * cutoff_ratio
    n = np.arange(taps + 1) - 0.5 * taps
    with np.errstate(invalid="ignore"):
        h_i = np.sin(omega_c * n) / (np.pi * n)
    h_i[taps // 2] = cutoff_ratio  # sinc limit at n=0
    return h_i * kaiser(taps + 1, beta)


@functools.lru_cache(maxsize=8)
def pqmf_filters(
    subbands: int = 4,
    taps: int = 62,
    cutoff_ratio: float = 0.142,
    beta: float = 9.0,
):
    """Return (analysis, synthesis) filter banks, each (subbands, taps+1)."""
    h_proto = design_prototype_filter(taps, cutoff_ratio, beta)
    n = np.arange(taps + 1) - taps / 2.0
    k = np.arange(subbands)[:, None]
    phase = (2 * k + 1) * (np.pi / (2 * subbands)) * n[None, :]
    sign = (-1.0) ** np.arange(subbands)[:, None]
    h_analysis = 2.0 * h_proto[None, :] * np.cos(phase + sign * np.pi / 4)
    h_synthesis = 2.0 * h_proto[None, :] * np.cos(phase - sign * np.pi / 4)
    return h_analysis.astype(np.float32), h_synthesis.astype(np.float32)


@functools.lru_cache(maxsize=8)
def _polyphase_analysis_kernel(subbands, taps, cutoff_ratio, beta):
    """(J, S, S) subband-rate kernel + (lo, hi) pads for analysis.

    Equivalent to full-rate cross-correlation with h_analysis (zero pad
    taps//2 both sides) followed by stride-S decimation:
      y[m, s] = sum_k x[m*S + k - taps//2] * h_ana[s, k]
    with x split into phases xr[n, q] = x[n*S + q] and k = j*S + q + taps//2:
      y[m, s] = sum_q sum_j xr[m + j, q] * h_ana[s, j*S + q + taps//2].
    """
    h_analysis, _ = pqmf_filters(subbands, taps, cutoff_ratio, beta)
    S, half = subbands, taps // 2
    j_min = -((S - 1 + half) // S)
    j_max = (taps - half) // S
    J = j_max - j_min + 1
    ker = np.zeros((J, S, S), np.float32)  # (j, q=in phase, s=subband)
    for jj in range(J):
        for q in range(S):
            k = (jj + j_min) * S + q + half
            if 0 <= k <= taps:
                ker[jj, q, :] = h_analysis[:, k]
    return ker, (-j_min, j_max)


@functools.lru_cache(maxsize=8)
def _polyphase_synthesis_kernel(subbands, taps, cutoff_ratio, beta):
    """(J, S, S) subband-rate kernel + (lo, hi) pads for synthesis.

    Equivalent to zero-stuffing by S (gain xS) then full-rate
    cross-correlation with h_synthesis (zero pad taps//2 both sides):
      y[n*S + p] = S * sum_s sum_j x[n + j, s] * h_syn[s, j*S + taps//2 - p].
    """
    _, h_synthesis = pqmf_filters(subbands, taps, cutoff_ratio, beta)
    S, half = subbands, taps // 2
    j_min = -(half // S) - (1 if half % S else 0)
    j_max = (taps - half + S - 1) // S
    J = j_max - j_min + 1
    ker = np.zeros((J, S, S), np.float32)  # (j, s=subband, p=out phase)
    for jj in range(J):
        for p in range(S):
            k = (jj + j_min) * S + half - p
            if 0 <= k <= taps:
                ker[jj, :, p] = S * h_synthesis[:, k]
    return ker, (-j_min, j_max)


def pqmf_analysis(
    x: jnp.ndarray,
    subbands: int = 4,
    taps: int = 62,
    cutoff_ratio: float = 0.142,
    beta: float = 9.0,
) -> jnp.ndarray:
    """(B, T, 1) full-band wave -> (B, ceil(T/subbands), subbands) subbands."""
    B, T, _ = x.shape
    S = subbands
    ker, pads = _polyphase_analysis_kernel(S, taps, cutoff_ratio, beta)
    t_out = -(-T // S)
    if T % S:
        x = pad1d(x, (0, t_out * S - T))
    xr = x.reshape(B, t_out, S)  # phase-split: xr[:, n, q] = x[:, n*S+q, 0]
    return conv1d(xr, jnp.asarray(ker, x.dtype), padding=pads)


def pqmf_synthesis(
    x: jnp.ndarray,
    subbands: int = 4,
    taps: int = 62,
    cutoff_ratio: float = 0.142,
    beta: float = 9.0,
) -> jnp.ndarray:
    """(B, T//subbands, subbands) -> (B, T, 1) full-band wave."""
    B, Ts, S = x.shape
    assert S == subbands
    ker, pads = _polyphase_synthesis_kernel(S, taps, cutoff_ratio, beta)
    y = conv1d(x, jnp.asarray(ker, x.dtype), padding=pads)  # (B, Ts, S phases)
    return y.reshape(B, Ts * S, 1)
