"""PQMF (pseudo-QMF) analysis/synthesis filterbanks, channels-last JAX.

Numerics mirror the reference cosine-modulated filterbank
(/root/reference/parallel_wavegan/layers/pqmf.py:14-149): a Kaiser-windowed
sinc prototype modulated into `subbands` analysis/synthesis filters with
+-pi/4 phase and x2 gain.

TPU design: the reference's stride-S "updown" identity convs are replaced by
plain strided slicing (analysis decimation) and zero-stuffing via reshape
(synthesis expansion) — both layout-trivial on TPU — leaving one real FIR conv
per direction which XLA lowers to an MXU contraction.
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


def pqmf_analysis(
    x: jnp.ndarray,
    subbands: int = 4,
    taps: int = 62,
    cutoff_ratio: float = 0.142,
    beta: float = 9.0,
) -> jnp.ndarray:
    """(B, T, 1) full-band wave -> (B, T//subbands, subbands) subband signals."""
    h_analysis, _ = pqmf_filters(subbands, taps, cutoff_ratio, beta)
    # kernel (K, 1, subbands); filter in the input dtype (bf16 serving path)
    kernel = jnp.asarray(h_analysis.T[:, None, :], dtype=x.dtype)
    y = conv1d(pad1d(x, (taps // 2, taps // 2)), kernel)
    return y[:, ::subbands, :]


def pqmf_synthesis(
    x: jnp.ndarray,
    subbands: int = 4,
    taps: int = 62,
    cutoff_ratio: float = 0.142,
    beta: float = 9.0,
) -> jnp.ndarray:
    """(B, T//subbands, subbands) -> (B, T, 1) full-band wave."""
    _, h_synthesis = pqmf_filters(subbands, taps, cutoff_ratio, beta)
    B, Ts, S = x.shape
    assert S == subbands
    # zero-stuff by S with xS gain (reference conv_transpose w/ identity * S)
    up = jnp.zeros((B, Ts, subbands, S), x.dtype).at[:, :, 0, :].set(x * subbands)
    up = up.reshape(B, Ts * subbands, S)
    kernel = jnp.asarray(h_synthesis.T[:, :, None], dtype=x.dtype)  # (K, S, 1)
    return conv1d(pad1d(up, (taps // 2, taps // 2)), kernel)
