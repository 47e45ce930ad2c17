"""Harmonic sine excitation generator (NSF-style), functional JAX.

Behavioral parity with the reference SineGen
(/root/reference/parallel_wavegan/layers/sine.py:7-146): f0 (B, T, 1) ->
harmonic sines with random initial phase per overtone, voiced/unvoiced gating,
and amplitude-matched noise. RNG is an explicit jax.random key (the reference
uses global torch RNG).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sine_excitation(
    rng: jax.Array,
    f0: jnp.ndarray,
    sampling_rate: int,
    harmonic_num: int = 0,
    sine_amp: float = 0.1,
    noise_std: float = 0.003,
    voiced_threshold: float = 0.0,
):
    """Generate (sine_waves, uv, noise), each (B, T, harmonic_num+1).

    f0: (B, T, 1); unvoiced steps must be 0.
    """
    assert f0.ndim == 3 and f0.shape[-1] == 1
    dim = harmonic_num + 1
    B, T, _ = f0.shape
    harmonics = jnp.arange(1, dim + 1, dtype=f0.dtype)  # 1, 2, ..., dim
    f0_buf = f0 * harmonics[None, None, :]  # (B, T, dim)

    rad = (f0_buf / sampling_rate) % 1.0
    k_phase, k_noise = jax.random.split(rng)
    rand_ini = jax.random.uniform(k_phase, (B, dim), dtype=f0.dtype)
    rand_ini = rand_ini.at[:, 0].set(0.0)  # fundamental keeps zero init phase
    rad = rad.at[:, 0, :].add(rand_ini)

    # keep the cumulative phase bounded for float32: subtract 1 whenever the
    # running sum mod 1 wraps (integer phase shifts leave sin unchanged)
    tmp_over_one = jnp.cumsum(rad, axis=1) % 1.0
    wrap = (tmp_over_one[:, 1:, :] - tmp_over_one[:, :-1, :]) < 0
    shift = jnp.concatenate(
        [jnp.zeros((B, 1, dim), rad.dtype), -wrap.astype(rad.dtype)], axis=1
    )
    sines = jnp.sin(jnp.cumsum(rad + shift, axis=1) * (2.0 * jnp.pi)) * sine_amp

    uv = (f0 > voiced_threshold).astype(f0.dtype)  # (B, T, 1)
    noise_amp = uv * noise_std + (1.0 - uv) * sine_amp / 3.0
    noise = noise_amp * jax.random.normal(k_noise, sines.shape, dtype=f0.dtype)
    sine_waves = sines * uv + noise
    return sine_waves, uv, noise
