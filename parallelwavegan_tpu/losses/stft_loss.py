"""Multi-resolution STFT losses (behavioral parity:
/root/reference/parallel_wavegan/losses/stft_loss.py:16-170).

All resolutions are computed from one framed-matmul STFT each; pure functions
of (B, T) or (B, C, T)-flattened-to-(B*C, T) signals.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence, Tuple

import jax.numpy as jnp

from parallelwavegan_tpu.ops.spectral import stft_magnitude


def spectral_convergence_loss(x_mag: jnp.ndarray, y_mag: jnp.ndarray) -> jnp.ndarray:
    """||Y - X||_F / ||Y||_F (Frobenius over the whole batch, like torch)."""
    return jnp.linalg.norm(y_mag - x_mag) / jnp.linalg.norm(y_mag)


def log_stft_magnitude_loss(x_mag: jnp.ndarray, y_mag: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(jnp.log(y_mag) - jnp.log(x_mag)))


@dataclass(frozen=True)
class STFTLoss:
    """Single-resolution (spectral-convergence, log-magnitude) loss pair."""

    fft_size: int = 1024
    shift_size: int = 120
    win_length: int = 600
    window: str = "hann"
    method: str = "auto"

    def __call__(self, x: jnp.ndarray, y: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x_mag = stft_magnitude(
            x, self.fft_size, self.shift_size, self.win_length, self.window,
            method=self.method,
        )
        y_mag = stft_magnitude(
            y, self.fft_size, self.shift_size, self.win_length, self.window,
            method=self.method,
        )
        return (
            spectral_convergence_loss(x_mag, y_mag),
            log_stft_magnitude_loss(x_mag, y_mag),
        )


@dataclass(frozen=True)
class MultiResolutionSTFTLoss:
    """Mean of STFTLoss over multiple resolutions; (B, C, T) input is
    flattened to (B*C, T) for subband signals."""

    fft_sizes: Sequence[int] = (1024, 2048, 512)
    hop_sizes: Sequence[int] = (120, 240, 50)
    win_lengths: Sequence[int] = (600, 1200, 240)
    window: str = "hann"
    method: str = "auto"

    def __post_init__(self):
        assert len(self.fft_sizes) == len(self.hop_sizes) == len(self.win_lengths)

    def __call__(self, x: jnp.ndarray, y: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if x.ndim == 3:
            x = x.reshape(-1, x.shape[2])
            y = y.reshape(-1, y.shape[2])
        sc_loss = 0.0
        mag_loss = 0.0
        for fs, ss, wl in zip(self.fft_sizes, self.hop_sizes, self.win_lengths):
            sc, mag = STFTLoss(fs, ss, wl, self.window, self.method)(x, y)
            sc_loss += sc
            mag_loss += mag
        n = len(self.fft_sizes)
        return sc_loss / n, mag_loss / n
