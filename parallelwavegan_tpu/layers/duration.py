"""Duration predictor / length regulator / variance predictor.

Behavioral parity: /root/reference/parallel_wavegan/layers/duration_predictor.py,
length_regulator.py, variance_predictor.py. The length regulator is
re-expressed as a static-shape gather (cumulative-duration searchsorted) so it
is jit/TPU friendly; the reference uses repeat_interleave with dynamic output
length, which cannot compile to XLA.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from parallelwavegan_tpu.layers.common import ChannelLayerNorm, Conv1d, Dense


class DurationPredictor(nn.Module):
    """FastSpeech-style duration predictor; log-domain outputs."""

    n_layers: int = 2
    n_chans: int = 384
    kernel_size: int = 3
    dropout_rate: float = 0.1
    offset: float = 1.0

    @nn.compact
    def _network(self, x, deterministic):
        for i in range(self.n_layers):
            x = Conv1d(
                self.n_chans, self.kernel_size,
                padding=(self.kernel_size - 1) // 2, name=f"conv_{i}",
            )(x, deterministic)
            x = nn.relu(x)
            x = ChannelLayerNorm(self.n_chans, name=f"norm_{i}")(x)
            x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        x = Dense(1, name="linear")(x)
        return x[..., 0]  # (B, T)

    def __call__(self, x, deterministic: bool = False):
        """Predicted log-durations (B, T)."""
        return self._network(x, deterministic)

    def inference(self, x):
        """Clamped round(exp(pred) - offset) durations (B, T), int32."""
        log_d = self._network(x, True)
        d = jnp.clip(jnp.round(jnp.exp(log_d) - self.offset), min=0.0)
        return d.astype(jnp.int32)


def length_regulator(
    x: jnp.ndarray, durations: jnp.ndarray, max_len: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Expand (B, T, C) by per-symbol durations (B, T) to (B, max_len, C).

    Returns (expanded, mask) where mask (B, max_len) marks valid frames.
    Static output length; positions beyond sum(durations) are ZERO-filled
    (the reference pads regulated batches with zeros — pad_list in
    length_regulator.py — and downstream convs see those zeros, so the fill
    value is observable through their receptive fields). All-zero duration
    rows fall back to duration 1 (reference guard, length_regulator.py:79-87).
    """
    total = jnp.sum(durations, axis=1, keepdims=True)  # (B, 1)
    durations = jnp.where(total == 0, jnp.ones_like(durations), durations)
    ends = jnp.cumsum(durations, axis=1)  # (B, T)
    pos = jnp.arange(max_len)[None, :, None]  # (1, L, 1)
    # index of first symbol whose cumulative end exceeds pos
    idx = jnp.sum(pos >= ends[:, None, :], axis=-1)  # (B, L)
    idx = jnp.minimum(idx, x.shape[1] - 1)
    expanded = jnp.take_along_axis(x, idx[:, :, None], axis=1)
    mask = jnp.arange(max_len)[None, :] < jnp.sum(durations, axis=1)[:, None]
    expanded = jnp.where(mask[:, :, None], expanded, 0.0)
    return expanded, mask


def length_regulator_np(x: np.ndarray, durations: np.ndarray) -> np.ndarray:
    """Host-side dynamic-length regulator for data prep: (T, C), (T,) -> (T', C)."""
    durations = np.asarray(durations, dtype=np.int64)
    if durations.sum() == 0:
        durations = np.ones_like(durations)
    return np.repeat(x, durations, axis=0)


class VariancePredictor(nn.Module):
    """FastSpeech2 variance predictor (declared in the reference but unwired;
    kept for API parity, variance_predictor.py:15-87)."""

    n_layers: int = 2
    n_chans: int = 384
    kernel_size: int = 3
    bias: bool = True
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, x, deterministic: bool = False):
        for i in range(self.n_layers):
            x = Conv1d(
                self.n_chans, self.kernel_size, bias=self.bias,
                padding=(self.kernel_size - 1) // 2, name=f"conv_{i}",
            )(x, deterministic)
            x = nn.relu(x)
            x = ChannelLayerNorm(self.n_chans, name=f"norm_{i}")(x)
            x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        return Dense(1, name="linear")(x)[..., 0]
