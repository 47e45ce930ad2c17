"""Duration predictor loss (behavioral parity:
/root/reference/parallel_wavegan/losses/duration_prediction_loss.py:16-52)."""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class DurationPredictorLoss:
    """MSE between predicted log-durations and log(targets + offset)."""

    offset: float = 1.0

    def __call__(self, outputs: jnp.ndarray, targets: jnp.ndarray,
                 mask: jnp.ndarray | None = None) -> jnp.ndarray:
        targets = jnp.log(targets.astype(outputs.dtype) + self.offset)
        sq = (outputs - targets) ** 2
        if mask is not None:
            return jnp.sum(sq * mask) / jnp.maximum(jnp.sum(mask), 1.0)
        return jnp.mean(sq)
