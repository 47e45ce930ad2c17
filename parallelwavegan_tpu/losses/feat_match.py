"""Feature-matching loss (behavioral parity:
/root/reference/parallel_wavegan/losses/feat_match_loss.py:12-54)."""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class FeatureMatchLoss:
    average_by_layers: bool = True
    average_by_discriminators: bool = True
    include_final_outputs: bool = False

    def __call__(self, feats_hat, feats) -> jnp.ndarray:
        """feats_hat/feats: list (per discriminator) of list (per layer)."""
        total = 0.0
        n_disc = 0
        for feats_hat_, feats_ in zip(feats_hat, feats):
            n_disc += 1
            if not self.include_final_outputs:
                feats_hat_ = feats_hat_[:-1]
                feats_ = feats_[:-1]
            disc_loss = 0.0
            n_layers = 0
            for f_hat, f in zip(feats_hat_, feats_):
                n_layers += 1
                disc_loss += jnp.mean(
                    jnp.abs(f_hat - jax.lax.stop_gradient(f))
                )
            if self.average_by_layers:
                disc_loss /= n_layers
            total += disc_loss
        if self.average_by_discriminators:
            total /= n_disc
        return total
