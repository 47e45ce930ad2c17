"""Adversarial losses over discriminator output pytrees (behavioral parity:
/root/reference/parallel_wavegan/losses/adversarial_loss.py:12-123).

Discriminator-output convention (mirrors the reference):
  - a single array: plain discriminator logits
  - a list of arrays: multi-discriminator final outputs
  - a list of lists of arrays: per-discriminator feature maps, logits last
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


def _leaves(outputs):
    """Normalize the output convention to a list of logits arrays."""
    if isinstance(outputs, (tuple, list)):
        out = []
        for o in outputs:
            if isinstance(o, (tuple, list)):
                o = o[-1]
            out.append(o)
        return out
    return [outputs]


@dataclass(frozen=True)
class GeneratorAdversarialLoss:
    average_by_discriminators: bool = True
    loss_type: str = "mse"

    def __post_init__(self):
        assert self.loss_type in ("mse", "hinge")

    def __call__(self, outputs) -> jnp.ndarray:
        logits = _leaves(outputs)
        loss = 0.0
        for x in logits:
            if self.loss_type == "mse":
                loss += jnp.mean((x - 1.0) ** 2)
            else:
                loss += -jnp.mean(x)
        if self.average_by_discriminators and isinstance(outputs, (tuple, list)):
            loss /= len(logits)
        return loss


@dataclass(frozen=True)
class DiscriminatorAdversarialLoss:
    average_by_discriminators: bool = True
    loss_type: str = "mse"

    def __post_init__(self):
        assert self.loss_type in ("mse", "hinge")

    def __call__(self, outputs_hat, outputs):
        fake = _leaves(outputs_hat)
        real = _leaves(outputs)
        real_loss = 0.0
        fake_loss = 0.0
        for x_hat, x in zip(fake, real):
            if self.loss_type == "mse":
                real_loss += jnp.mean((x - 1.0) ** 2)
                fake_loss += jnp.mean(x_hat**2)
            else:
                real_loss += -jnp.mean(jnp.minimum(x - 1.0, 0.0))
                fake_loss += -jnp.mean(jnp.minimum(-x_hat - 1.0, 0.0))
        if self.average_by_discriminators and isinstance(outputs, (tuple, list)):
            real_loss /= len(real)
            fake_loss /= len(fake)
        return real_loss, fake_loss
